"""darknet_tpu — a TPU-native re-implementation of the yolo-core capability set.

The reference (Ravicmoon/darknet, a trimmed AlexeyAB/darknet fork) is an
interpreter over a layer array with hand-written CPU/CUDA kernels.  This
package is a *compiler* from the same artifact contracts — the `.cfg` model
dialect, the binary `.weights` format and the `.data` dataset descriptor —
into a single XLA program, jitted once and executed on TPU, with Pallas
kernels where XLA's default fusion is not enough.

Public surface (mirrors the capability of `yolo_core.h:625-663`):

    Network.from_cfg(cfg, weights=..., train=...)   # LoadNetwork
    Network.predict(image)                          # NetworkPredict + boxes
    Network.save_weights(path)                      # SaveWeights
    fuse_conv_batchnorm(...)                        # FuseConvBatchNorm
"""

from darknet_tpu.version import __version__, WEIGHTS_VERSION

from darknet_tpu.config.cfg import parse_cfg_text, parse_cfg_file, Section
from darknet_tpu.config.metadata import Metadata
from darknet_tpu.graph.builder import build_graph
from darknet_tpu.graph.ir import NetConfig, LayerIR
from darknet_tpu.nn.network import Network
from darknet_tpu.nn.params import fuse_conv_batchnorm

__all__ = [
    "__version__",
    "WEIGHTS_VERSION",
    "parse_cfg_text",
    "parse_cfg_file",
    "Section",
    "Metadata",
    "build_graph",
    "NetConfig",
    "LayerIR",
    "Network",
    "fuse_conv_batchnorm",
]
