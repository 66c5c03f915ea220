from darknet_tpu.graph.ir import NetConfig, LayerIR
from darknet_tpu.graph.builder import build_graph

__all__ = ["NetConfig", "LayerIR", "build_graph"]
