"""Per-layer cost report (utils/profiler.trace_report) — the productized
`-benchmark_layers` contract (network_kernels.cu:46-114): a real profiler
trace, joined to HLO op_name metadata, attributed back to cfg layers."""

import numpy as np
import pytest

import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.nn.emit import make_forward
from darknet_tpu.utils.profiler import trace_report

CFG = """[net]
batch=1
subdivisions=1
width=64
height=64
channels=3
[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=mish
[convolutional]
filters=12
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=1
anchors=10,14, 23,27
"""


def test_trace_report_attributes_layers(tmp_path):
    g = build_graph(CFG)
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=0))
    fwd = make_forward(g, fused_bn=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))

    lines = []
    rows = trace_report(lambda p, x: fwd(p, x)["output"], params, x,
                        graph=g, iters=2, log=lines.append,
                        trace_dir=str(tmp_path / "trc"))

    scopes = {r[0] for r in rows}
    # conv layers must be individually attributed via their named scopes
    assert any(s.startswith("L000_convolutional") for s in scopes), scopes
    assert any(s.startswith("L002_convolutional") for s in scopes), scopes
    total = sum(r[1] for r in rows)
    assert total > 0
    # rows are sorted descending by time
    times = [r[1] for r in rows]
    assert times == sorted(times, reverse=True)
    # BFLOPs joined from the IR for the attributed conv rows
    conv_rows = [r for r in rows if r[0].startswith("L002_")]
    if conv_rows:
        assert conv_rows[0][2] == pytest.approx(
            g.layers[2].bflops, rel=1e-6)
    # the printed table ends with the device total
    assert any("TOTAL" in ln for ln in lines)
