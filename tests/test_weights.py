"""Binary .weights codec tests (layout per reference parser.cpp:1590-1876)."""

import os
import struct

import numpy as np

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.weights import io as wio

CFG = """[net]
width=16
height=16
channels=3
[convolutional]
batch_normalize=1
filters=4
size=3
pad=1
activation=leaky
[convolutional]
filters=6
size=1
activation=linear
[connected]
output=10
activation=linear
"""


def test_roundtrip(tmp_path):
    g = build_graph(CFG)
    params = paramlib.init_params(g, seed=7)
    path = tmp_path / "w.weights"
    wio.save_weights(g, params, path, seen=12345)
    params2, seen, version = wio.load_weights(g, path)
    assert seen == 12345
    assert version == (0, 2, 5)
    for p, q in zip(params, params2):
        assert set(p) == set(q)
        for k in p:
            np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(q[k]))


def test_header_layout(tmp_path):
    g = build_graph(CFG)
    params = paramlib.init_params(g)
    data = wio.save_weights_bytes(g, params, seen=77)
    major, minor, rev = struct.unpack("<iii", data[:12])
    (seen,) = struct.unpack("<Q", data[12:20])
    assert (major, minor, rev) == (0, 2, 5)
    assert seen == 77
    # payload: conv1 = 4 biases + 3*4 bn + 3*3*3*4 weights;
    # conv2 = 6 + 4*6; connected = 10 + 16*16*3*... wait inputs of connected
    l = g.layers[2]
    n_floats = (4 + 12 + 108) + (6 + 24) + (10 + l.inputs * 10)
    assert len(data) == 20 + 4 * n_floats


def test_darknet_weight_order():
    """Conv weights serialize in (n, c/g, kh, kw) row-major order."""
    w = np.arange(2 * 3 * 2 * 2, dtype=np.float32).reshape(2, 2, 3, 2)
    # w is HWIO (kh=2, kw=2, c=3, n=2)
    flat = wio.conv_w_to_darknet(w)
    # element (o=1, i=2, kh=0, kw=1) must land at 1*(3*2*2) + 2*(2*2) + 0*2 + 1
    idx = 1 * 12 + 2 * 4 + 0 * 2 + 1
    assert flat[idx] == w[0, 1, 2, 1]
    back = wio.conv_w_from_darknet(flat, 2, 2, 3, 2)
    np.testing.assert_array_equal(back, w)


def test_partial_load_tolerated(tmp_path):
    """EOF mid-stream loads the prefix (transfer-learning backbones,
    parser.cpp:1837-1838)."""
    g = build_graph(CFG)
    params = paramlib.init_params(g, seed=3)
    data = wio.save_weights_bytes(g, params, seen=5)
    # truncate after the first conv layer
    cut = 20 + 4 * (4 + 12 + 108)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        params2, seen, _ = wio.load_weights_bytes(g, data[:cut])
    assert params2[0]  # first conv fully loaded
    np.testing.assert_array_equal(np.asarray(params2[0]["w"]),
                                  np.asarray(params[0]["w"]))
    assert not params2[2]  # connected never reached


def test_dontload_skips():
    cfg = CFG.replace("[convolutional]\nfilters=6",
                      "[convolutional]\ndontload=1\nfilters=6")
    g = build_graph(cfg)
    assert g.layers[1].dontload
    params = paramlib.init_params(g, seed=1)
    data = wio.save_weights_bytes(g, params)
    # saving writes all layers; loading with dontload skips layer 1 and
    # misaligns the rest by design (matches reference semantics where
    # dontload weights simply aren't in the file)
    g2 = build_graph(cfg)
    params2, _, _ = wio.load_weights_bytes(g2, data)
    assert params2[1] == {}
