"""YOLOv1 [detection] head decode + loss tests."""

import numpy as np

import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.ops.detection_v1 import (cost_layer, detection_decode,
                                          detection_head_delta,
                                          encode_v1_truth)

CFG = """[net]
width=112
height=112
channels=3
[connected]
output={outputs}
activation=linear
[detection]
classes=3
coords=4
rescore=1
side=4
num=2
sqrt=1
object_scale=1
noobject_scale=.5
class_scale=1
coord_scale=5
"""


def _head():
    side, n, classes = 4, 2, 3
    outputs = side * side * (n * 5 + classes)
    g = build_graph(CFG.format(outputs=outputs), train=True)
    return g.layers[1]


def test_decode_layout(rng):
    l = _head()
    S = l.side * l.side
    flat = rng.normal(size=(1, l.outputs)).astype(np.float32)
    boxes, conf, cls = detection_decode(jnp.asarray(flat), l)
    assert boxes.shape == (1, S * 2, 4)
    # spot check cell (row=1, col=2), box 0
    i = 1 * 4 + 2
    box_start = S * (3 + 2) + (i * 2 + 0) * 4
    px = flat[0, box_start]
    want_bx = (px + 2) / 4
    np.testing.assert_allclose(float(boxes[0, i * 2 + 0, 0]), want_bx,
                               rtol=1e-6)
    conf_idx = S * 3 + i * 2 + 0
    np.testing.assert_allclose(float(conf[0, i * 2]), flat[0, conf_idx],
                               rtol=1e-6)


def test_truth_encode_and_delta(rng):
    l = _head()
    box_list = np.array([[0.55, 0.3, 0.4, 0.2, 1]], np.float32)
    grid = encode_v1_truth(box_list, l)
    # cell: col=int(.55*4)=2, row=int(.3*4)=1 -> cell 6
    assert grid[6, 0] == 1
    assert grid[6, 1 + 1] == 1
    np.testing.assert_allclose(grid[6, 1 + 3 + 0], 0.55 * 4 - 2, atol=1e-6)

    flat = (rng.normal(size=(1, l.outputs)) * 0.1).astype(np.float32)
    delta, cost, m = detection_head_delta(
        jnp.asarray(flat), jnp.asarray(grid[None]), l)
    assert np.isfinite(float(cost))
    assert int(m["count"]) == 1
    d = np.asarray(delta)[0]
    S = l.side * l.side
    # class deltas only at the object cell
    d_cls = d[:S * 3].reshape(S, 3)
    assert np.all(d_cls[np.arange(S) != 6] == 0)
    assert d_cls[6].any()
    # background conf deltas negative-ish: noobject_scale * (0 - conf)
    d_conf = d[S * 3:S * 5].reshape(S, 2)
    flat_conf = flat[0, S * 3:S * 5].reshape(S, 2)
    np.testing.assert_allclose(d_conf[0], 0.5 * (0 - flat_conf[0]),
                               rtol=1e-5)


def test_cost_layer_kinds():
    x = jnp.asarray([1.0, 2.0, 3.0])
    t = jnp.asarray([1.5, 0.0, 3.0])
    c_sse, d_sse = cost_layer(x, t, "sse")
    np.testing.assert_allclose(float(c_sse), 0.25 + 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_sse), [1.0, -4.0, 0.0],
                               rtol=1e-6)
    c_sm, d_sm = cost_layer(x, t, "smooth")
    np.testing.assert_allclose(float(c_sm), 0.5 * 0.25 + (2 - 0.5), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_sm), [0.5, -1.0, 0.0], rtol=1e-6)
