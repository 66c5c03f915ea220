"""Gaussian-YOLO loss tests: NLL formula check at the assigned cell against
a literal scalar evaluation, plus train-step integration."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.train.gaussian_yolo_loss import gaussian_yolo_head_delta

CFG = """[net]
width=32
height=32
channels=3
[convolutional]
filters={filters}
size=8
stride=8
activation=linear
[Gaussian_yolo]
mask=0,1
num=3
classes=3
anchors=6,9, 14,11, 22,25
iou_loss={iou_loss}
ignore_thresh=.5
uc_normalizer=0.7
iou_normalizer=0.6
"""


def _setup(iou_loss="mse"):
    classes = 3
    filters = 2 * (classes + 9)
    g = build_graph(CFG.format(filters=filters, iou_loss=iou_loss),
                    train=True)
    return g.layers[1], g.net


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def test_gaussian_nll_delta_at_cell(rng):
    l, net = _setup("mse")
    h, w, c = l.out_h, l.out_w, l.out_c           # 4x4 grid
    raw = rng.normal(size=(1, h, w, c)).astype(np.float32) * 0.5
    truth = np.zeros((1, 4, 5), np.float32)
    # center (0.62, 0.38) -> cell i=2, j=1; w,h chosen to match anchor 1
    truth[0, 0] = [0.62, 0.38, 14 / 32, 11 / 32, 2]

    delta, cost, metrics = gaussian_yolo_head_delta(
        jnp.asarray(raw), jnp.asarray(truth), l, net.w, net.h)
    assert int(metrics["count"]) == 1
    d = np.asarray(delta).reshape(h, w, 2, 12)

    # anchor prior 1 (14,11) best-matches the truth; it's mask position 1
    a = 1
    i, j = 2, 1
    v = raw[0, j, i, a * 12:(a + 1) * 12].astype(np.float64)

    mu_x = _sigmoid(v[0])
    sig_x = _sigmoid(v[1])
    tx = truth[0, 0, 0] * w - i
    dxv = tx - mu_x
    in_exp = dxv / sig_x
    scale = 2 - truth[0, 0, 2] * truth[0, 0, 3]
    normal = math.exp(-0.5 * in_exp ** 2) / (
        math.sqrt(2 * math.pi) * (sig_x + 0.3))
    temp = 0.5 * normal / (normal + 1e-9) * scale
    want_dmux = temp * in_exp / sig_x * 0.6          # iou_normalizer
    want_dsigx = temp * (in_exp ** 2 / sig_x -
                         1 / (sig_x + 0.3)) * 0.7    # uc_normalizer

    np.testing.assert_allclose(d[j, i, a, 0], want_dmux, rtol=1e-4)
    np.testing.assert_allclose(d[j, i, a, 1], want_dsigx, rtol=1e-4)

    # objectness delta at the cell: cls_norm * (1 - sigmoid(obj_raw))
    want_dobj = 1.0 * (1 - _sigmoid(v[8]))
    np.testing.assert_allclose(d[j, i, a, 8], want_dobj, rtol=1e-4)
    # class delta: +(1 - p) for class 2, -(p) elsewhere
    probs = _sigmoid(v[9:12])
    np.testing.assert_allclose(d[j, i, a, 9 + 2], 1 - probs[2], rtol=1e-4)
    np.testing.assert_allclose(d[j, i, a, 9], -probs[0], rtol=2e-4,
                               atol=1e-6)

    # cost is the full delta magnitude
    np.testing.assert_allclose(float(cost),
                               float((np.asarray(delta) ** 2).sum()),
                               rtol=1e-5)


def test_gaussian_iou_branch_replaces_mu(rng):
    l, net = _setup("giou")
    h, w, c = l.out_h, l.out_w, l.out_c
    raw = rng.normal(size=(1, h, w, c)).astype(np.float32) * 0.5
    truth = np.zeros((1, 4, 5), np.float32)
    truth[0, 0] = [0.62, 0.38, 14 / 32, 11 / 32, 1]
    d_g, _, m = gaussian_yolo_head_delta(
        jnp.asarray(raw), jnp.asarray(truth), l, net.w, net.h)

    l2, _ = _setup("mse")
    d_m, _, _ = gaussian_yolo_head_delta(
        jnp.asarray(raw), jnp.asarray(truth), l2, net.w, net.h)
    d_g = np.asarray(d_g).reshape(h, w, 2, 12)
    d_m = np.asarray(d_m).reshape(h, w, 2, 12)
    # sigma deltas identical between branches; mu deltas differ
    np.testing.assert_allclose(d_g[1, 2, 1, 1], d_m[1, 2, 1, 1], rtol=1e-5)
    assert not np.allclose(d_g[1, 2, 1, 0], d_m[1, 2, 1, 0])


def test_gaussian_train_step_learns(rng):
    from darknet_tpu.nn import params as paramlib
    from darknet_tpu.train.step import init_opt_state, make_train_step

    classes = 3
    filters = 2 * (classes + 9)
    cfg = CFG.format(filters=filters, iou_loss="mse").replace(
        "[convolutional]", "[convolutional]\nbatch_normalize=1", 1)
    g = build_graph(cfg, train=True)
    params = paramlib.init_params(g, seed=0)
    step = make_train_step(g, donate=False)
    opt = init_opt_state(g, params)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    truths = np.zeros((2, 4, 5), np.float32)
    truths[:, 0] = [0.6, 0.4, 0.4, 0.35, 1]
    costs = []
    for it in range(25):
        params, opt, cost, m = step(params, opt, jnp.asarray(x),
                                    jnp.asarray(truths),
                                    jax.random.PRNGKey(0), 0.01)
        costs.append(float(cost))
    assert np.all(np.isfinite(costs))
    assert costs[-1] < costs[0]
