"""Training-loss parity: vectorized device implementation vs the literal
numpy golden port of the reference loops (tests/golden_yolo.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.train.yolo_loss import yolo_head_delta
from tests.golden_yolo import GoldenYolo


def _mk_head(iou_loss="mse", iou_thresh=1.0, scale_x_y=1.0, classes=3,
             max_delta=float("inf"), grid=4, net=32, cpc=None,
             label_smooth=0.0, focal=0):
    n_mask = 2
    filters = n_mask * (classes + 5)
    extra = ""
    if cpc:
        extra += f"counters_per_class={cpc}\n"
    if label_smooth:
        extra += f"label_smooth_eps={label_smooth}\n"
    if focal:
        extra += "focal_loss=1\n"
    text = f"""[net]
width={net}
height={net}
channels=3
[convolutional]
filters={filters}
size={net // grid}
stride={net // grid}
activation=linear
[yolo]
mask=0,1
num=3
classes={classes}
anchors=6,9, 14,11, 22,25
iou_loss={iou_loss}
iou_thresh={iou_thresh}
scale_x_y={scale_x_y}
max_delta={max_delta if max_delta != float('inf') else 1000000}
ignore_thresh=.5
{extra}
"""
    g = build_graph(text)
    return g.layers[1], g.net


def _nhwc_to_chw_flat(x):
    # (H,W,A,E) -> darknet flat: anchor-major, entry-major, spatial
    h, w, ae = x.shape
    return np.transpose(x.reshape(h, w, -1), (2, 0, 1)).ravel()


def _run_case(l, net, truths, rng, rtol=2e-4, atol=2e-5):
    h, w, c = l.out_h, l.out_w, l.out_c
    raw = rng.normal(size=(1, h, w, c)).astype(np.float32) * 0.8

    delta, cost, metrics = yolo_head_delta(
        jnp.asarray(raw), jnp.asarray(truths[None]), l, net.w, net.h)
    got = np.asarray(delta)[0]                      # (H,W,A*E)
    got_flat = _nhwc_to_chw_flat(got)

    gold = GoldenYolo(l, net.w, net.h)
    raw_flat = _nhwc_to_chw_flat(raw[0])
    want_flat, tot = gold.forward_train(raw_flat, truths.astype(np.float64))

    np.testing.assert_allclose(got_flat, want_flat, rtol=rtol, atol=atol)
    assert int(metrics["count"]) == tot["count"]
    if tot["count"]:
        np.testing.assert_allclose(float(metrics["avg_iou"]),
                                   tot["iou"] / tot["count"], rtol=1e-4)
    return metrics


TRUTHS = np.array([
    [0.30, 0.40, 0.20, 0.25, 1],
    [0.71, 0.62, 0.12, 0.33, 0],
    [0.55, 0.55, 0.40, 0.40, 2],
    [0.0, 0.0, 0.0, 0.0, 0],        # terminator
    [0.9, 0.9, 0.1, 0.1, 1],        # after break: must be ignored
], dtype=np.float32)


@pytest.mark.parametrize("iou_loss", ["mse", "iou", "giou", "diou", "ciou"])
def test_loss_parity_iou_kinds(rng, iou_loss):
    l, net = _mk_head(iou_loss=iou_loss, max_delta=5 if iou_loss != "mse"
                      else float("inf"))
    _run_case(l, net, TRUTHS, rng)


def test_loss_parity_iou_thresh_extra_matches(rng):
    l, net = _mk_head(iou_loss="ciou", iou_thresh=0.213, max_delta=5)
    m = _run_case(l, net, TRUTHS, rng)
    assert int(m["count"]) >= 3     # extra matches fire


def test_loss_parity_scale_x_y(rng):
    l, net = _mk_head(iou_loss="mse", scale_x_y=1.1)
    _run_case(l, net, TRUTHS, rng)


def test_loss_parity_same_cell_truths(rng):
    # two truths landing in the same cell with the same best anchor:
    # exercises the sequential overwrite semantics + class "already set" path
    truths = np.array([
        [0.52, 0.52, 0.20, 0.25, 1],
        [0.55, 0.55, 0.22, 0.24, 1],
        [0.51, 0.56, 0.21, 0.26, 2],
    ], dtype=np.float32)
    l, net = _mk_head(iou_loss="ciou", max_delta=5)
    _run_case(l, net, truths, rng)


def test_loss_parity_label_smoothing_and_multipliers(rng):
    l, net = _mk_head(iou_loss="mse", cpc="2,1,1", label_smooth=0.1)
    _run_case(l, net, TRUTHS, rng)


def test_loss_parity_empty_truths(rng):
    truths = np.zeros((5, 5), dtype=np.float32)
    l, net = _mk_head(iou_loss="ciou", max_delta=5)
    m = _run_case(l, net, truths, rng)
    assert int(m["count"]) == 0


def test_cost_mse_is_delta_magnitude(rng):
    l, net = _mk_head(iou_loss="mse")
    h, w, c = l.out_h, l.out_w, l.out_c
    raw = rng.normal(size=(1, h, w, c)).astype(np.float32)
    delta, cost, _ = yolo_head_delta(
        jnp.asarray(raw), jnp.asarray(TRUTHS[None]), l, net.w, net.h)
    np.testing.assert_allclose(float(cost),
                               float(np.sum(np.asarray(delta) ** 2)),
                               rtol=1e-5)
