"""Box math: IoU / GIoU / DIoU / CIoU, center-format, vectorized.

Reference: `box.cpp:36-128`.  Boxes are (..., 4) arrays in darknet
center-format (x, y, w, h).  Degenerate-box behaviour matches the reference:
IoU returns 0 when intersection or union is (near) zero; the
enclosing-box-degenerate cases fall back to plain IoU.

The closed-form IoU-family losses are differentiable jnp expressions —
training uses `jax.grad` of these instead of the reference's 200-line
hand-derived `DxIou` (`box.cpp:153-351`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS = 1.19209290e-07  # FLT_EPSILON


def _edges(b):
    x, y, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return x - w / 2, x + w / 2, y - h / 2, y + h / 2


def intersection(a, b):
    al, ar, at, ab_ = _edges(a)
    bl, br, bt, bb = _edges(b)
    w = jnp.minimum(ar, br) - jnp.maximum(al, bl)
    h = jnp.minimum(ab_, bb) - jnp.maximum(at, bt)
    return jnp.where((w < 0) | (h < 0), 0.0, w * h)


def union(a, b):
    return a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - intersection(a, b)


def iou(a, b):
    i = intersection(a, b)
    u = union(a, b)
    safe = (jnp.abs(i) >= _EPS) & (jnp.abs(u) >= _EPS)
    return jnp.where(safe, i / jnp.where(safe, u, 1.0), 0.0)


def _enclose_wh(a, b):
    al, ar, at, ab_ = _edges(a)
    bl, br, bt, bb = _edges(b)
    w = jnp.maximum(ar, br) - jnp.minimum(al, bl)
    h = jnp.maximum(ab_, bb) - jnp.minimum(at, bt)
    return w, h


def giou(a, b):
    w, h = _enclose_wh(a, b)
    c = w * h
    i = iou(a, b)
    u = union(a, b)
    safe = jnp.abs(c) >= _EPS
    term = jnp.where(safe, (c - u) / jnp.where(safe, c, 1.0), 0.0)
    return jnp.where(safe, i - term, i)


def diou(a, b, beta: float = 0.6):
    w, h = _enclose_wh(a, b)
    c = w * w + h * h
    i = iou(a, b)
    d = jnp.square(a[..., 0] - b[..., 0]) + jnp.square(a[..., 1] - b[..., 1])
    safe = jnp.abs(c) >= _EPS
    ratio = jnp.where(safe, d / jnp.where(safe, c, 1.0), 0.0)
    term = jnp.power(jnp.maximum(ratio, 0.0), beta)
    return jnp.where(safe, i - term, i)


def ciou(a, b):
    w, h = _enclose_wh(a, b)
    c = w * w + h * h
    i = iou(a, b)
    u = jnp.square(a[..., 0] - b[..., 0]) + jnp.square(a[..., 1] - b[..., 1])
    safe = jnp.abs(c) >= _EPS
    d = jnp.where(safe, u / jnp.where(safe, c, 1.0), 0.0)
    ar_gt = b[..., 2] / jnp.maximum(b[..., 3], _EPS)
    ar_pred = a[..., 2] / jnp.maximum(a[..., 3], _EPS)
    ar_loss = (4.0 / (math.pi ** 2)) * jnp.square(
        jnp.arctan(ar_gt) - jnp.arctan(ar_pred))
    alpha = ar_loss / (1.0 - i + ar_loss + 1e-6)
    return jnp.where(safe, i - (d + alpha * ar_loss), i)


def rmse(a, b):
    return jnp.sqrt(
        jnp.square(a[..., 0] - b[..., 0]) + jnp.square(a[..., 1] - b[..., 1]) +
        jnp.square(a[..., 2] - b[..., 2]) + jnp.square(a[..., 3] - b[..., 3]))


IOU_FNS = {"iou": iou, "giou": giou, "diou": diou, "ciou": ciou, "mse": rmse}


def iou_kind(a, b, kind: str):
    return IOU_FNS[kind](a, b)
