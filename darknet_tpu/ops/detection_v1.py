"""YOLOv1 [detection] head: decode + training loss
(detection_layer.cpp:47-256).

Output layout per batch item (flat, side*side = S cells, n boxes/cell):
``[S*classes class probs][S*n confidences][S*n*4 boxes]``.

Decode (GetDetectionDetections:226-256): ``b.x=(px+col)/side``,
``b.w = pw^(2 if sqrt else 1)``; prob = conf * class_prob, thresholded.

Training truth layout (grid-style, unlike the v3 packed box list):
``(B, S, 1+classes+4)``: [is_obj, onehot classes, x, y, w, h] with x,y
relative to the CELL times side (i.e. truth.x/side is image-relative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from darknet_tpu.ops import boxes as boxops


def detection_decode(flat, l):
    """(B, outputs) -> (boxes (B,S*n,4) rel coords, obj (B,S*n),
    cls (B,S*n,classes))."""
    b = flat.shape[0]
    S = l.side * l.side
    n, classes = l.num, l.classes
    cls = flat[:, :S * classes].reshape(b, S, classes)
    conf = flat[:, S * classes:S * (classes + n)].reshape(b, S, n)
    boxes = flat[:, S * (classes + n):].reshape(b, S, n, 4)

    rows = (jnp.arange(S) // l.side).astype(jnp.float32)
    cols = (jnp.arange(S) % l.side).astype(jnp.float32)
    bx = (boxes[..., 0] + cols[None, :, None]) / l.side
    by = (boxes[..., 1] + rows[None, :, None]) / l.side
    bw = jnp.square(boxes[..., 2]) if l.sqrt else boxes[..., 2]
    bh = jnp.square(boxes[..., 3]) if l.sqrt else boxes[..., 3]
    out_boxes = jnp.stack([bx, by, bw, bh], axis=-1).reshape(b, S * n, 4)
    out_conf = conf.reshape(b, S * n)
    out_cls = jnp.repeat(cls[:, :, None, :], n, axis=2).reshape(
        b, S * n, classes)
    return out_boxes, out_conf, out_cls


def encode_v1_truth(box_list, l):
    """Packed (T,5) [x,y,w,h,cls] box list -> v1 grid truth
    (S, 1+classes+4) with cell-relative x,y scaled by side."""
    import numpy as np

    S = l.side * l.side
    out = np.zeros((S, 1 + l.classes + 4), np.float32)
    for t in range(box_list.shape[0]):
        x, y, w, h, cid = box_list[t]
        if x == 0:
            break
        col = min(int(x * l.side), l.side - 1)
        row = min(int(y * l.side), l.side - 1)
        cell = row * l.side + col
        if out[cell, 0]:
            continue
        out[cell, 0] = 1
        out[cell, 1 + int(cid)] = 1
        out[cell, 1 + l.classes + 0] = x * l.side - col
        out[cell, 1 + l.classes + 1] = y * l.side - row
        out[cell, 1 + l.classes + 2] = w
        out[cell, 1 + l.classes + 3] = h
    return out


def encode_v1_truth_batch(truths, l):
    """Batched, jit-safe (T,5) box list -> v1 grid truth.

    truths: (B, T, 5) [x, y, w, h, cls]; returns (B, S, 1+classes+4).
    First box per cell wins (matching encode_v1_truth / the reference's
    fill order): boxes are scattered in reverse so the earliest write
    lands last.
    """
    b, t_max, _ = truths.shape
    s = l.side * l.side
    bi = jnp.arange(b)
    out = jnp.zeros((b, s, 1 + l.classes + 4), jnp.float32)
    for t in range(t_max - 1, -1, -1):
        x, y, w, h = (truths[:, t, k] for k in range(4))
        cid = truths[:, t, 4].astype(jnp.int32)
        valid = x > 0
        col = jnp.clip((x * l.side).astype(jnp.int32), 0, l.side - 1)
        row = jnp.clip((y * l.side).astype(jnp.int32), 0, l.side - 1)
        cell = row * l.side + col
        vals = jnp.concatenate([
            jnp.ones((b, 1), jnp.float32),
            jax.nn.one_hot(cid, l.classes, dtype=jnp.float32),
            (x * l.side - col)[:, None], (y * l.side - row)[:, None],
            w[:, None], h[:, None]], axis=1)
        old = out[bi, cell]
        out = out.at[bi, cell].set(jnp.where(valid[:, None], vals, old))
    return out


def detection_head_delta(flat, truth, l, seen: int = 100000,
                         rng_best=None):
    """Training delta (ForwardDetectionLayer:47-216) — vectorized.

    flat: (B, outputs); truth: (B, S, 1+classes+4) grid truth.
    Returns (delta (B, outputs), cost, metrics).  The early-training random
    responsible-box selection (`l->random && seen < 64000`) uses `rng_best`
    when provided.
    """
    B = flat.shape[0]
    S = l.side * l.side
    n, classes = l.num, l.classes
    cls = flat[:, :S * classes].reshape(B, S, classes)
    conf = flat[:, S * classes:S * (classes + n)].reshape(B, S, n)
    pbox = flat[:, S * (classes + n):].reshape(B, S, n, 4)

    is_obj = truth[..., 0] > 0                       # (B,S)
    t_cls = truth[..., 1:1 + classes]                # (B,S,classes)
    t_box = truth[..., 1 + classes:]                 # (B,S,4)

    # background confidence deltas everywhere
    d_conf = l.noobject_scale * (0.0 - conf)

    # class deltas at object cells
    d_cls = jnp.where(is_obj[..., None],
                      l.class_scale * (t_cls - cls), 0.0)

    # responsible box: best IoU (fall back to best RMSE when no overlap)
    rows = (jnp.arange(S) // l.side).astype(jnp.float32)
    cols = (jnp.arange(S) % l.side).astype(jnp.float32)
    truth_abs = jnp.stack([
        (t_box[..., 0] + cols[None, :]) / l.side,
        (t_box[..., 1] + rows[None, :]) / l.side,
        t_box[..., 2], t_box[..., 3]], axis=-1)       # (B,S,4)
    pw = jnp.square(pbox[..., 2]) if l.sqrt else pbox[..., 2]
    ph = jnp.square(pbox[..., 3]) if l.sqrt else pbox[..., 3]
    pred_abs = jnp.stack([
        (pbox[..., 0] + cols[None, :, None]) / l.side,
        (pbox[..., 1] + rows[None, :, None]) / l.side,
        pw, ph], axis=-1)                             # (B,S,n,4)

    ious = boxops.iou(pred_abs, truth_abs[:, :, None, :])     # (B,S,n)
    rmses = boxops.rmse(pred_abs, truth_abs[:, :, None, :])
    any_iou = jnp.any(ious > 0, axis=-1)
    best_by_iou = jnp.argmax(ious, axis=-1)
    best_by_rmse = jnp.argmin(rmses, axis=-1)
    best = jnp.where(any_iou, best_by_iou, best_by_rmse)      # (B,S)
    if l.forced:
        small = (t_box[..., 2] * t_box[..., 3]) < 0.1
        best = jnp.where(small, 1, 0)
    if l.random and seen < 64000 and rng_best is not None:
        best = jax.random.randint(rng_best, best.shape, 0, n)

    onehot_best = jax.nn.one_hot(best, n, dtype=jnp.float32)  # (B,S,n)
    best_iou = jnp.take_along_axis(ious, best[..., None], -1)[..., 0]
    best_conf = jnp.take_along_axis(conf, best[..., None], -1)[..., 0]

    obj_target = best_iou if l.rescore else 1.0
    d_conf_obj = l.object_scale * (obj_target - best_conf)
    d_conf = jnp.where(is_obj[..., None],
                       jnp.where(onehot_best > 0, d_conf_obj[..., None],
                                 d_conf),
                       d_conf)

    t_for_box = t_box
    if l.sqrt:
        t_for_box = t_box.at[..., 2].set(jnp.sqrt(t_box[..., 2]))
        t_for_box = t_for_box.at[..., 3].set(jnp.sqrt(t_box[..., 3]))
    d_box = l.coord_scale * (t_for_box[:, :, None, :] - pbox)
    d_box = jnp.where((is_obj[..., None] & (onehot_best > 0))[..., None],
                      d_box, 0.0)

    delta = jnp.concatenate([
        d_cls.reshape(B, -1), d_conf.reshape(B, -1), d_box.reshape(B, -1)],
        axis=1)
    cost = jnp.sum(jnp.square(delta))
    metrics = {
        "loss": cost / B,
        "avg_iou": jnp.sum(jnp.where(is_obj, best_iou, 0.0)) /
        jnp.maximum(jnp.sum(is_obj), 1),
        "count": jnp.sum(is_obj),
    }
    return delta, cost, metrics


def cost_layer(x, truth, kind: str = "sse", ratio: float = 0.0):
    """[cost] layer (cost_layer.c:64-87): returns (cost, delta).

    sse: L2; smooth: smooth-L1; masked: entries where truth==SECRET_NUM
    are excluded.  delta = truth - x (gradient-ascent convention).
    """
    SECRET = -1234.0
    if kind == "masked":
        x = jnp.where(truth == SECRET, SECRET, x)
    d = truth - x
    if kind == "smooth":
        ad = jnp.abs(d)
        loss = jnp.where(ad < 1, 0.5 * d * d, ad - 0.5)
        delta = jnp.where(ad < 1, d, jnp.sign(d))
    else:
        loss = d * d
        delta = 2 * d
    return jnp.sum(loss), delta
