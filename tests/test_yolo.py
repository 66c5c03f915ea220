"""YOLO head activation/decode vs a literal port of the reference loops
(yolo_layer.cpp:388-407 forward, 139-147 GetYoloBox, 794-830 detections)."""

import numpy as np

import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.ops import yolo as yoloops


def _mk_yolo(w=4, h=4, classes=3, mask=(0, 1), num=2,
             scale_x_y=1.0, anchors=(10, 14, 23, 27)):
    n = len(mask)
    filters = n * (classes + 5)
    text = f"""[net]
width={w}
height={h}
channels=3
[convolutional]
filters={filters}
size=1
activation=linear
[yolo]
mask={','.join(map(str, mask))}
num={num}
classes={classes}
anchors={','.join(map(str, anchors))}
scale_x_y={scale_x_y}
"""
    g = build_graph(text)
    return g.layers[1], g.net


def _ref_activate_decode(x_nchw, l, net_w, net_h, scale_x_y):
    """Literal EntryIndex-based loops, single batch, darknet CHW layout."""
    classes = l.classes
    n = len(l.mask)
    h, w = l.out_h, l.out_w
    stride = w * h
    out = x_nchw.reshape(-1).copy()

    def entry_index(a, loc, entry):
        return a * stride * (4 + classes + 1) + entry * stride + loc

    def logistic(v):
        return 1 / (1 + np.exp(-v))

    for a in range(n):
        i0 = entry_index(a, 0, 0)
        out[i0:i0 + 2 * stride] = logistic(out[i0:i0 + 2 * stride])
        out[i0:i0 + 2 * stride] = out[i0:i0 + 2 * stride] * scale_x_y \
            - 0.5 * (scale_x_y - 1)
        i4 = entry_index(a, 0, 4)
        out[i4:i4 + (1 + classes) * stride] = \
            logistic(out[i4:i4 + (1 + classes) * stride])

    boxes, objs, clss = [], [], []
    for a in range(n):
        for loc in range(stride):
            col, row = loc % w, loc // w
            bi = entry_index(a, loc, 0)
            bx = (col + out[bi + 0 * stride]) / w
            by = (row + out[bi + 1 * stride]) / h
            bw = np.exp(out[bi + 2 * stride]) * l.anchors[2 * l.mask[a]] / net_w
            bh = np.exp(out[bi + 3 * stride]) * l.anchors[2 * l.mask[a] + 1] / net_h
            boxes.append((bx, by, bw, bh))
            objs.append(out[entry_index(a, loc, 4)])
            clss.append([out[entry_index(a, loc, 5 + j)]
                         for j in range(classes)])
    return out, np.array(boxes), np.array(objs), np.array(clss)


def test_yolo_activate_and_decode(rng):
    for scale_x_y in (1.0, 1.05):
        l, net = _mk_yolo(scale_x_y=scale_x_y)
        h, w, c = l.out_h, l.out_w, l.out_c
        x_nhwc = rng.normal(size=(1, h, w, c)).astype(np.float32)
        # darknet CHW equivalent
        x_chw = np.transpose(x_nhwc[0], (2, 0, 1))

        activated = yoloops.yolo_activate(jnp.asarray(x_nhwc), l)
        ref_out, ref_boxes, ref_obj, ref_cls = _ref_activate_decode(
            x_chw, l, net.w, net.h, scale_x_y)
        # compare activated maps (convert ours to CHW flat)
        got_chw = np.transpose(np.asarray(activated)[0], (2, 0, 1)).ravel()
        np.testing.assert_allclose(got_chw, ref_out, rtol=2e-5, atol=1e-6)

        boxes, obj, cls = yoloops.yolo_decode(activated, l, net.w, net.h)
        np.testing.assert_allclose(np.asarray(boxes)[0], ref_boxes,
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(obj)[0], ref_obj,
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cls)[0], ref_cls,
                                   rtol=2e-5, atol=1e-6)


def test_yolo_decode_score_dtype(rng):
    """Serving precision: score_dtype casts obj/cls only; boxes stay f32
    and scores agree with the f32 path to bf16 resolution."""
    l, net = _mk_yolo(scale_x_y=1.0)
    x = rng.normal(size=(2, l.out_h, l.out_w, l.out_c)).astype(np.float32)
    act = yoloops.yolo_activate(jnp.asarray(x), l)
    b32, o32, c32 = yoloops.yolo_decode(act, l, net.w, net.h,
                                        order="native")
    b16, o16, c16 = yoloops.yolo_decode(act, l, net.w, net.h,
                                        order="native",
                                        score_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.float32
    assert o16.dtype == jnp.bfloat16 and c16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(b32), np.asarray(b16))
    np.testing.assert_allclose(np.asarray(o16, dtype=np.float32),
                               np.asarray(o32), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c16, dtype=np.float32),
                               np.asarray(c32), rtol=1e-2, atol=1e-3)
    # planar layout: same coordinates as packed, split per coordinate
    (px, py, pw, ph), op, cp = yoloops.yolo_decode(
        act, l, net.w, net.h, order="native", layout="planar")
    for k, v in enumerate((px, py, pw, ph)):
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(b32)[..., k])
    np.testing.assert_array_equal(np.asarray(op), np.asarray(o32))


def test_gaussian_yolo_decode(rng):
    classes, mask = 2, (0, 1)
    n = len(mask)
    filters = n * (classes + 9)
    text = f"""[net]
width=64
height=64
channels=3
[convolutional]
filters={filters}
size=1
activation=linear
[Gaussian_yolo]
mask=0,1
num=2
classes={classes}
anchors=10,14,23,27
"""
    g = build_graph(text)
    l = g.layers[1]
    h, w, c = l.out_h, l.out_w, l.out_c
    x = rng.normal(size=(1, h, w, c)).astype(np.float32)
    act = yoloops.gaussian_yolo_activate(jnp.asarray(x), l)
    boxes, obj, cls, uc = yoloops.gaussian_yolo_decode(act, l, 64, 64)

    # scalar spot-check against the formulas
    v = x[0].reshape(h, w, n, classes + 9)

    def sig(z):
        return 1 / (1 + np.exp(-z))

    a, row, col = 1, 2, 3
    mu_x = sig(v[row, col, a, 0])
    mu_w = v[row, col, a, 4]
    want_bx = (col + mu_x) / w
    want_bw = np.exp(mu_w) * l.anchors[2 * mask[a]] / 64
    flat = a * (h * w) + row * w + col
    np.testing.assert_allclose(float(boxes[0, flat, 0]), want_bx, rtol=1e-5)
    np.testing.assert_allclose(float(boxes[0, flat, 2]), want_bw, rtol=1e-5)
    # uncertainty-scaled class prob
    sigs = [sig(v[row, col, a, 1]), sig(v[row, col, a, 3]),
            sig(v[row, col, a, 5]), sig(v[row, col, a, 7])]
    uc_avg = np.mean(sigs)
    want_cls0 = sig(v[row, col, a, 9]) * (1 - uc_avg)
    np.testing.assert_allclose(float(cls[0, flat, 0]), want_cls0, rtol=1e-5)


def test_gaussian_decode_native_order(rng):
    """Native order is a pure permutation of the reference order with
    identical value multisets; score_dtype casts obj/cls only."""
    classes, mask = 2, (0, 1)
    filters = len(mask) * (classes + 9)
    text = f"""[net]
width=32
height=32
channels=3
[convolutional]
filters={filters}
size=1
activation=linear
[Gaussian_yolo]
mask=0,1
num=2
classes={classes}
anchors=10,14,23,27
"""
    g = build_graph(text)
    l = g.layers[1]
    x = rng.normal(size=(2, l.out_h, l.out_w, l.out_c)).astype(np.float32)
    act = yoloops.gaussian_yolo_activate(jnp.asarray(x), l)
    br, or_, cr, ur = yoloops.gaussian_yolo_decode(act, l, 32, 32)
    bn, on, cn, un = yoloops.gaussian_yolo_decode(
        act, l, 32, 32, order="native", score_dtype=jnp.bfloat16)
    assert on.dtype == jnp.bfloat16 and cn.dtype == jnp.bfloat16
    assert bn.dtype == jnp.float32 and un.dtype == jnp.float32
    # same multiset of objectness values (order differs)
    np.testing.assert_allclose(
        np.sort(np.asarray(on, dtype=np.float32).ravel()),
        np.sort(np.asarray(or_).ravel()), rtol=1e-2, atol=1e-3)
    # boxes: native row = some reference row (sorted rows equal)
    sr = np.sort(np.asarray(br).reshape(-1, 4), axis=0)
    sn = np.sort(np.asarray(bn).reshape(-1, 4), axis=0)
    np.testing.assert_allclose(sn, sr, rtol=1e-6, atol=1e-7)
