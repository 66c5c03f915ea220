"""NMS: exact host reference semantics + an on-device masked variant.

Reference (`box.cpp:372-419` NmsSort): per class, sort detections by that
class's prob (descending, qsort), then greedily zero the prob of any
lower-ranked detection whose IoU (greedy) or DIoU (diounms, beta) with a
surviving one exceeds `thresh`.  Boxes themselves are never removed — only
class probs are zeroed; a detection dies when all its probs are zero.

The device variant keeps the same semantics with a fixed box budget but no
sort and no serial rank loop: the stable descending rank order is encoded
as a dense suppressor predicate (p_j > p_i) | (p_j == p_i & j < i) over the
shared similarity matrix, and the exact greedy kept-set is obtained by an
interval fixpoint (lo/hi bounds under a while_loop) that converges in the
suppression-chain depth.  Only final detections leave HBM.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from darknet_tpu.ops import boxes as boxops


# --------------------------------------------------------------------------
# Host (numpy) exact reference implementation
# --------------------------------------------------------------------------

def _np_iou(a, b):
    def edges(v):
        return (v[..., 0] - v[..., 2] / 2, v[..., 0] + v[..., 2] / 2,
                v[..., 1] - v[..., 3] / 2, v[..., 1] + v[..., 3] / 2)

    al, ar, at, ab = edges(a)
    bl, br, bt, bb = edges(b)
    w = np.minimum(ar, br) - np.maximum(al, bl)
    h = np.minimum(ab, bb) - np.maximum(at, bt)
    inter = np.where((w < 0) | (h < 0), 0.0, w * h)
    uni = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    eps = np.finfo(np.float32).eps
    out = np.zeros_like(inter)
    ok = (np.abs(inter) >= eps) & (np.abs(uni) >= eps)
    out[ok] = inter[ok] / uni[ok]
    return out


def _np_diou(a, b, beta):
    def edges(v):
        return (v[..., 0] - v[..., 2] / 2, v[..., 0] + v[..., 2] / 2,
                v[..., 1] - v[..., 3] / 2, v[..., 1] + v[..., 3] / 2)

    al, ar, at, ab = edges(a)
    bl, br, bt, bb = edges(b)
    w = np.maximum(ar, br) - np.minimum(al, bl)
    h = np.maximum(ab, bb) - np.minimum(at, bt)
    c = w * w + h * h
    i = _np_iou(a, b)
    d = (a[..., 0] - b[..., 0]) ** 2 + (a[..., 1] - b[..., 1]) ** 2
    eps = np.finfo(np.float32).eps
    out = i.copy()
    ok = np.abs(c) >= eps
    out[ok] = i[ok] - np.power(d[ok] / c[ok], beta)
    return out


def nms_numpy(boxes: np.ndarray, probs: np.ndarray, thresh: float,
              kind: str = "greedynms", beta: float = 0.6,
              allow_native: bool = True) -> np.ndarray:
    """Exact NmsSort: boxes (N,4), probs (N,C) -> suppressed probs (N,C).

    Dispatches to the native C++ kernel (native/yolo_host) when available —
    identical semantics, ~100x faster for the mAP validator's thousands of
    candidates; falls back to pure numpy."""
    if allow_native:
        from darknet_tpu.utils.native import nms_native

        out = nms_native(boxes, probs, thresh, kind=kind, beta=beta)
        if out is not None:
            return out
    boxes = np.asarray(boxes, dtype=np.float32)
    probs = np.asarray(probs, dtype=np.float32).copy()
    n, c = probs.shape
    eps = np.finfo(np.float32).eps
    for k in range(c):
        order = np.argsort(-probs[:, k], kind="stable")
        for oi in range(n):
            i = order[oi]
            if abs(probs[i, k]) < eps:
                continue
            a = boxes[i]
            rest = order[oi + 1:]
            if rest.size == 0:
                continue
            if kind == "greedynms":
                sim = _np_iou(a[None, :], boxes[rest])
            else:
                sim = _np_diou(a[None, :], boxes[rest], beta)
            probs[rest[sim > thresh], k] = 0.0
    return probs


# --------------------------------------------------------------------------
# Device (jnp) fixed-size variant
# --------------------------------------------------------------------------

def nms_device(boxes, probs, thresh: float, kind: str = "greedynms",
               beta: float = 0.6):
    """Masked greedy NMS on device: boxes (N,4), probs (N,C) -> (N,C).

    Matches NmsSort up to tie-ordering: per class, detections are visited in
    descending-prob order and suppressed by any *surviving* higher-ranked
    detection with similarity > thresh.  Runs as C independent passes over a
    shared (N,N) similarity matrix (vmapped); N is static.

    Memory: the dense rank predicate P is (C,N,N) bool, so a batched
    (vmapped) call holds O(B*C*N^2) live across the while_loop — ~170 MB at
    B=32, C=80, N=256 (the serving default).  Fine at N<=256; if top_k is
    ever raised >=1k, re-derive P inside the loop body from the (N,N)
    suppress matrix + per-class rank compares instead of materializing it.
    """
    n = boxes.shape[0]
    if kind == "greedynms":
        sim = boxops.iou(boxes[:, None, :], boxes[None, :, :])
    else:
        sim = boxops.diou(boxes[:, None, :], boxes[None, :, :], beta)
    suppress = sim > thresh

    # greedy kept[i] = active[i] & no surviving higher-ranked j with
    # sim>thresh.  Two TPU adaptations of the serial greedy loop:
    #
    # 1. No argsort/gather: rank_j < rank_i (stable descending sort) is
    #    exactly (p_j > p_i) | (p_j == p_i & j < i), built as dense
    #    (C,N,N) broadcasts against the SHARED similarity matrix — the
    #    per-class [order][:, order] gather was the dominant cost.
    # 2. No serial rank loop (N scatter steps execute pathologically on
    #    this backend): dependencies run strictly down ranks (a DAG), so
    #    the exact kept-set is squeezed between monotone bounds
    #    Lo' = f(Hi), Hi' = f(Lo) with f(K)[i] = active[i] & !∃j: K[j] &
    #    P[i,j].  Ranks with suppression-chain depth <= t are decided
    #    after t iterations; the loop converges in the chain depth
    #    (typically < 5, bounded by N).
    pT = probs.T                                     # (C, N)
    lt = jnp.tril(jnp.ones((n, n), dtype=bool), -1)  # [i, j]: j < i
    gt = pT[:, None, :] > pT[:, :, None]             # [c,i,j]: p_j > p_i
    eq = (pT[:, None, :] == pT[:, :, None]) & lt[None]
    P = (gt | eq) & suppress[None]                   # suppressor j over i
    active = pT > 0.0

    def cond(st):
        lo, hi = st
        return jnp.any(lo != hi)

    def body(st):
        lo, hi = st
        lo2 = active & ~jnp.any(P & hi[:, None, :], axis=-1)
        hi2 = active & ~jnp.any(P & lo[:, None, :], axis=-1)
        return lo | lo2, hi & hi2

    kept, _ = lax.while_loop(
        cond, body, (jnp.zeros_like(active), active))
    return jnp.where(kept.T, probs, 0.0)
