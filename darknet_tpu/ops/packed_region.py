"""Generalized space-to-depth region packing (extends ops/stem.py).

Any same-resolution run of {stride-1 conv (1x1/3x3), route-concat,
shortcut, activation} layers whose channel count is below the 128-lane
width wastes HBM bandwidth on lane padding.  This pass executes such a
segment in S2D coordinates — (H/2, W/2, 4C), phase-major channels — where:

* 1x1 convs become block-diagonal 1x1 convs (4C -> 4N);
* 3x3 stride-1 convs become 3x3 convs with phase-mixed taps
  (`stem.pack_w0` — valid for any C, N);
* route concat interleaves per phase (stays phase-major);
* shortcut / activations are elementwise (layout-invariant);
* a terminating 3x3 stride-2 conv exits the region FOR FREE via
  `stem.pack_w1` (its output is already at half resolution);
* any other exit unpacks with a depth-to-space reshape.

Applied on the fused inference path to the first CSP stage of
yolov3/yolov4 (measured ~35% of the forward before packing).  Exact
algebra — the golden parity gates cover the packed path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from darknet_tpu.ops.activations import apply_activation
from darknet_tpu.ops.stem import pack_w0, pack_w1


@dataclasses.dataclass
class RegionPlan:
    start: int          # first packed layer index
    end: int            # index AFTER the last packed layer
    terminator: int     # index of the exit stride-2 conv, or -1 (unpack)
    ext_refs: set       # region layers referenced from outside the region


def _conv_packable(l) -> bool:
    return (l.kind == "convolutional" and l.groups == 1 and l.dilation == 1
            and l.stride_x == 1 and l.stride_y == 1
            and l.size in (1, 3) and l.pad == l.size // 2
            and not l.antialiasing and l.share_index is None)


def _conv_terminator(l) -> bool:
    return (l.kind == "convolutional" and l.groups == 1 and l.dilation == 1
            and l.stride_x == 2 and l.stride_y == 2 and l.size == 3
            and l.pad == 1 and not l.antialiasing and l.share_index is None)


def plan_region(graph, start: int, max_channels: int = 96) -> RegionPlan | None:
    """Find a packable region beginning at `start` (whose input is layer
    start-1's output).  Only worthwhile while channel counts stay under
    `max_channels` (above that, lane padding is minor)."""
    layers = graph.layers
    if start >= len(layers):
        return None
    h0, w0 = layers[start].h, layers[start].w
    if h0 % 2 or w0 % 2:
        return None
    i = start
    end = start
    while i < len(layers):
        l = layers[i]
        if _conv_terminator(l) and l.h == h0 and i > start:
            # free exit through the stride-2 conv
            plan = RegionPlan(start, i + 1, i, set())
            break
        if l.kind == "convolutional":
            if not _conv_packable(l) or l.h != h0 or l.c > max_channels * 2 \
                    or l.n > max_channels * 2:
                plan = RegionPlan(start, i, -1, set())
                break
        elif l.kind == "route":
            if l.groups != 1 or any(s < start - 1 for s in l.layers):
                plan = RegionPlan(start, i, -1, set())
                break
        elif l.kind == "shortcut":
            if l.from_layer < start - 1:
                plan = RegionPlan(start, i, -1, set())
                break
        elif l.kind == "activation":
            pass
        else:
            plan = RegionPlan(start, i, -1, set())
            break
        i += 1
        end = i
    else:
        plan = RegionPlan(start, end, -1, set())

    if plan.end - plan.start < 3:          # not worth the entry transpose
        return None

    # external references into the region force an unpack of those outputs
    consumers = graph.consumers()
    for li in range(plan.start, plan.end):
        for c in consumers.get(li, []):
            if c >= plan.end:
                plan.ext_refs.add(li)
    if plan.terminator >= 0 and plan.terminator in plan.ext_refs:
        plan.ext_refs.discard(plan.terminator)
    return plan


def s2d(x):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // 2, w // 2, 4 * c)


def d2s(xp, c: int):
    b, h2, w2, c4 = xp.shape
    y = xp.reshape(b, h2, w2, 2, 2, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        b, h2 * 2, w2 * 2, c)


def _phase_concat(tensors, channels):
    """Concat phase-major packed tensors, keeping phase-major order."""
    parts = []
    for t, c in zip(tensors, channels):
        b, h, w, _ = t.shape
        parts.append(t.reshape(b, h, w, 4, c))
    y = jnp.concatenate(parts, axis=-1)
    b, h, w, _, ctot = y.shape
    return y.reshape(b, h, w, 4 * ctot)


def run_region(graph, params, plan: RegionPlan, x_in, outs, *,
               compute_dtype=None):
    """Execute the packed region.  `x_in` is layer (start-1)'s output
    (unpacked); fills `outs` for ext_refs; returns (cur, next_index) where
    `cur` is the unpacked output the following layer consumes."""
    precision = None if compute_dtype is not None else lax.Precision.HIGHEST
    cd = compute_dtype or jnp.float32
    layers = graph.layers

    packed: dict[int, jnp.ndarray] = {}
    cur = s2d(x_in).astype(cd)
    prev_idx = plan.start - 1
    packed[prev_idx] = cur

    def getp(idx):
        return packed[idx]

    for i in range(plan.start, plan.end):
        l = layers[i]
        if l.kind == "convolutional" and i == plan.terminator:
            w1p = pack_w1(jnp.asarray(params[i]["w"])).astype(cd)
            y = lax.conv_general_dilated(
                cur, w1p, (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision, preferred_element_type=jnp.float32)
            y = y + jnp.asarray(params[i]["b"], jnp.float32)
            if compute_dtype is not None:
                y = y.astype(cd)
            cur = apply_activation(y, l.activation)
            # terminator output is unpacked (already at half res)
            return cur, i + 1
        if l.kind == "convolutional":
            w = jnp.asarray(params[i]["w"])
            # NOTE: grouped-conv (feature_group_count=4) formulations of the
            # 1x1s measured 1.6-2x SLOWER than dense block-diagonal on v5e —
            # Mosaic serializes small group convs; keep dense.
            if l.size == 3:
                wp = pack_w0(w).astype(cd)
                pad = ((1, 1), (1, 1))
            else:
                # block-diagonal 1x1: W'[., p*C+c, p*N+n] = w[., c, n]
                C, N = w.shape[2], w.shape[3]
                wp = jnp.zeros((1, 1, 4 * C, 4 * N), w.dtype)
                for p in range(4):
                    wp = wp.at[0, 0, p * C:(p + 1) * C,
                               p * N:(p + 1) * N].set(w[0, 0])
                wp = wp.astype(cd)
                pad = ((0, 0), (0, 0))
            y = lax.conv_general_dilated(
                cur, wp, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision, preferred_element_type=jnp.float32)
            y = y + jnp.tile(jnp.asarray(params[i]["b"], jnp.float32), 4)
            if compute_dtype is not None:
                y = y.astype(cd)
            cur = apply_activation(y, l.activation)
        elif l.kind == "route":
            srcs = [getp(s) for s in l.layers]
            chans = [layers[s].out_c if s >= plan.start else
                     layers[s].out_c for s in l.layers]
            cur = _phase_concat(srcs, chans)
        elif l.kind == "shortcut":
            cur = apply_activation(cur + getp(l.from_layer), l.activation)
        elif l.kind == "activation":
            cur = apply_activation(cur, l.activation)
        packed[i] = cur
        if i in plan.ext_refs:
            outs[i] = d2s(cur, layers[i].out_c)

    # no terminator: unpack and continue
    last = plan.end - 1
    return d2s(cur, layers[last].out_c), plan.end
