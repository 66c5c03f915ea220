"""Pooling ops: maxpool (spatial + depth modes), global avgpool.

Reference semantics (`maxpool_layer.cpp:214-300`):

* spatial maxpool: ``out = (in + pad - size)//stride + 1`` with the window
  origin offset by ``-pad//2``; out-of-range taps contribute -inf;
* `maxpool_depth`: max over channel groups at each spatial position —
  channel k maps to output channel ``k % out_c``;
* global avgpool (`avgpool_layer.cpp`): mean over H,W.

Implemented with `lax.reduce_window`, which XLA lowers to the VPU with an
efficient derivative (no explicit argmax indices needed — the reference only
keeps `indexes` for its hand-written backward).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from darknet_tpu.ops.conv import antialias_blur


def maxpool(x, l, train: bool = False):
    """Darknet maxpool on NHWC input, per MaxpoolIR `l`.

    Inference uses `lax.reduce_window` (one fused VPU pass — essential for
    the SPP's 13x13 stride-1 pools); training uses the equivalent max of
    shifted slices, which has a reverse-mode derivative.
    """
    if l.maxpool_depth:
        b, h, w, c = x.shape
        out_c = l.out_channels
        groups = -(-c // out_c)              # ceil; c % out_c == 0 in practice
        pad_c = groups * out_c - c
        if pad_c:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)),
                        constant_values=-jnp.inf)
        # channel k -> (group k//out_c, slot k%out_c): reduce over groups
        y = x.reshape(b, h, w, groups, out_c)
        return jnp.max(y, axis=3)

    lo = l.pad // 2
    hi_h = max((l.out_h - 1) * l.stride_y + l.size - l.h - lo, 0)
    hi_w = max((l.out_w - 1) * l.stride_x + l.size - l.w - lo, 0)
    if not train:
        neg_inf = jnp.array(-jnp.inf, dtype=x.dtype)
        return lax.reduce_window(
            x, neg_inf, lax.max,
            window_dimensions=(1, l.size, l.size, 1),
            window_strides=(1, l.stride_y, l.stride_x, 1),
            padding=((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)),
        )
    # training: max over size^2 shifted strided slices — same result,
    # reverse-mode differentiable (reduce_window has no VJP here)
    xp = jnp.pad(x, ((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)),
                 constant_values=-jnp.inf)
    out = None
    for dy in range(l.size):
        for dx in range(l.size):
            s = xp[:, dy:dy + (l.out_h - 1) * l.stride_y + 1:l.stride_y,
                   dx:dx + (l.out_w - 1) * l.stride_x + 1:l.stride_x, :]
            out = s if out is None else jnp.maximum(out, s)
    return out


def maxpool_block(x, l, train: bool = False):
    y = maxpool(x, l, train=train)
    if l.antialiasing:
        y = antialias_blur(y, l)
    return y


def global_avgpool(x):
    """[avgpool]: NHWC -> (N, 1, 1, C) mean over spatial dims."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
