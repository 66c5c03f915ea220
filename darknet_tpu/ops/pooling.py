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


def maxpool(x, l):
    """Darknet maxpool on NHWC input, per MaxpoolIR `l`."""
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
    # max over size^2 shifted strided slices: equivalent to reduce_window
    # but reverse-mode differentiable (reduce_window has no VJP here) and
    # fully fusable by XLA.
    xp = jnp.pad(x, ((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)),
                 constant_values=-jnp.inf)
    out = None
    for dy in range(l.size):
        for dx in range(l.size):
            s = xp[:, dy:dy + (l.out_h - 1) * l.stride_y + 1:l.stride_y,
                   dx:dx + (l.out_w - 1) * l.stride_x + 1:l.stride_x, :]
            out = s if out is None else jnp.maximum(out, s)
    return out


def maxpool_block(x, l):
    y = maxpool(x, l)
    if l.antialiasing:
        y = antialias_blur(y, l)
    return y


def global_avgpool(x):
    """[avgpool]: NHWC -> (N, 1, 1, C) mean over spatial dims."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
