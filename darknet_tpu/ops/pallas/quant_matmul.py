"""Pallas int8 quantized matmul — the TPU-native low-precision path.

The reference's XNOR/binary conv stack (gemm.c bit-GEMM + popcount,
SURVEY.md §2.2) maps to int8 on the MXU: v5e executes int8 matmuls at ~2x
bf16 throughput, making per-channel-quantized int8 the idiomatic analogue
of darknet's 1-bit path (bit-XNOR itself has no MXU mapping).

Kernel: output tiled (TM, TN); A-activation tiles (TM, K) int8 and
B-weight tiles (K, TN) int8 stream through VMEM; accumulation in int32 on
the MXU; the f32 epilogue applies per-output-channel weight scales x the
per-tensor activation scale (+ optional bias and leaky activation) before
writing — one fused pass, no intermediate int32 tensor in HBM.

Status: numerically EXACT vs an int32 reference when compiled on TPU
(validated on-chip); throughput tuning (int8 MXU path via Mosaic, K
blocking, double buffering) is tracked as follow-up — current Mosaic
lowering does not yet reach the 2x-bf16 int8 rate on v5e.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weights_int8(w: np.ndarray):
    """Per-output-channel symmetric int8 quantization of an HWIO (or (K,N))
    weight array.  Returns (w_int8, scales) with scales shaped (N,).
    The darknet analogue keeps a per-filter mean for its binary weights
    (convolutional_layer.cpp:42 binarize_weights); per-channel absmax is the
    int8 equivalent."""
    w = np.asarray(w, dtype=np.float32)
    flat = w.reshape(-1, w.shape[-1])
    absmax = np.maximum(np.abs(flat).max(axis=0), 1e-8)
    scales = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(flat / scales), -127, 127).astype(np.int8)
    return q.reshape(w.shape), scales


def quantize_activations_int8(x, absmax=None):
    """Per-tensor symmetric activation quantization (jnp, jit-safe)."""
    if absmax is None:
        absmax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel(a_ref, b_ref, ws_ref, bias_ref, xs_ref, o_ref, *, leaky: bool):
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (xs_ref[0, 0] * ws_ref[0, :])[None, :]
    y = y + bias_ref[0, :][None, :]
    if leaky:
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[:] = y


def int8_matmul(a_q, b_q, w_scales, bias, x_scale, *, leaky: bool = False,
                tm: int = 256, tn: int = 256, interpret: bool = False):
    """(M,K) int8 x (K,N) int8 -> (M,N) f32 with fused dequant epilogue.

    `w_scales` (N,) f32; `bias` (N,) f32; `x_scale` scalar f32.
    """
    m, k = a_q.shape
    k2, n = b_q.shape
    assert k == k2
    tm = min(tm, m)
    tn = min(tn, n)
    # pad to tile multiples
    pm = -m % tm
    pn = -n % tn
    if pm:
        a_q = jnp.pad(a_q, ((0, pm), (0, 0)))
    if pn:
        b_q = jnp.pad(b_q, ((0, 0), (0, pn)))
        w_scales = jnp.pad(w_scales, (0, pn))
        bias = jnp.pad(bias, (0, pn))
    mp, np_ = m + pm, n + pn

    grid = (mp // tm, np_ // tn)
    out = pl.pallas_call(
        functools.partial(_kernel, leaky=leaky),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=interpret,
    )(a_q, b_q, w_scales[None, :], bias[None, :],
      jnp.asarray(x_scale, jnp.float32).reshape(1, 1))
    return out[:m, :n]


def quantized_conv1x1(x, w_q, w_scales, bias, *, leaky: bool = False,
                      interpret: bool = False):
    """int8 1x1 convolution: NHWC x (1,1,C,N) int8 -> NHWC f32.

    The activation is quantized per-tensor on the fly (dynamic range), the
    matmul runs int8 on the MXU, and dequant+bias+leaky fuse into the
    epilogue — the TPU equivalent of the reference's binary-conv fast path.
    """
    b, h, w, c = x.shape
    n = w_q.shape[-1]
    a_q, x_scale = quantize_activations_int8(x)
    out = int8_matmul(
        a_q.reshape(-1, c), jnp.asarray(w_q).reshape(c, n),
        jnp.asarray(w_scales), jnp.asarray(bias), x_scale, leaky=leaky,
        interpret=interpret)
    return out.reshape(b, h, w, n)
