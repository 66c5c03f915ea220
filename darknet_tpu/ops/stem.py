"""Space-to-depth stem fusion — the TPU layout fix for darknet stems.

Problem: yolov3/yolov4 open with ``conv 32 3x3 s1`` at full resolution
followed by ``conv 64 3x3 s2``.  On TPU the (B, 608, 608, 32) intermediate
is lane-padded 32->128 (4x HBM waste) and C=3 starves the MXU: measured,
these two layers cost ~35% of the whole yolov4-608 forward.

Fix (exact algebra, no approximation): operate in space-to-depth
coordinates.  With S2D blocks of 2:

* the input becomes (B, H/2, W/2, 12);
* conv0's four output phases pack into channels:
  ``out0'[y, x, (py*2+px)*N0 + n] = out0[2y+py, 2x+px, n]`` — computed by a
  3x3 conv with rearranged taps (support spans blocks y-1..y+1);
* conv1 (stride 2) reads exactly one phase lattice, so it becomes a 2x2
  conv over the packed tensor with padding (1,0).

Both replacement convs run at H/2 with 12->128 and 128->64 channels —
MXU-aligned, and the 608^2 x 32 tensor never exists.  Activation (mish/
leaky) and biases apply to the packed tensor unchanged (elementwise).

Applies to the FUSED inference path when the graph opens with the
(conv s1 3x3) -> (conv s2 3x3) pattern.  `fused_stem_train` extends the
same algebra to training: batch norm runs live INSIDE the packed layout —
packed phase channel (py*2+px)*N + n holds conv-output channel n at pixel
phase (py, px), so per-channel statistics over (B, H/2, W/2, 4 phases)
equal the unpacked statistics over (B, H, W) exactly (same count, same
Bessel correction; only the summation order differs).
"""

from __future__ import annotations



import jax.numpy as jnp
from jax import lax

from darknet_tpu.ops.activations import apply_activation


def stem_pattern(graph) -> bool:
    """True when layers 0 and 1 match the fusable darknet stem."""
    if len(graph.layers) < 2:
        return False
    l0, l1 = graph.layers[0], graph.layers[1]
    return (
        l0.kind == "convolutional" and l1.kind == "convolutional"
        and l0.size == 3 and l0.stride_x == 1 and l0.stride_y == 1
        and l0.pad == 1 and l0.groups == 1 and not l0.antialiasing
        and l0.dilation == 1
        and l1.size == 3 and l1.stride_x == 2 and l1.stride_y == 2
        and l1.pad == 1 and l1.groups == 1 and not l1.antialiasing
        and l1.dilation == 1
        and graph.net.h % 2 == 0 and graph.net.w % 2 == 0
        and l0.share_index is None and l1.share_index is None
    )


def pack_w0(w0):
    """(3,3,C,N) -> (3,3,4C,4N): S2D-phase form of the stride-1 conv.

    Output channel (py*2+px)*N+n at block (y,x) equals conv0's output at
    pixel (2y+py, 2x+px).  Input channel (qy*2+qx)*C+c is the input pixel
    at phase (qy,qx) of its block.  jit-safe: static slice updates on a
    traced weight tensor (each tap maps to a unique slot — no collisions).
    """
    w0 = jnp.asarray(w0)
    C, N = w0.shape[2], w0.shape[3]
    out = jnp.zeros((3, 3, 4 * C, 4 * N), w0.dtype)
    for py in range(2):
        for px in range(2):
            for di in range(3):
                for dj in range(3):
                    iy = py + di - 1            # input row rel. to block*2
                    ix = px + dj - 1
                    ky = (iy + 2) // 2          # block offset (-1..1) + 1
                    qy = (iy + 2) % 2
                    kx = (ix + 2) // 2
                    qx = (ix + 2) % 2
                    q0 = (qy * 2 + qx) * C
                    p0_ = (py * 2 + px) * N
                    out = out.at[ky, kx, q0:q0 + C, p0_:p0_ + N].add(
                        w0[di, dj])
    return out


def pack_w1(w1):
    """(3,3,N0,N1) -> (2,2,4*N0,N1): stride-2 conv over the packed stem.

    conv1 at block (y,x) reads conv0 pixels (2y+di-1, 2x+dj-1) = packed
    blocks {y-1, y} x {x-1, x}, phase ((di-1) mod 2, (dj-1) mod 2).
    """
    w1 = jnp.asarray(w1)
    N0, N1 = w1.shape[2], w1.shape[3]
    out = jnp.zeros((2, 2, 4 * N0, N1), w1.dtype)
    for di in range(3):
        for dj in range(3):
            ky = 0 if di == 0 else 1
            py = (di - 1) % 2
            kx = 0 if dj == 0 else 1
            px = (dj - 1) % 2
            q0 = (py * 2 + px) * N0
            out = out.at[ky, kx, q0:q0 + N0, :].add(w1[di, dj])
    return out


def space_to_depth(x):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h // 2, w // 2, 4 * c)


def fused_stem(x, p0, p1, l0, l1, *, compute_dtype=None):
    """Run layers 0 and 1 in packed form.  p0/p1 are the (BN-folded) param
    dicts; returns the tensor that layer 2 consumes (= conv1 output after
    its activation)."""
    precision = None if compute_dtype is not None else lax.Precision.HIGHEST
    cd = compute_dtype or jnp.float32

    w0p = jnp.asarray(pack_w0(p0["w"]), cd)
    w1p = jnp.asarray(pack_w1(p1["w"]), cd)
    b0 = jnp.tile(jnp.asarray(p0["b"], jnp.float32), 4)

    xs = space_to_depth(x).astype(cd)
    y0 = lax.conv_general_dilated(
        xs, w0p, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision, preferred_element_type=jnp.float32)
    y0 = y0 + b0
    if compute_dtype is not None:
        y0 = y0.astype(cd)
    y0 = apply_activation(y0, l0.activation)

    y1 = lax.conv_general_dilated(
        y0.astype(cd), w1p, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision, preferred_element_type=jnp.float32)
    y1 = y1 + jnp.asarray(p1["b"], jnp.float32)
    if compute_dtype is not None:
        y1 = y1.astype(cd)
    y1 = apply_activation(y1, l1.activation)
    return y1


def _packed_bn(y, p, phases: int):
    """Live batch norm on a phase-packed tensor (channel = phase*N + n).

    Statistics per logical channel n pool over (B, H, W, phases) — exactly
    the unpacked (B, 2H, 2W) statistics of mean_cpu/variance_cpu
    (blas.c:164-201), Bessel 1/(N-1) included.  Returns (y_norm, stats)."""
    b, h, w, c = y.shape
    n = c // phases
    y4 = y.reshape(b, h, w, phases, n)
    cnt = b * h * w * phases
    mean = jnp.mean(y4, axis=(0, 1, 2, 3))
    sq = jnp.sum(jnp.square(y4 - mean), axis=(0, 1, 2, 3))
    var = sq / max(cnt - 1, 1)
    from darknet_tpu.ops.conv import BN_EPS
    inv_std = lax.rsqrt(var + BN_EPS)
    scales = jnp.asarray(p["scales"], jnp.float32)
    beta = jnp.asarray(p["b"], jnp.float32)
    y4 = (y4 - mean) * inv_std * scales + beta
    return y4.reshape(b, h, w, c), (mean, var)


def fused_stem_train(x, p0, p1, l0, l1, *, compute_dtype=None,
                     res_dtype=None):
    """Training-mode packed stem: layers 0 and 1 in S2D form with LIVE
    batch norm (unfused params), following conv_block's mixed-precision
    conventions (conv emits compute_dtype, BN/bias epilogue in f32, output
    stays f32 in train).  The (B, 608², 32) tensor never exists in the
    forward OR the backward — its dW contraction happens at H/2 on
    MXU-aligned channel counts.

    Returns (y1, bn_stats) with bn_stats = {0: (mean, var), 1: ...} for
    the batch-normalized layers, keyed for the trainer's rolling update
    (forward_batchnorm_layer train path, batchnorm_layer.c)."""
    precision = None if compute_dtype is not None else lax.Precision.HIGHEST
    cd = compute_dtype or jnp.float32
    out_dtype = cd if compute_dtype is not None else jnp.float32

    w0p = pack_w0(jnp.asarray(p0["w"])).astype(cd)
    w1p = pack_w1(jnp.asarray(p1["w"])).astype(cd)
    bn_stats = {}

    # cast BEFORE the S2D transpose: the (608²,3)→(304²,12) interleave is
    # a worst-case TPU relayout (tiny minor dims), so halving the bytes
    # halves its cost; cast-then-rearrange is bit-identical to
    # rearrange-then-cast
    xs = space_to_depth(x.astype(cd))
    y0 = lax.conv_general_dilated(
        xs, w0p, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision, preferred_element_type=out_dtype)
    # act16 fast path (keep_lp): the conv output stays bf16 — the f32
    # (B,304,304,128) tensor (378 MB at b8/608) never exists in HBM; the
    # fused epilogue accumulates stats in f32 and emits bf16 cotangents
    keep_lp = (res_dtype is not None and compute_dtype is not None
               and compute_dtype != jnp.float32)
    if l0.batch_normalize and "scales" in p0:
        if not keep_lp:
            y0 = y0.astype(jnp.float32)
        # fused BN+act epilogue (custom VJP, ops/train_epilogue.py):
        # stores one y_hat residual at res_dtype instead of the f32
        # BN/activation internals — the packed stem tensors are the
        # largest in the net, so their residuals dominated the backward
        from darknet_tpu.ops.train_epilogue import bn_act_train

        y0, bn_stats[0] = bn_act_train(
            l0.activation, 4, res_dtype if keep_lp else None, res_dtype,
            y0,
            jnp.asarray(p0["scales"], jnp.float32),
            jnp.asarray(p0["b"], jnp.float32))
    else:
        y0 = y0.astype(jnp.float32)
        y0 = y0 + jnp.tile(jnp.asarray(p0["b"], jnp.float32), 4)
        y0 = apply_activation(y0, l0.activation)

    y1 = lax.conv_general_dilated(
        y0.astype(cd), w1p, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision, preferred_element_type=out_dtype)
    if l1.batch_normalize and "scales" in p1:
        if not keep_lp:
            y1 = y1.astype(jnp.float32)
        from darknet_tpu.ops.train_epilogue import bn_act_train

        y1, bn_stats[1] = bn_act_train(
            l1.activation, 1, res_dtype if keep_lp else None, res_dtype,
            y1,
            jnp.asarray(p1["scales"], jnp.float32),
            jnp.asarray(p1["b"], jnp.float32))
    else:
        y1 = y1.astype(jnp.float32)
        y1 = y1 + jnp.asarray(p1["b"], jnp.float32)
        y1 = apply_activation(y1, l1.activation)
    return y1, bn_stats
