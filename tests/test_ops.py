"""Unit tests of compute ops against independent numpy golden models of the
reference semantics (formulas cited in SURVEY.md §2.2/§2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.ops import activations as act
from darknet_tpu.ops import shapes as shapeops
from darknet_tpu.ops.conv import conv_block, darknet_conv_padding, fold_bn
from darknet_tpu.ops.pooling import maxpool


# ---------------------------------------------------------------- activations

def _softplus_ref(x, t=20.0):
    if x > t:
        return x
    if x < -t:
        return np.exp(x)
    return np.log(np.exp(x) + 1)


@pytest.mark.parametrize("name", sorted(
    k for k in act.ACTIVATION_FNS
    if not k.startswith("normalize_channels")))
def test_activation_scalars(name):
    xs = np.array([-25, -5.0, -1.3, -0.2, 0.0, 0.4, 1.7, 6.2, 25.0],
                  dtype=np.float32)

    def ref(x):
        if name == "zero":
            # the reference's generic activate() default (activations.c:137)
            return 0.0
        if name == "linear":
            return x
        if name == "logistic":
            return 1 / (1 + np.exp(-x))
        if name == "loggy":
            return 2 / (1 + np.exp(-x)) - 1
        if name == "relu":
            return x * (x > 0)
        if name == "relu6":
            return min(max(x, 0), 6)
        if name == "elu":
            return (x >= 0) * x + (x < 0) * (np.exp(x) - 1)
        if name == "selu":
            return (x >= 0) * 1.0507 * x + \
                (x < 0) * 1.0507 * 1.6732 * (np.exp(x) - 1)
        if name == "gelu":
            return 0.5 * x * (1 + np.tanh(0.797885 * x + 0.035677 * x ** 3))
        if name == "relie":
            return x if x > 0 else 0.01 * x
        if name == "ramp":
            return x * (x > 0) + 0.1 * x
        if name == "leaky":
            return x if x > 0 else 0.1 * x
        if name == "tanh":
            return np.tanh(x)
        if name == "mish":
            return x * np.tanh(_softplus_ref(x))
        if name == "swish":
            return x / (1 + np.exp(-x))
        if name == "plse":
            if x < -4:
                return 0.01 * (x + 4)
            if x > 4:
                return 0.01 * (x - 4) + 1
            return 0.125 * x + 0.5
        if name == "stair":
            n = int(np.floor(x))
            if n % 2 == 0:
                return np.floor(x / 2)
            return (x - n) + np.floor(x / 2)
        if name == "hardtan":
            return np.clip(x, -1, 1)
        if name == "lhtan":
            if x < 0:
                return 0.001 * x
            if x > 1:
                return 0.001 * (x - 1) + 1
            return x
        raise KeyError(name)

    got = np.asarray(act.ACTIVATION_FNS[name](jnp.asarray(xs)))
    want = np.array([ref(float(x)) for x in xs], dtype=np.float32)
    # f32 transcendental orderings differ slightly (log1p vs log(exp+1))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_norm_chan():
    x = np.random.default_rng(0).normal(size=(2, 3, 3, 8)).astype(np.float32)
    got = np.asarray(act.norm_chan(jnp.asarray(x)))
    pos = np.maximum(x, 0)
    want = pos / (pos.sum(-1, keepdims=True) + 1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_norm_chan_softmax():
    x = np.random.default_rng(0).normal(size=(2, 3, 3, 8)).astype(np.float32)
    got = np.asarray(act.norm_chan_softmax(jnp.asarray(x)))
    e = np.exp(x)
    want = e / (e.sum(-1, keepdims=True) + 1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# -------------------------------------------------------------------- maxpool

def _maxpool_ref(x, size, stride, pad_total):
    """Direct port of the darknet maxpool loop (maxpool_layer.cpp:250-296),
    NHWC input."""
    b, h, w, c = x.shape
    out_h = (h + pad_total - size) // stride + 1
    out_w = (w + pad_total - size) // stride + 1
    off = -pad_total // 2 if pad_total > 0 else 0
    off = -(pad_total // 2)
    out = np.full((b, out_h, out_w, c), -np.inf, dtype=np.float32)
    for i in range(out_h):
        for j in range(out_w):
            for n in range(size):
                for m in range(size):
                    ch = off + i * stride + n
                    cw = off + j * stride + m
                    if 0 <= ch < h and 0 <= cw < w:
                        out[:, i, j, :] = np.maximum(
                            out[:, i, j, :], x[:, ch, cw, :])
    return out


@pytest.mark.parametrize("size,stride,pad", [
    (2, 2, 1), (2, 1, 1), (3, 2, 2), (5, 1, 4), (2, 2, 0), (3, 1, 2),
])
def test_maxpool_matches_reference(rng, size, stride, pad):
    x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)

    class L:  # minimal MaxpoolIR stand-in
        pass

    l = L()
    l.size, l.stride_x, l.stride_y, l.pad = size, stride, stride, pad
    l.h = l.w = 9
    l.maxpool_depth = False
    l.antialiasing = 0
    l.out_h = (9 + pad - size) // stride + 1
    l.out_w = l.out_h
    got = np.asarray(maxpool(jnp.asarray(x), l))
    want = _maxpool_ref(x, size, stride, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("size,pad,hw", [
    (5, 4, 9), (9, 8, 9), (13, 12, 19),   # SPP pools (stride 1)
    (3, 2, 9),
])
def test_maxpool_s1_train_grad_matches_argmax(rng, size, pad, hw):
    """The custom stride-1 VJP (scatter-free, ops/pooling.py) must route
    each window's cotangent to its argmax — the reference backward
    (maxpool_layer.cpp: gradient to the recorded max index)."""
    x = rng.normal(size=(2, hw, hw, 4)).astype(np.float32)

    class L:
        pass

    l = L()
    l.size, l.stride_x, l.stride_y, l.pad = size, 1, 1, pad
    l.h = l.w = hw
    l.maxpool_depth = False
    l.antialiasing = 0
    l.out_h = l.out_w = hw + pad - size + 1
    g = rng.normal(size=(2, l.out_h, l.out_w, 4)).astype(np.float32)

    def f(x):
        return jnp.sum(maxpool(x, l, train=True) * g)

    got = np.asarray(jax.grad(f)(jnp.asarray(x)))

    # argmax reference: route each window's g to the max position
    lo = pad // 2
    want = np.zeros_like(x)
    for i in range(l.out_h):
        for j in range(l.out_w):
            for b in range(2):
                for c in range(4):
                    best, bi, bj = -np.inf, -1, -1
                    for n in range(size):
                        for m in range(size):
                            ch, cw = i - lo + n, j - lo + m
                            if 0 <= ch < hw and 0 <= cw < hw and \
                                    x[b, ch, cw, c] > best:
                                best, bi, bj = x[b, ch, cw, c], ch, cw
                    want[b, bi, bj, c] += g[b, i, j, c]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_maxpool_s1_train_forward_matches_infer(rng):
    x = rng.normal(size=(2, 19, 19, 8)).astype(np.float32)

    class L:
        pass

    l = L()
    l.size, l.stride_x, l.stride_y, l.pad = 13, 1, 1, 12
    l.h = l.w = 19
    l.maxpool_depth = False
    l.antialiasing = 0
    l.out_h = l.out_w = 19
    got = np.asarray(maxpool(jnp.asarray(x), l, train=True))
    want = np.asarray(maxpool(jnp.asarray(x), l, train=False))
    np.testing.assert_array_equal(got, want)


def test_maxpool_depth(rng):
    x = rng.normal(size=(2, 4, 4, 12)).astype(np.float32)

    class L:
        pass

    l = L()
    l.maxpool_depth = True
    l.out_channels = 3
    l.antialiasing = 0
    got = np.asarray(maxpool(jnp.asarray(x), l))
    # channel k contributes to output channel k % out_c
    want = np.full((2, 4, 4, 3), -np.inf, dtype=np.float32)
    for k in range(12):
        want[..., k % 3] = np.maximum(want[..., k % 3], x[..., k])
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ----------------------------------------------------------------------- conv

def _conv_ref_nhwc(x, w, stride, pad, groups=1, dilation=1):
    """Naive conv, darknet padding semantics, NHWC x HWIO."""
    b, h, wd, c = x.shape
    kh, kw, cg, n = w.shape
    out_h = (h + 2 * pad - kh) // stride + 1
    out_w = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((b, out_h, out_w, n), dtype=np.float32)
    npg = n // groups
    for g in range(groups):
        for oc in range(g * npg, (g + 1) * npg):
            for i in range(out_h):
                for j in range(out_w):
                    s = 0.0
                    for di in range(kh):
                        for dj in range(kw):
                            ii = i * stride - pad + di * dilation
                            jj = j * stride - pad + dj * dilation
                            if 0 <= ii < h and 0 <= jj < wd:
                                for ic in range(cg):
                                    s += x[:, ii, jj, g * cg + ic] * \
                                        w[di, dj, ic, oc]
                                    continue
                    out[:, i, j, oc] = out[:, i, j, oc] + s
    return out


def _conv_ref_vec(x, w, stride, pad, groups=1, dilation=1):
    b, h, wd, c = x.shape
    kh, kw, cg, n = w.shape
    out_h = (h + 2 * pad - kh) // stride + 1
    out_w = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((b, out_h, out_w, n), dtype=np.float32)
    npg = n // groups
    xp = np.pad(x, ((0, 0), (pad, pad + kh * dilation), (pad, pad + kw * dilation), (0, 0)))
    for i in range(out_h):
        for j in range(out_w):
            for di in range(kh):
                for dj in range(kw):
                    patch = xp[:, i * stride + di * dilation,
                               j * stride + dj * dilation, :]
                    for g in range(groups):
                        seg = patch[:, g * cg:(g + 1) * cg]
                        out[:, i, j, g * npg:(g + 1) * npg] += \
                            seg @ w[di, dj, :, g * npg:(g + 1) * npg]
    return out


@pytest.mark.parametrize("stride,pad,size,groups", [
    (1, 1, 3, 1), (2, 1, 3, 1), (1, 0, 1, 1), (1, 1, 3, 2), (2, 0, 2, 1),
])
def test_conv_block_matches_naive(rng, stride, pad, size, groups):
    text = f"""[net]
width=8
height=8
channels=4
[convolutional]
filters=6
size={size}
stride={stride}
{'pad=1' if pad else 'padding=0'}
groups={groups}
activation=linear
"""
    g = build_graph(text)
    l = g.layers[0]
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(size, size, 4 // groups, 6)).astype(np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    got, _ = conv_block(jnp.asarray(x), {"w": jnp.asarray(w),
                                         "b": jnp.asarray(b)}, l)
    want = _conv_ref_vec(x, w, stride, l.pad, groups=groups) + b
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_bn_inference_and_fold_agree(rng):
    text = """[net]
width=8
height=8
channels=4
[convolutional]
batch_normalize=1
filters=6
size=3
pad=1
activation=leaky
"""
    g = build_graph(text)
    l = g.layers[0]
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    p = {
        "w": rng.normal(size=(3, 3, 4, 6)).astype(np.float32),
        "b": rng.normal(size=(6,)).astype(np.float32),
        "scales": rng.uniform(0.5, 1.5, size=(6,)).astype(np.float32),
        "mean": rng.normal(size=(6,)).astype(np.float32),
        "var": rng.uniform(0.1, 2.0, size=(6,)).astype(np.float32),
    }
    p = {k: jnp.asarray(v) for k, v in p.items()}
    unfused, _ = conv_block(jnp.asarray(x), p, l)

    import dataclasses
    w2, b2 = fold_bn(p["w"], p["b"], p["scales"], p["mean"], p["var"])
    l2 = dataclasses.replace(l, batch_normalize=False)
    fused, _ = conv_block(jnp.asarray(x), {"w": w2, "b": b2}, l2)
    np.testing.assert_allclose(np.asarray(unfused), np.asarray(fused),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------- reorg

def _reorg_cpu_ref(x_chw_flat, out_w, out_h, out_c, stride, forward):
    """Literal port of blas.c reorg_cpu (blas.c:12-44), single batch."""
    out = np.zeros_like(x_chw_flat)
    in_c = out_c // (stride * stride)
    for k in range(out_c):
        for j in range(out_h):
            for i in range(out_w):
                in_index = i + out_w * (j + out_h * k)
                c2 = k % in_c
                offset = k // in_c
                w2 = i * stride + offset % stride
                h2 = j * stride + offset // stride
                out_index = w2 + out_w * stride * (h2 + out_h * stride * c2)
                if forward:
                    out[out_index] = x_chw_flat[in_index]
                else:
                    out[in_index] = x_chw_flat[out_index]
    return out


def test_reorg3d_forward(rng):
    h = w = 4
    c = 2
    s = 2
    x = rng.normal(size=(1, h, w, c)).astype(np.float32)
    got = np.asarray(shapeops.reorg3d(jnp.asarray(x), s))
    # reference: ForwardReorgLayer non-reverse calls
    # reorg_cpu(in, out_w, out_h, out_c, stride, forward=0)
    x_chw = np.transpose(x[0], (2, 0, 1)).ravel()
    out_flat = _reorg_cpu_ref(x_chw, w // s, h // s, c * s * s, s, forward=0)
    want = out_flat.reshape(c * s * s, h // s, w // s)
    want = np.transpose(want, (1, 2, 0))[None]
    np.testing.assert_allclose(got, want)


def test_reorg_old_forward(rng):
    h = w = 4
    c = 4
    s = 2
    x = rng.normal(size=(1, h, w, c)).astype(np.float32)
    got = np.asarray(shapeops.reorg_old(jnp.asarray(x), s))
    # reference: ForwardReorgOldLayer non-reverse calls
    # reorg_cpu(in, w, h, c, stride, forward=0) with INPUT dims
    x_chw = np.transpose(x[0], (2, 0, 1)).ravel()
    out_flat = _reorg_cpu_ref(x_chw, w, h, c, s, forward=0)
    want = out_flat.reshape(c * s * s, h // s, w // s)
    want = np.transpose(want, (1, 2, 0))[None]
    np.testing.assert_allclose(got, want)


# ------------------------------------------------------------------ upsample

def test_upsample(rng):
    x = rng.normal(size=(1, 3, 3, 2)).astype(np.float32)
    y = np.asarray(shapeops.upsample(jnp.asarray(x), 2, scale=2.0))
    assert y.shape == (1, 6, 6, 2)
    np.testing.assert_allclose(y[0, 0, 0], 2 * x[0, 0, 0])
    np.testing.assert_allclose(y[0, 1, 1], 2 * x[0, 0, 0])
    np.testing.assert_allclose(y[0, 4, 5], 2 * x[0, 2, 2])


# --------------------------------------------------------------------- route

def test_route_groups_slice(rng):
    a = rng.normal(size=(1, 2, 2, 8)).astype(np.float32)
    y = np.asarray(shapeops.route([jnp.asarray(a)], groups=2, group_id=1))
    np.testing.assert_allclose(y, a[..., 4:])


def test_dropout_scaling(rng):
    import jax

    x = jnp.ones((1, 32, 32, 8))
    y = shapeops.dropout(x, jax.random.PRNGKey(0), 0.5)
    y = np.asarray(y)
    kept = y[y > 0]
    np.testing.assert_allclose(kept, 2.0)      # 1/(1-p) scaling
    assert 0.3 < (y > 0).mean() < 0.7


# ----------------------------------------------------- shortcut channel prefix

def _gpu_shortcut_kernel_np(in_chw, add_chw):
    """Numpy emulation of the reference's GPU shortcut
    (blas_kernels.cu:941-965 shortcut_singlelayer_simple_kernel): per
    batch, out[flat] = in[flat] + (add[flat] if flat < add_size) over
    flat CHW indices."""
    b = in_chw.shape[0]
    out = in_chw.reshape(b, -1).copy()
    add = add_chw.reshape(b, -1)
    n = min(out.shape[1], add.shape[1])
    out[:, :n] += add[:, :n]
    return out.reshape(in_chw.shape)


@pytest.mark.parametrize("c_in,c_from", [(8, 3), (3, 8), (5, 5)])
def test_shortcut_channel_prefix_matches_gpu_kernel(rng, c_in, c_from):
    # PARITY.md DEVIATIONS #16: channel mismatch = flat-prefix add on the
    # reference's GPU build (its CPU build emits stale memory).  With
    # equal H/W the CHW flat prefix is exactly a channel prefix.
    x = rng.standard_normal((2, 4, 6, c_in)).astype(np.float32)
    f = rng.standard_normal((2, 4, 6, c_from)).astype(np.float32)
    ours = np.asarray(shapeops.shortcut(jnp.asarray(x), jnp.asarray(f)))

    # reference kernel operates in CHW layout
    ref_chw = _gpu_shortcut_kernel_np(
        x.transpose(0, 3, 1, 2), f.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_chw.transpose(0, 2, 3, 1), rtol=0,
                               atol=0)


def test_shortcut_channel_prefix_gradients(rng):
    # gradient flows only through the added prefix (backward kernel
    # guards identically, blas_kernels.cu:980-1004)
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 4)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((1, 2, 2, 2)).astype(np.float32))
    gx, gf = jax.grad(
        lambda a, b: jnp.sum(shapeops.shortcut(a, b) * 2.0), (0, 1))(x, f)
    np.testing.assert_allclose(np.asarray(gx), 2.0)   # passthrough everywhere
    np.testing.assert_allclose(np.asarray(gf), 2.0)   # prefix receives all
