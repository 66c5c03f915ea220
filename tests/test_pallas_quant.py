"""Pallas int8 quantized matmul: quantization-error-bounded agreement with
f32, exact agreement with a numpy int8 reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from darknet_tpu.ops.pallas.quant_matmul import (int8_matmul,
                                                 quantize_activations_int8,
                                                 quantize_weights_int8,
                                                 quantized_conv1x1)


def test_weight_quantization_roundtrip(rng):
    w = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    q, scales = quantize_weights_int8(w)
    assert q.dtype == np.int8
    deq = q.astype(np.float32) * scales
    err = np.abs(deq - w).max()
    assert err <= np.abs(w).max() / 127.0 + 1e-6


def test_int8_matmul_matches_numpy(rng):
    m, k, n = 64, 96, 48
    a = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32)

    wq, wscales = quantize_weights_int8(w)
    aq, ascale = quantize_activations_int8(jnp.asarray(a))

    got = int8_matmul(aq, jnp.asarray(wq), jnp.asarray(wscales),
                      jnp.asarray(bias), ascale, interpret=True)
    # exact int32 accumulate reference
    ref = (np.asarray(aq).astype(np.int32) @ wq.astype(np.int32)
           ).astype(np.float32) * (float(ascale) * wscales)[None, :] + bias
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-5)
    # and close to the f32 matmul within quantization error
    f32 = a @ w + bias
    denom = np.abs(f32).max()
    assert np.abs(np.asarray(got) - f32).max() / denom < 0.05


def test_int8_matmul_padding(rng):
    # non-multiple-of-tile shapes exercise the pad/crop path
    m, k, n = 100, 64, 70
    a = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    wq, ws = quantize_weights_int8(w)
    aq, asc = quantize_activations_int8(jnp.asarray(a))
    got = int8_matmul(aq, jnp.asarray(wq), jnp.asarray(ws),
                      jnp.zeros(n, np.float32), asc, tm=64, tn=64,
                      interpret=True)
    ref = (np.asarray(aq).astype(np.int32) @ wq.astype(np.int32)
           ).astype(np.float32) * (float(asc) * ws)[None, :]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-5)


def test_quantized_conv1x1_with_leaky(rng):
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    w = rng.normal(size=(1, 1, 32, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    wq, ws = quantize_weights_int8(w)
    y = quantized_conv1x1(jnp.asarray(x), wq, ws, b, leaky=True,
                          interpret=True)
    assert y.shape == (2, 8, 8, 16)
    f32 = np.einsum("bhwc,cn->bhwn", x, w[0, 0]) + b
    f32 = np.where(f32 > 0, f32, 0.1 * f32)
    denom = np.abs(f32).max()
    assert np.abs(np.asarray(y) - f32).max() / denom < 0.06
