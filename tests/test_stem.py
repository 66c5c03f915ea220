"""Space-to-depth stem fusion: exact-math equivalence with the plain path."""

import numpy as np
import pytest

import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.nn.emit import make_forward
from darknet_tpu.ops.stem import stem_pattern

CFG = """[net]
width=64
height=64
channels=3
[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=mish
[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=mish
[convolutional]
batch_normalize=1
filters=64
size=1
activation=leaky
"""


def test_pattern_detection():
    g = build_graph(CFG)
    assert stem_pattern(g)
    from darknet_tpu import model_zoo

    assert stem_pattern(build_graph(model_zoo.yolov4_cfg(608, 608)))
    assert stem_pattern(build_graph(model_zoo.yolov3_cfg(416, 416)))
    # v4-tiny opens with stride 2 — not fusable
    assert not stem_pattern(build_graph(model_zoo.yolov4_tiny_cfg(416, 416)))


def test_fused_stem_matches_plain(rng):
    g = build_graph(CFG)
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=3))
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    plain = make_forward(g, fused_bn=True, stem_s2d=False)
    fused = make_forward(g, fused_bn=True, stem_s2d=True)
    y_plain = np.asarray(plain(params, jnp.asarray(x))["output"])
    y_fused = np.asarray(fused(params, jnp.asarray(x))["output"])
    np.testing.assert_allclose(y_fused, y_plain, rtol=1e-4, atol=1e-5)


def test_fused_stem_yolov4_detections(rng):
    """End-to-end: full yolov4-224 detections identical with/without the
    stem rewrite."""
    from darknet_tpu import model_zoo

    g = build_graph(model_zoo.yolov4_cfg(224, 224))
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=1))
    x = rng.uniform(0, 1, (1, 224, 224, 3)).astype(np.float32)
    plain = make_forward(g, fused_bn=True, stem_s2d=False)
    fused = make_forward(g, fused_bn=True, stem_s2d=True)
    hp = plain(params, jnp.asarray(x))["heads"]
    hf = fused(params, jnp.asarray(x))["heads"]
    for a, b in zip(hp, hf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_packed_region_optin_exact(rng):
    """ops/packed_region (opt-in): exact through the first CSP block."""
    from darknet_tpu import model_zoo

    g = build_graph(model_zoo.yolov4_cfg(224, 224))
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=2))
    x = rng.uniform(0, 1, (1, 224, 224, 3)).astype(np.float32)
    plain = make_forward(g, fused_bn=True, stem_s2d=False)
    packed = make_forward(g, fused_bn=True, stem_s2d=True,
                          pack_first_region=True)
    hp = plain(params, jnp.asarray(x))["heads"]
    hf = packed(params, jnp.asarray(x))["heads"]
    for a, b in zip(hp, hf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5)
