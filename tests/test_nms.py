"""NMS tests: host implementation behaviour + device/host agreement."""

import numpy as np

import jax.numpy as jnp

from darknet_tpu.ops import nms as nmslib


def test_greedy_nms_suppresses_overlap():
    boxes = np.array([
        [0.5, 0.5, 0.2, 0.2],
        [0.51, 0.5, 0.2, 0.2],     # heavy overlap with 0
        [0.9, 0.9, 0.1, 0.1],      # far away
    ], dtype=np.float32)
    probs = np.array([[0.9], [0.8], [0.7]], dtype=np.float32)
    out = nmslib.nms_numpy(boxes, probs, 0.45)
    assert out[0, 0] == 0.9
    assert out[1, 0] == 0.0
    assert out[2, 0] == 0.7


def test_nms_per_class_independent():
    boxes = np.array([
        [0.5, 0.5, 0.2, 0.2],
        [0.51, 0.5, 0.2, 0.2],
    ], dtype=np.float32)
    probs = np.array([[0.9, 0.0], [0.0, 0.8]], dtype=np.float32)
    out = nmslib.nms_numpy(boxes, probs, 0.45)
    # different classes never suppress each other
    assert out[0, 0] == 0.9 and out[1, 1] == 0.8


def test_suppressed_does_not_suppress():
    # chain: A > B > C; B overlaps A (dies), C overlaps B but not A -> C lives
    boxes = np.array([
        [0.30, 0.5, 0.20, 0.2],
        [0.40, 0.5, 0.20, 0.2],
        [0.52, 0.5, 0.20, 0.2],
    ], dtype=np.float32)
    probs = np.array([[0.9], [0.8], [0.7]], dtype=np.float32)
    out = nmslib.nms_numpy(boxes, probs, 0.3)
    assert out[0, 0] == 0.9
    assert out[1, 0] == 0.0
    assert out[2, 0] == 0.7


def test_device_matches_numpy(rng):
    n, c = 64, 5
    boxes = np.stack([
        rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
        rng.uniform(0.05, 0.3, n), rng.uniform(0.05, 0.3, n),
    ], axis=1).astype(np.float32)
    probs = (rng.uniform(0, 1, (n, c)) *
             (rng.uniform(0, 1, (n, c)) > 0.5)).astype(np.float32)
    for kind in ("greedynms", "diounms"):
        want = nmslib.nms_numpy(boxes, probs, 0.45, kind=kind, beta=0.6)
        got = np.asarray(nmslib.nms_device(
            jnp.asarray(boxes), jnp.asarray(probs), 0.45, kind=kind,
            beta=0.6))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_diou_nms_beta():
    boxes = np.array([
        [0.5, 0.5, 0.2, 0.2],
        [0.62, 0.5, 0.2, 0.2],
    ], dtype=np.float32)
    probs = np.array([[0.9], [0.8]], dtype=np.float32)
    greedy = nmslib.nms_numpy(boxes, probs, 0.25, kind="greedynms")
    diou = nmslib.nms_numpy(boxes, probs, 0.25, kind="diounms", beta=0.6)
    # DIoU similarity = IoU - center-distance term <= IoU, so DIoU NMS is
    # less aggressive for displaced boxes
    assert greedy[1, 0] == 0.0
    assert diou[1, 0] == 0.8


def test_device_nms_deep_suppression_chain():
    """Worst case for the fixpoint NMS: a ladder of boxes where each
    overlaps only its neighbors — alternating keep/suppress, maximum
    dependency chain depth.  Must still equal the serial greedy result."""
    n = 48
    xs = 0.1 + 0.015 * np.arange(n)           # neighbors overlap > 0.45 IoU
    boxes = np.stack([xs, np.full(n, 0.5), np.full(n, 0.1),
                      np.full(n, 0.1)], axis=1).astype(np.float32)
    probs = np.linspace(0.9, 0.1, n).astype(np.float32)[:, None]
    want = nmslib.nms_numpy(boxes, probs, 0.45)
    got = np.asarray(nmslib.nms_device(jnp.asarray(boxes),
                                       jnp.asarray(probs), 0.45))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    # the ladder alternates: every other box survives
    assert (want[:, 0] > 0).sum() >= n // 3


def test_device_nms_reverse_rank_chain():
    """Chain where ranks ascend against position (suppressors appear
    later in array order) — exercises the argsort reordering."""
    rng2 = np.random.default_rng(11)
    n = 40
    xs = 0.1 + 0.016 * np.arange(n)
    boxes = np.stack([xs, np.full(n, 0.5), np.full(n, 0.1),
                      np.full(n, 0.1)], axis=1).astype(np.float32)
    probs = np.linspace(0.1, 0.9, n).astype(np.float32)[:, None]  # ascending
    perm = rng2.permutation(n)
    want = nmslib.nms_numpy(boxes[perm], probs[perm], 0.45)
    got = np.asarray(nmslib.nms_device(jnp.asarray(boxes[perm]),
                                       jnp.asarray(probs[perm]), 0.45))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_device_nms_impls_agree():
    """fused (in-body predicate) and dense (materialized (C,N,N)) device
    NMS are the same math — exact agreement on random multi-class
    inputs with ties."""
    rng3 = np.random.default_rng(21)
    n, c = 64, 7
    boxes = np.stack([rng3.uniform(0.1, 0.9, n), rng3.uniform(0.1, 0.9, n),
                      rng3.uniform(0.05, 0.3, n),
                      rng3.uniform(0.05, 0.3, n)], axis=1).astype(np.float32)
    probs = np.round(rng3.uniform(0, 1, (n, c)), 1).astype(np.float32)  # ties
    probs[rng3.uniform(size=(n, c)) < 0.3] = 0.0
    for kind in ("greedynms", "diounms"):
        a = np.asarray(nmslib.nms_device(jnp.asarray(boxes),
                                         jnp.asarray(probs), 0.45,
                                         kind=kind, impl="fused"))
        b = np.asarray(nmslib.nms_device(jnp.asarray(boxes),
                                         jnp.asarray(probs), 0.45,
                                         kind=kind, impl="dense"))
        np.testing.assert_array_equal(a, b)
        want = nmslib.nms_numpy(boxes, probs.copy(), 0.45, kind=kind)
        np.testing.assert_allclose(a, want, rtol=1e-6, atol=1e-8)
