"""Native host-runtime library: exact agreement with the numpy reference
implementation + speed sanity."""

import time

import numpy as np
import pytest

from darknet_tpu.ops import nms as nmslib
from darknet_tpu.utils.native import load, match_dets_native, nms_native


@pytest.fixture(scope="module")
def lib():
    lib = load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_nms_matches_numpy(lib, rng):
    n, c = 300, 20
    boxes = np.stack([
        rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
        rng.uniform(0.05, 0.3, n), rng.uniform(0.05, 0.3, n),
    ], axis=1).astype(np.float32)
    probs = (rng.uniform(0, 1, (n, c)) *
             (rng.uniform(0, 1, (n, c)) > 0.6)).astype(np.float32)
    for kind in ("greedynms", "diounms"):
        want = nmslib.nms_numpy(boxes, probs, 0.45, kind=kind,
                                allow_native=False)
        got = nms_native(boxes, probs, 0.45, kind=kind)
        np.testing.assert_array_equal(got, want)


def test_native_nms_speed(lib, rng):
    n, c = 2000, 80
    boxes = np.stack([
        rng.uniform(0.1, 0.9, n), rng.uniform(0.1, 0.9, n),
        rng.uniform(0.02, 0.2, n), rng.uniform(0.02, 0.2, n),
    ], axis=1).astype(np.float32)
    probs = (rng.uniform(0, 1, (n, c)) *
             (rng.uniform(0, 1, (n, c)) > 0.9)).astype(np.float32)
    # best-of-3: the 1-core CI box runs suites concurrently, a single
    # timing is scheduler noise
    t_native = min(_timed_once(boxes, probs) for _ in range(3))
    # the mAP validator's workload must stay sub-100ms per image
    assert t_native < 0.5


def _timed_once(boxes, probs):
    t0 = time.perf_counter()
    nms_native(boxes, probs, 0.45)
    return time.perf_counter() - t0


def test_native_match_dets(lib, rng):
    dets = np.array([[0.5, 0.5, 0.2, 0.2], [0.8, 0.8, 0.1, 0.1]], np.float32)
    probs = np.array([[0.9, 0.0], [0.0, 0.6]], np.float32)
    gt = np.array([[0, 0.51, 0.5, 0.2, 0.2],    # matches det0/class0
                   [1, 0.2, 0.2, 0.1, 0.1]],    # matches nothing
                  np.float32)
    rows = match_dets_native(dets, probs, gt, 0.5)
    assert rows.shape == (2, 4)
    by_cid = {int(r[1]): r for r in rows}
    assert int(by_cid[0][2]) == 0          # det0 matched gt0
    assert int(by_cid[1][2]) == -1         # det1 unmatched
    assert by_cid[0][3] > 0.5              # recorded IoU of the match
    # one-pass sweep contract (eval/map.py): matching at t=0 yields the
    # same gt_idx, and "matched at t" == best_iou > t
    rows0 = match_dets_native(dets, probs, gt, 0.0)
    by_cid0 = {int(r[1]): r for r in rows0}
    assert int(by_cid0[0][2]) == 0
    assert by_cid0[0][3] == by_cid[0][3]
    assert (by_cid0[0][3] > 0.5) == (int(by_cid[0][2]) > -1)
