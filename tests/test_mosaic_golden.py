"""Golden test for mosaic composition (use_mixup==3).

Oracle: a literal transcription of the reference's quadrant copy loop and
truth blending (`load_data_detection`, data.cpp:570-626 +
blend_truth_mosaic, data.cpp:315-418) with C integer semantics
(trunc-toward-zero division), run against the product loader's
`_make_batch` on stubbed samples whose ORIGINAL image size differs from
the net size and is non-square — the regime where the `-pleft * w / ow`
shift scaling matters (a plain `-pleft` approximation diverges here).
"""

import numpy as np
import pytest

from darknet_tpu.data.loader import DetectionLoader

NET_W, NET_H = 96, 64          # non-square net
OW, OH = 50, 35                # non-square original image, != net dims
BOXES = 10
BATCH = 3


def _cdiv(a, b):
    """C integer division: truncate toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _stub_sample(seed, w, h):
    """Deterministic fake of load_detection_sample: random image, a few
    boxes, and out-of-image padding metadata in ORIGINAL-image pixels."""
    r = np.random.default_rng(seed)
    img = r.uniform(0, 1, (h, w, 3)).astype(np.float32)
    truth = np.zeros((BOXES, 5), np.float32)
    for t in range(int(r.integers(1, 4))):
        truth[t] = [r.uniform(0.25, 0.75), r.uniform(0.25, 0.75),
                    r.uniform(0.08, 0.3), r.uniform(0.08, 0.3),
                    float(r.integers(0, 3))]
    meta = dict(pleft=int(r.integers(-30, 8)), pright=int(r.integers(-30, 8)),
                ptop=int(r.integers(-20, 6)), pbot=int(r.integers(-20, 6)),
                flip=bool(r.integers(0, 2)), ow=OW, oh=OH)
    return img, truth, meta


def _ref_blend_truth_mosaic(new_truth, old_truth, w, h, cut_x, cut_y,
                            i_mixup, left_shift, right_shift, top_shift,
                            bot_shift):
    """Transcription of blend_truth_mosaic (data.cpp:315-418)."""
    boxes = new_truth.shape[0]
    count_new = 0
    while count_new < boxes and new_truth[count_new, 0]:
        count_new += 1
    new_t = count_new
    for t in range(count_new, boxes):
        if new_t >= boxes:
            break
        new_truth[new_t, 0] = 0
        src = old_truth[t - count_new]
        if not src[0]:
            break
        xb, yb, wb, hb = (float(src[0]), float(src[1]), float(src[2]),
                          float(src[3]))
        if i_mixup == 0:
            xb -= (w - cut_x - right_shift) / w
            yb -= (h - cut_y - bot_shift) / h
        if i_mixup == 1:
            xb += (cut_x - left_shift) / w
            yb -= (h - cut_y - bot_shift) / h
        if i_mixup == 2:
            xb -= (w - cut_x - right_shift) / w
            yb += (cut_y - top_shift) / h
        if i_mixup == 3:
            xb += (cut_x - left_shift) / w
            yb += (cut_y - top_shift) / h
        left = int((xb - wb / 2) * w)
        right = int((xb + wb / 2) * w)
        top = int((yb - hb / 2) * h)
        bot = int((yb + hb / 2) * h)
        if left < 0:
            diff = left / w
            xb -= diff / 2
            wb += diff
        if right > w:
            diff = (right - w) / w
            xb -= diff / 2
            wb -= diff
        if top < 0:
            diff = top / h
            yb -= diff / 2
            hb += diff
        if bot > h:
            diff = (bot - h) / h
            yb -= diff / 2
            hb -= diff
        left = int((xb - wb / 2) * w)
        right = int((xb + wb / 2) * w)
        top = int((yb - hb / 2) * h)
        bot = int((yb + hb / 2) * h)
        if (left >= 0 and right <= w and top >= 0 and bot <= h
                and 0 < wb < 1 and 0 < hb < 1 and 0 < xb < 1 and 0 < yb < 1):
            new_truth[new_t, 0] = xb
            new_truth[new_t, 1] = yb
            new_truth[new_t, 2] = wb
            new_truth[new_t, 3] = hb
            new_truth[new_t, 4] = src[4]
            new_t += 1


def _ref_mosaic_batch(seeds, cut_x, cut_y, w, h):
    """Transcription of the i_mixup==3 branch of load_data_detection
    (data.cpp:562-626), per-row copies included."""
    x = np.zeros((BATCH, h, w, 3), np.float32)
    y = np.zeros((BATCH, BOXES, 5), np.float32)
    for i_mixup in range(4):
        for i in range(BATCH):
            img, truth, meta = _stub_sample(int(seeds[i_mixup, i]), w, h)
            pleft, pright = meta["pleft"], meta["pright"]
            ptop, pbot = meta["ptop"], meta["pbot"]
            ow, oh = meta["ow"], meta["oh"]
            if meta["flip"]:
                pleft, pright = pright, pleft
            cx, cy = int(cut_x[i]), int(cut_y[i])
            left_shift = min(cx, max(0, _cdiv(-pleft * w, ow)))
            top_shift = min(cy, max(0, _cdiv(-ptop * h, oh)))
            right_shift = min(w - cx, max(0, _cdiv(-pright * w, ow)))
            bot_shift = min(h - cy, max(0, _cdiv(-pbot * h, oh)))
            for yy in range(h):
                if i_mixup == 0 and yy < cy:
                    src_y = yy + h - cy - bot_shift
                    src_x = w - cx - right_shift
                    x[i, yy, 0:cx] = img[src_y, src_x:src_x + cx]
                if i_mixup == 1 and yy < cy:
                    src_y = yy + h - cy - bot_shift
                    x[i, yy, cx:w] = img[src_y,
                                         left_shift:left_shift + (w - cx)]
                if i_mixup == 2 and yy >= cy:
                    src_y = top_shift + yy - cy
                    src_x = w - cx - right_shift
                    x[i, yy, 0:cx] = img[src_y, src_x:src_x + cx]
                if i_mixup == 3 and yy >= cy:
                    src_y = top_shift + yy - cy
                    x[i, yy, cx:w] = img[src_y,
                                         left_shift:left_shift + (w - cx)]
            _ref_blend_truth_mosaic(y[i], truth, w, h, cx, cy, i_mixup,
                                    left_shift, right_shift, top_shift,
                                    bot_shift)
    return x, y


def _mosaic_seed():
    """Find a batch seed whose 50%-off draw keeps mosaic ON
    (data.cpp:433-434 analogue in loader._make_batch)."""
    for seed in range(100):
        if np.random.default_rng(seed).integers(0, 2) == 1:
            return seed
    raise AssertionError("unreachable")


@pytest.fixture()
def loader(monkeypatch):
    monkeypatch.setattr(DetectionLoader, "_sample",
                        lambda self, seed, w, h: _stub_sample(seed, w, h))
    ld = DetectionLoader(["dummy.jpg"], w=NET_W, h=NET_H, batch=BATCH,
                         boxes=BOXES, classes=3, threads=2, seed=0, mixup=3)
    yield ld
    ld.close()


def test_mosaic_matches_reference_transcription(loader):
    seed = _mosaic_seed()
    x, y = loader._make_batch(seed, NET_W, NET_H)

    # replicate the loader's rng draws to recover seeds + cut points
    rng = np.random.default_rng(seed)
    assert rng.integers(0, 2) == 1            # mosaic stays on
    seeds = rng.integers(0, 2 ** 31, size=(4, BATCH))
    cut_x = rng.integers(int(NET_W * 0.2), int(NET_W * 0.8), BATCH)
    cut_y = rng.integers(int(NET_H * 0.2), int(NET_H * 0.8), BATCH)

    x_ref, y_ref = _ref_mosaic_batch(seeds, cut_x, cut_y, NET_W, NET_H)
    np.testing.assert_array_equal(x, x_ref)
    np.testing.assert_allclose(y, y_ref, atol=1e-6)
    # the stub guarantees boxes; at least one must survive blending
    assert (y[:, :, 2] > 0).any()


def test_mosaic_shift_scaling_is_exercised(loader):
    """Guard that the chosen metas actually produce nonzero scaled shifts
    (otherwise the golden test wouldn't cover the ow/oh scaling at all)."""
    seed = _mosaic_seed()
    rng = np.random.default_rng(seed)
    rng.integers(0, 2)
    seeds = rng.integers(0, 2 ** 31, size=(4, BATCH))
    nonzero = unscaled_diff = 0
    for i_mixup in range(4):
        for i in range(BATCH):
            _, _, meta = _stub_sample(int(seeds[i_mixup, i]), NET_W, NET_H)
            for p, net_d, od in ((meta["pleft"], NET_W, OW),
                                 (meta["pright"], NET_W, OW),
                                 (meta["ptop"], NET_H, OH),
                                 (meta["pbot"], NET_H, OH)):
                scaled = max(0, _cdiv(-p * net_d, od))
                if scaled:
                    nonzero += 1
                if scaled != max(0, -p):
                    unscaled_diff += 1
    assert nonzero >= 4
    # the scaling must matter for these metas (net dims != original dims)
    assert unscaled_diff >= 4
