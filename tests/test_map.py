"""mAP validator (eval/map.py) — PR/AP math against hand-computed values,
threaded prefetch pipeline end-to-end on a synthetic dataset, and the
round-1 VERDICT weak items: loader cutmix guard and -show_imgs dumps."""

import os

import numpy as np
import pytest

from darknet_tpu.eval.map import MapResult, _pr_from_valboxes, \
    validate_detector
from darknet_tpu.nn.network import Detection


def test_pr_math_hand_computed():
    """2 classes, 3 GT total (2 of class 0, 1 of class 1).

    Confidence order: [TP c0 .9, FP c0 .8, TP c1 .7, TP c0 .6 dup-GT].
    The duplicate-GT match counts as FP (unique-GT logic,
    detector.cpp:470-489).
    """
    val_boxes = [
        (0.9, 0, True, 0),     # claims GT 0
        (0.8, 0, False, -1),   # FP
        (0.7, 1, True, 2),     # claims GT 2
        (0.6, 0, True, 0),     # duplicate GT 0 -> FP
    ]
    num_gt_class = np.array([2, 1], np.int64)
    r = _pr_from_valboxes(val_boxes, num_gt_class, 3, 2, 1.0, 4)
    # REFERENCE QUIRK (detector.cpp:533-542): the reverse AP loop seeds
    # delta_recall at 0, so recall mass present from the very first rank
    # is dropped.  Class 0's recall is 0.5 at EVERY rank (the only TP is
    # rank 0) -> all deltas 0 -> AP = 0, NOT the textbook 0.5.
    # Class 1's recall steps 0 -> 1 at rank 2 -> AP = 1.0.
    np.testing.assert_allclose(r.per_class_ap, [0.0, 1.0], atol=1e-9)
    assert abs(r.map - 0.5) < 1e-9


class _StubNet:
    """detect_batch returns canned detections keyed by image mean value."""

    class _N:
        w = 32
        h = 32

    net = _N()

    def __init__(self, classes):
        self.classes = classes
        self.batches = []

    def detect_batch(self, x, thresh=0.005, nms=0.45):
        self.batches.append(x.shape)
        out = []
        for i in range(x.shape[0]):
            # brightness encodes the image index; perfect box for each
            probs = np.zeros(self.classes, np.float32)
            probs[0] = 0.9
            out.append([Detection(bbox=(0.5, 0.5, 0.25, 0.25),
                                  objectness=0.9, prob=probs)])
        return out


@pytest.fixture
def dataset(tmp_path):
    import cv2

    paths = []
    for i in range(5):
        img = np.full((40, 40, 3), 40 * i, np.uint8)
        p = tmp_path / f"im{i}.jpg"
        cv2.imwrite(str(p), img)
        with open(tmp_path / f"im{i}.txt", "w") as f:
            f.write("0 0.5 0.5 0.25 0.25\n")
        paths.append(str(p))
    return paths


def test_validate_detector_threaded(dataset):
    net = _StubNet(classes=2)
    r = validate_detector(net, dataset, classes=2, batch=2, progress=False,
                          threads=3)
    assert isinstance(r, MapResult)
    # 5 perfect TPs, recall steps .2,.4,...,1.0; the reference AP loop
    # drops the first segment [0,.2] (detector.cpp:533-542) -> AP = 0.8
    assert abs(r.per_class_ap[0] - 0.8) < 1e-9
    assert r.n_gt == 5
    # ragged last chunk padded to the same executable shape
    assert all(s[0] == 2 for s in net.batches)


def test_loader_cutmix_guard(tmp_path):
    from darknet_tpu.data.loader import DetectionLoader

    with pytest.raises(ValueError, match="cutmix"):
        DetectionLoader([str(tmp_path / "x.jpg")], w=32, h=32, batch=1,
                        mixup=2)
    with pytest.warns(UserWarning, match="mosaic"):
        ld = DetectionLoader([str(tmp_path / "x.jpg")], w=32, h=32,
                             batch=1, mixup=4)
    assert ld.mixup == 3


def test_loader_show_imgs(dataset, tmp_path):
    from darknet_tpu.data.loader import DetectionLoader

    out = tmp_path / "dump"
    out.mkdir()
    ld = DetectionLoader(dataset, w=32, h=32, batch=2, classes=2,
                         threads=2, show_imgs=2, show_imgs_dir=str(out))
    ld.next()
    ld.next()
    ld.close()
    # dumps happen at batch BUILD time (the loader prefetches), so a
    # third batch may already have been assembled: >= 2 batches' worth
    dumps = sorted(os.listdir(out))
    assert len(dumps) >= 4 and dumps[0] == "aug_00001.jpg"


def test_loader_bad_list(tmp_path):
    """Corrupt images are logged to bad.list (data.cpp:87-89) and replaced
    with zero samples instead of crashing the pool."""
    from darknet_tpu.data.loader import DetectionLoader

    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"not an image")
    ld = DetectionLoader([str(bad)], w=32, h=32, batch=2, classes=2,
                         threads=2, show_imgs_dir=str(tmp_path))
    x, y = ld.next()
    assert x.shape == (2, 32, 32, 3) and not x.any()
    ld.close()
    logged = (tmp_path / "bad.list").read_text().splitlines()
    assert str(bad) in logged


def test_cli_valid_mode(dataset, tmp_path, capsys):
    """-mode valid end to end: metadata, threaded validator, darknet
    resize, report format (detector.cpp:552-559)."""
    import cv2  # noqa: F401  (dataset fixture needs it anyway)

    from darknet_tpu.apps.cli import main

    lst = tmp_path / "valid.txt"
    lst.write_text("\n".join(dataset) + "\n")
    names = tmp_path / "names.txt"
    names.write_text("a\nb\n")
    data = tmp_path / "d.data"
    data.write_text(f"classes=2\nvalid={lst}\nnames={names}\n")
    cfg = tmp_path / "m.cfg"
    cfg.write_text("""[net]
batch=1
subdivisions=1
width=32
height=32
channels=3
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=21
size=1
activation=linear
[yolo]
mask=0,1,2
num=3
classes=2
anchors=8,8, 12,12, 16,16
""")
    main(["-mode", "valid", "-data_file", str(data),
          "-model_file", str(cfg), "-weights_file", "/nonexistent"])
    out = capsys.readouterr().out
    assert "mAP@0.5" in out and "Prediction per second" in out
    # int8 serving flags: dynamic and static-calibrated paths both run
    # (this cfg has no >=128ch convs, so calibration is a graceful no-op;
    # the flag plumbing itself is what's under test)
    main(["-mode", "valid", "-data_file", str(data),
          "-model_file", str(cfg), "-weights_file", "/nonexistent",
          "-int8", "-int8_calib", "2"])
    out = capsys.readouterr().out
    assert "mAP@0.5" in out
    # multi-chip valid: -num_chips shards the forward batch over a dp
    # mesh; report and mAP math unchanged
    main(["-mode", "valid", "-data_file", str(data),
          "-model_file", str(cfg), "-weights_file", "/nonexistent",
          "-num_chips", "4"])
    out = capsys.readouterr().out
    assert "mAP@0.5" in out


def test_validate_detector_mesh_matches_single(dataset):
    """Multi-chip valid mode: the batch-sharded forward (mesh=) produces
    the same mAP as the single-device path — decode/NMS/PR all on host,
    only the conv forward shards."""
    from darknet_tpu import model_zoo
    from darknet_tpu.nn.network import Network
    from darknet_tpu.parallel import make_mesh

    cfg = model_zoo.yolov3_tiny_cfg(64, 64, classes=2)
    net = Network.from_cfg(cfg, seed=11)
    r1 = validate_detector(net, dataset, classes=2, batch=4, thresh=0.1,
                           progress=False, threads=2)
    rm = validate_detector(net, dataset, classes=2, batch=4, thresh=0.1,
                           progress=False, threads=2, mesh=make_mesh(4))
    assert rm.n_gt == r1.n_gt
    assert rm.n_pred == r1.n_pred and r1.n_pred > 0
    np.testing.assert_allclose(rm.per_class_ap, r1.per_class_ap,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(rm.map, r1.map, rtol=1e-5, atol=1e-7)

    # and the raw detection stream agrees (mAP alone is 0 with random
    # weights, which would pass vacuously)
    from darknet_tpu.data.image import load_image_rgb, resize_image_cv
    x = np.stack([resize_image_cv(load_image_rgb(pth), 64, 64)
                  for pth in dataset[:4]])
    d1 = net.detect_batch(x, thresh=0.1, nms=0.45)
    dm = net.detect_batch(x, thresh=0.1, nms=0.45, mesh=make_mesh(4))
    assert [len(a) for a in d1] == [len(a) for a in dm]
    for a, b in zip(d1[0], dm[0]):
        np.testing.assert_allclose(a.prob, b.prob, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(a.bbox, b.bbox, rtol=1e-5, atol=1e-7)


def test_multi_iou_sweep(dataset):
    """COCO-style AP@[.5:.95] from one prediction pass: the headline
    fields stay reference-exact at iou_thresh, map_by_iou carries the
    sweep (monotone non-increasing for a fixed det set), and the 0.5
    entry equals the single-threshold run exactly."""
    from darknet_tpu.eval.map import COCO_IOUS

    class _Shifted(_StubNet):
        # det shifted by 0.06 in x: IoU vs the (0.5,0.5,0.25,0.25) GT is
        # (0.19*0.25)/(2*0.0625-0.19*0.25) ≈ 0.61 — a TP at t<=0.60,
        # an FP above
        def detect_batch(self, x, thresh=0.005, nms=0.45):
            out = super().detect_batch(x, thresh, nms)
            return [[Detection(bbox=(0.56, 0.5, 0.25, 0.25),
                               objectness=d[0].objectness,
                               prob=d[0].prob)] for d in out]

    single = validate_detector(_Shifted(classes=2), dataset, classes=2,
                               batch=2, progress=False)
    multi = validate_detector(_Shifted(classes=2), dataset, classes=2,
                              batch=2, progress=False,
                              iou_thresholds=COCO_IOUS)
    assert single.map_by_iou is None and single.map_mean_iou is None
    assert multi.map == single.map                      # headline unchanged
    assert multi.map_by_iou[0.5] == single.map
    vals = [multi.map_by_iou[t] for t in sorted(multi.map_by_iou)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))  # monotone in IoU
    # IoU of the shifted det is ~0.613: TP at t<=0.60 (class-0 AP 0.8,
    # mean over 2 classes 0.4), FP above
    assert abs(vals[0] - 0.4) < 1e-9
    assert vals[-1] == 0.0
    assert abs(multi.map_mean_iou - np.mean(vals)) < 1e-12


def test_multi_iou_mean_excludes_headline(dataset):
    """map_mean_iou averages exactly iou_thresholds — a non-member
    headline iou_thresh must not leak into the sweep mean; duplicates in
    the sweep must not double-count."""
    net = _StubNet(classes=2)
    r = validate_detector(net, dataset, classes=2, batch=2, progress=False,
                          iou_thresh=0.45, iou_thresholds=[0.75, 0.75, 0.9])
    assert set(r.map_by_iou) == {0.75, 0.9}
    assert abs(r.map_mean_iou
               - np.mean([r.map_by_iou[0.75], r.map_by_iou[0.9]])) < 1e-12
    # perfect-box stub: every threshold yields the same AP; a
    # double-counted duplicate would reclassify TPs as FPs and change it
    r2 = validate_detector(net, dataset, classes=2, batch=2, progress=False,
                           iou_thresholds=[0.75])
    assert r.map_by_iou[0.75] == r2.map_by_iou[0.75]
