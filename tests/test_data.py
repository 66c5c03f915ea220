"""Data pipeline tests: label I/O, truth transforms, augmentation geometry,
loader batches (synthetic images on disk)."""

import os

import numpy as np
import pytest

from darknet_tpu.data.augment import (correct_box_annot,
                                      fill_truth_detection,
                                      image_data_augmentation,
                                      load_detection_sample)
from darknet_tpu.data.labels import image_to_label_path, read_box_annot
from darknet_tpu.data.loader import DetectionLoader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic dataset: 4 images with one colored box each + labels."""
    import cv2

    root = tmp_path_factory.mktemp("ds")
    paths = []
    rng = np.random.default_rng(0)
    for i in range(4):
        img = np.full((240, 320, 3), 128, np.uint8)
        x0, y0 = 80 + 10 * i, 60 + 5 * i
        cv2.rectangle(img, (x0, y0), (x0 + 80, y0 + 60), (255, 0, 0), -1)
        p = str(root / f"img{i}.jpg")
        cv2.imwrite(p, img)
        cx, cy = (x0 + 40) / 320, (y0 + 30) / 240
        with open(str(root / f"img{i}.txt"), "w") as f:
            f.write(f"{i % 3} {cx:.6f} {cy:.6f} {80 / 320:.6f} {60 / 240:.6f}\n")
        paths.append(p)
    return paths


def test_label_roundtrip(dataset):
    lp = image_to_label_path(dataset[0])
    ann = read_box_annot(lp)
    assert ann.shape == (1, 5)
    assert ann[0, 0] == 0
    np.testing.assert_allclose(ann[0, 3], 0.25, atol=1e-5)


def test_correct_box_annot_flip():
    ann = np.array([[1, 0.3, 0.4, 0.2, 0.2]], np.float32)
    out = correct_box_annot(ann, 0.0, 0.0, 1.0, 1.0, flip=True)
    np.testing.assert_allclose(out[0, 1], 0.7, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.4, atol=1e-6)


def test_correct_box_annot_drops_out_of_frame():
    ann = np.array([[0, 2.0, 0.5, 0.2, 0.2]], np.float32)
    out = correct_box_annot(ann, 0, 0, 1, 1, 0)
    assert out[0, 1] == 999999


def test_fill_truth_packs_prefix(rng):
    ann = np.array([
        [0, 0.5, 0.5, 0.2, 0.2],
        [7, 0.2, 0.2, 0.1, 0.1],      # class 7 >= classes -> dropped
        [1, 0.8, 0.8, 0.05, 0.05],
    ], np.float32)
    truth, min_wh = fill_truth_detection(
        ann, 4, classes=3, flip=0, dx=0, dy=0, sx=1, sy=1,
        net_w=100, net_h=100, rng=np.random.default_rng(0))
    n_valid = int((truth[:, 2] > 0).sum())
    assert n_valid == 2
    assert truth[n_valid, 0] == 0          # zero-terminated


def test_identity_augmentation_geometry(dataset):
    from darknet_tpu.data.image import load_image_rgb

    img = load_image_rgb(dataset[0])
    oh, ow = img.shape[:2]
    out = image_data_augmentation(img, 160, 120, 0, 0, ow, oh, False,
                                  0.0, 1.0, 1.0, 0, 0, None)
    assert out.shape == (120, 160, 3)
    assert out.dtype == np.float32
    # pure resize: box position preserved
    lp = read_box_annot(image_to_label_path(dataset[0]))
    cx, cy = lp[0, 1], lp[0, 2]
    px, py = int(cx * 160), int(cy * 120)
    # (255,0,0) BGR -> blue ends up in RGB channel 2 after load
    assert out[py, px, 2] > 0.8            # inside the box


def test_loader_batches(dataset):
    loader = DetectionLoader(dataset, w=96, h=96, batch=2, boxes=10,
                             classes=3, threads=2, seed=1)
    try:
        for _ in range(3):
            x, y = loader.next()
            assert x.shape == (2, 96, 96, 3)
            assert y.shape == (2, 10, 5)
            assert np.isfinite(x).all()
            # at least one sample should retain its (large) box
            assert (y[:, :, 2] > 0).any()
    finally:
        loader.close()


def test_loader_mosaic(dataset):
    loader = DetectionLoader(dataset, w=96, h=96, batch=2, boxes=10,
                             classes=3, threads=2, seed=3, mixup=3)
    try:
        got_any = False
        for _ in range(4):
            x, y = loader.next()
            assert x.shape == (2, 96, 96, 3)
            got_any = got_any or (y[:, :, 2] > 0).any()
        assert got_any
    finally:
        loader.close()


def test_letterbox_box_correction():
    from darknet_tpu.data.image import correct_boxes_letterbox

    # 640x480 image into a 416 net: scale=416/640=0.65, nh=312, dy=52/416
    box = np.array([0.5, 0.5, 0.325, 0.325])   # centered, covers 208px net
    out = correct_boxes_letterbox(box, 640, 480, 416, 416)
    np.testing.assert_allclose(out[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[1], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[2], 0.325, atol=1e-6)       # w: nw==net_w
    np.testing.assert_allclose(out[3], 0.325 * 416 / 312, atol=1e-6)
    # a box at the top letterbox edge maps to y=0
    edge = np.array([0.5, 52 / 416, 0.1, 0.1])
    out2 = correct_boxes_letterbox(edge, 640, 480, 416, 416)
    np.testing.assert_allclose(out2[1], 0.0, atol=1e-6)


def test_loader_deterministic_across_thread_counts(dataset):
    """Per-sample seeding makes batches deterministic regardless of the
    worker pool size — the race-safety story replacing the reference's
    hand-rolled mutexes (SURVEY.md §5)."""
    a = DetectionLoader(dataset, w=64, h=64, batch=3, boxes=8, classes=3,
                        threads=1, seed=42)
    b = DetectionLoader(dataset, w=64, h=64, batch=3, boxes=8, classes=3,
                        threads=4, seed=42)
    try:
        for _ in range(3):
            xa, ya = a.next()
            xb, yb = b.next()
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
    finally:
        a.close()
        b.close()


def test_loader_process_workers_identical(dataset):
    """processes=N (spawn-based pool for multi-core hosts — Python threads
    serialize the numpy augmentation on the GIL) must produce bit-identical
    batches to the thread pool: _sample is a pure function of
    (paths, seed, dims, aug config)."""
    a = DetectionLoader(dataset, w=64, h=64, batch=3, boxes=8, classes=3,
                        threads=2, seed=42, mixup=3)
    b = DetectionLoader(dataset, w=64, h=64, batch=3, boxes=8, classes=3,
                        processes=2, seed=42, mixup=3)
    try:
        for _ in range(2):
            xa, ya = a.next()
            xb, yb = b.next()
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
    finally:
        a.close()
        b.close()


def test_hue_shift_scale(dataset):
    """Hue augmentation must shift by a full-scale fraction of dhue
    (reference: 179*dhue on 0..179 hue; float cv2 path: 360*dhue)."""
    import cv2
    from darknet_tpu.data.image import load_image_rgb

    img = np.zeros((8, 8, 3), np.float32)
    img[:] = [1.0, 0.0, 0.0]                   # pure red, hue 0
    out = image_data_augmentation(img, 8, 8, 0, 0, 8, 8, False,
                                  dhue=1.0 / 3.0, dsat=1.0, dexp=1.0,
                                  gaussian_noise=0, blur=0, truth=None)
    # hue shifted by 1/3 of the circle: red -> green
    assert out[4, 4, 1] > 0.9 and out[4, 4, 0] < 0.1


def test_loader_worker_import_chain_is_jax_free():
    """Spawned process-pool workers unpickle `_worker_sample`, importing
    darknet_tpu.data.loader; that chain must never pull in jax (workers
    are numpy+cv2-only — the package __init__ resolves its surface
    lazily, PEP 562).  Run in a fresh interpreter; skip if the host
    site-customization preloads jax for every process (the axon dev box
    does — that masks the property this test guards)."""
    import subprocess
    import sys

    probe = ("import sys; "
             "preloaded = 'jax' in sys.modules; "
             "import darknet_tpu.data.loader; "
             "print('preloaded' if preloaded else "
             "('jax' if 'jax' in sys.modules else 'clean'))")
    out = subprocess.run([sys.executable, "-c", probe],
                         capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    verdict = out.stdout.strip()
    if verdict == "preloaded":
        pytest.skip("host sitecustomize preloads jax in every process")
    assert verdict == "clean", "darknet_tpu.data.loader import pulled in jax"


def test_loader_sustains_chip_train_rate(tmp_path):
    """Input-pipeline feed-rate gate (VERDICT r3 #2; mirrors the
    reference's 6-loader-threads-per-GPU floor, data.cpp:752-774).

    Measures the REAL DetectionLoader at 608 full augmentation
    (mosaic, i.e. 4 decodes + 4 aug passes per sample) on ONE core,
    then asserts a production TPU host — v5e hosts expose ~100 vCPUs;
    we budget at most 16 loader workers per chip — can sustain the
    banked one-chip yolov4-608 training rate.  The per-sample cost
    scales linearly over process workers (bit-identical batches,
    spawn pool); this box may have too few cores to demonstrate the
    scaled rate directly, so the gate is per-core cost x worker
    budget, which also catches any sample-cost regression."""
    import math
    import time

    from darknet_tpu.data.synth import generate

    # banked one-chip train rate: single source of truth in
    # darknet_tpu.banked (updated from each official on-chip bench) —
    # the gate must feed the rate the chip ACTUALLY trains at
    from darknet_tpu.banked import TRAIN_608_IMG_S

    CHIP_IMG_S = TRAIN_608_IMG_S
    WORKER_BUDGET = 16

    files = generate(str(tmp_path / "ds"), n_train=48, n_val=1, seed=99,
                     size_range=((480, 640), (360, 480)))
    loader = DetectionLoader(files["train_paths"], w=608, h=608, batch=4,
                             threads=1, mixup=3, seed=5)
    try:
        loader.next()                       # warm: decoder caches, buffers
        t0 = time.perf_counter()
        n_batches = 6
        for _ in range(n_batches):
            loader.next()
        dt = time.perf_counter() - t0
    finally:
        loader.close()
    per_core_img_s = n_batches * 4 / dt
    needed = math.ceil(CHIP_IMG_S / per_core_img_s)
    print(f"\nloader 608 mosaic: {per_core_img_s:.1f} img/s/core -> "
          f"{needed} workers to sustain {CHIP_IMG_S} img/s")
    assert needed <= WORKER_BUDGET, (
        f"608 mosaic sample cost regressed: {per_core_img_s:.1f} img/s/core "
        f"needs {needed} workers > budget {WORKER_BUDGET}")
