"""End-to-end Network tests on yolov3-tiny (random weights): shapes,
save/load determinism, BN-fold equivalence, detection pipeline."""

import os

import numpy as np
import pytest

from darknet_tpu.nn.network import Network, detections_to_json


@pytest.fixture(scope="module")
def tiny_cfg():
    return os.path.join(os.path.dirname(__file__), "fixtures",
                        "yolov3-tiny.cfg")


def test_forward_shapes(tiny_cfg, rng):
    net = Network.from_cfg(tiny_cfg, fuse=False)
    x = rng.uniform(0, 1, (1, 416, 416, 3)).astype(np.float32)
    heads, dec = net.forward_heads(x)
    assert len(heads) == 2
    assert heads[0].shape == (1, 13, 13, 255)
    assert heads[1].shape == (1, 26, 26, 255)
    boxes, obj, cls, uc = dec
    n_total = (13 * 13 + 26 * 26) * 3
    assert boxes.shape == (1, n_total, 4)
    assert obj.shape == (1, n_total)
    assert cls.shape == (1, n_total, 80)


def test_fused_equals_unfused(tiny_cfg, tmp_path, rng):
    x = rng.uniform(0, 1, (1, 416, 416, 3)).astype(np.float32)
    net_a = Network.from_cfg(tiny_cfg, fuse=False, seed=5)
    net_a.save_weights(tmp_path / "t.weights")
    net_b = Network.from_cfg(tiny_cfg, weights=tmp_path / "t.weights",
                             fuse=True, seed=5)
    ha, _ = net_a.forward_heads(x)
    hb, _ = net_b.forward_heads(x)
    for a, b in zip(ha, hb):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_save_load_roundtrip_detections(tiny_cfg, tmp_path, rng):
    x = rng.uniform(0, 1, (1, 416, 416, 3)).astype(np.float32)
    net = Network.from_cfg(tiny_cfg, fuse=False, seed=5)
    net.seen = 999
    net.save_weights(tmp_path / "t.weights")
    net2 = Network.from_cfg(tiny_cfg, weights=tmp_path / "t.weights",
                            fuse=False)
    assert net2.seen == 999
    np.testing.assert_allclose(net.predict(x), net2.predict(x),
                               rtol=1e-6, atol=1e-7)


def test_detect_pipeline(tiny_cfg, rng):
    net = Network.from_cfg(tiny_cfg, seed=5)
    x = rng.uniform(0, 1, (416, 416, 3)).astype(np.float32)
    # random weights: sigmoid outputs hover around 0.5, so a low threshold
    # yields detections and exercises NMS
    dets = net.detect(x, thresh=0.3, nms=0.45)
    assert isinstance(dets, list)
    for d in dets:
        assert len(d.bbox) == 4
        assert d.prob.shape == (80,)
        assert 0 <= d.best_class < 80
    js = detections_to_json(dets, frame_id=3)
    assert '"frame_id": 3' in js


def test_batch_detect(tiny_cfg, rng):
    net = Network.from_cfg(tiny_cfg, seed=5)
    x = rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32)
    res = net.detect_batch(x, thresh=0.3)
    assert len(res) == 2
