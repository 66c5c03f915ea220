"""Device-postprocess path vs host path agreement on yolov3-tiny."""

import os

import numpy as np
import pytest

from darknet_tpu.nn.network import Network


def test_device_matches_host_path(rng):
    cfg = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov3-tiny.cfg")
    net = Network.from_cfg(cfg, seed=5)
    x = rng.uniform(0, 1, (1, 416, 416, 3)).astype(np.float32)

    host = net.detect_batch(x, thresh=0.3, nms=0.45)[0]
    dev = net.detect_batch_device(x, thresh=0.3, nms=0.45, top_k=256)[0]

    # same surviving detections (device is top-k limited; with random
    # weights at 0.3 the count is far below 256)
    def keyset(dets):
        return {(round(d.bbox[0], 4), round(d.bbox[1], 4),
                 int(np.argmax(d.prob))) for d in dets}

    assert len(dev) == len(host)
    assert keyset(dev) == keyset(host)
    # probabilities match
    h_sorted = sorted(host, key=lambda d: -d.objectness)
    d_sorted = sorted(dev, key=lambda d: -d.objectness)
    for a, b in zip(h_sorted, d_sorted):
        np.testing.assert_allclose(a.prob, b.prob, rtol=1e-4, atol=1e-5)


def test_device_path_gaussian(rng):
    from darknet_tpu import model_zoo

    cfg = model_zoo.gaussian_yolov3_cfg(160, 160, classes=5)
    net = Network.from_cfg(cfg, seed=4)
    x = rng.uniform(0, 1, (1, 160, 160, 3)).astype(np.float32)
    host = net.detect_batch(x, thresh=0.05, nms=0.45)[0]
    dev = net.detect_batch_device(x, thresh=0.05, nms=0.45, top_k=2048)[0]
    assert len(dev) == len(host)
    h_sorted = sorted(host, key=lambda d: -d.objectness)
    d_sorted = sorted(dev, key=lambda d: -d.objectness)
    for a, b in zip(h_sorted[:20], d_sorted[:20]):
        np.testing.assert_allclose(a.prob, b.prob, rtol=1e-4, atol=1e-5)


def test_export_serving_artifact_roundtrip(rng, tmp_path):
    """export_serving: the serialized serving program (weights baked in,
    jax.export/StableHLO) reproduces detect_batch_device exactly when
    deserialized and run without the Network."""
    from darknet_tpu import model_zoo

    cfg = model_zoo.yolov4_tiny_cfg(160, 160)
    net = Network.from_cfg(cfg, seed=3)
    x = rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32)

    live = net._device_detect_fn(2, 160, 160, 0.2, 0.45, 64)(net.params, x)

    art = str(tmp_path / "serve.jaxexport")
    net.export_serving(art, batch=2, thresh=0.2, nms=0.45, top_k=64)
    assert os.path.getsize(art) > 1000
    tb, ov, probs = Network.run_exported_serving(art, x)

    np.testing.assert_array_equal(np.asarray(tb), np.asarray(live[0]))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(live[1]))
    np.testing.assert_array_equal(np.asarray(probs), np.asarray(live[2]))


def test_device_path_sharded_serving_dp(rng):
    """Multi-chip serving: detect_batch_device over an 8-device dp mesh
    equals the single-device program (batch sharding splits no math —
    inference has no cross-batch reductions)."""
    import jax

    from darknet_tpu import model_zoo
    from darknet_tpu.parallel import make_mesh

    cfg = model_zoo.yolov4_tiny_cfg(160, 160)
    net = Network.from_cfg(cfg, seed=6)
    x = rng.uniform(0, 1, (8, 160, 160, 3)).astype(np.float32)

    ref = net._device_detect_fn(8, 160, 160, 0.2, 0.45, 64)(net.params, x)
    mesh = make_mesh(8)
    fn = net._device_detect_fn(8, 160, 160, 0.2, 0.45, 64, mesh=mesh)
    tb, ov, probs = fn(net.params, x)

    assert {d.sharding.spec for d in (tb, ov, probs)} == {
        jax.sharding.PartitionSpec("dp")}
    np.testing.assert_allclose(np.asarray(tb), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ref[1]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref[2]),
                               rtol=2e-5, atol=2e-6)

    # and through the public list API
    dets_m = net.detect_batch_device(x, thresh=0.2, nms=0.45, top_k=64,
                                     mesh=mesh)
    dets_1 = net.detect_batch_device(x, thresh=0.2, nms=0.45, top_k=64)
    assert [len(d) for d in dets_m] == [len(d) for d in dets_1]


def test_device_path_sharded_serving_dp_sp(rng):
    """Serving over a 2x4 (dp, sp) mesh: batch AND feature-map height
    shard; GSPMD inserts the conv halo exchanges (parallel/spatial.py
    semantics) inside the full serving program incl. device NMS."""
    from darknet_tpu import model_zoo
    from darknet_tpu.parallel.spatial import make_spatial_mesh

    cfg = model_zoo.yolov4_tiny_cfg(160, 160)
    net = Network.from_cfg(cfg, seed=6)
    x = rng.uniform(0, 1, (4, 160, 160, 3)).astype(np.float32)

    ref = net._device_detect_fn(4, 160, 160, 0.2, 0.45, 64)(net.params, x)
    mesh = make_spatial_mesh(2, 4)
    tb, ov, probs = net._device_detect_fn(
        4, 160, 160, 0.2, 0.45, 64, mesh=mesh)(net.params, x)
    np.testing.assert_allclose(np.asarray(tb), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ref[1]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref[2]),
                               rtol=2e-4, atol=2e-5)


def test_sharded_serving_rejects_bad_mesh(rng):
    from darknet_tpu import model_zoo
    from darknet_tpu.parallel import make_mesh

    cfg = model_zoo.yolov4_tiny_cfg(160, 160)
    net = Network.from_cfg(cfg, seed=6)
    with pytest.raises(ValueError, match="not divisible"):
        net._device_detect_fn(3, 160, 160, 0.2, 0.45, 64,
                              mesh=make_mesh(8))


def test_detect_batch_use_device_nms_delegates(rng):
    """use_device_nms=True routes detect_batch to the device-postprocess
    program (previously a silently-dead parameter)."""
    from darknet_tpu import model_zoo

    net = Network.from_cfg(model_zoo.yolov4_tiny_cfg(96, 96), seed=2)
    x = rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    a = net.detect_batch(x, thresh=0.1, nms=0.45, use_device_nms=True)
    b = net.detect_batch_device(x, thresh=0.1, nms=0.45)
    assert [len(v) for v in a] == [len(v) for v in b]
    for p, q in zip(a[0], b[0]):
        np.testing.assert_array_equal(np.asarray(p.prob), np.asarray(q.prob))


def test_uint8_ingest_matches_f32(rng):
    """Raw uint8 frames through the serving program (low-latency ingest:
    1/4 the H2D bytes, normalize-on-device) agree with the host f32
    astype/255 path.  XLA lowers the on-device /255 to a
    reciprocal-multiply (1 ulp off the host divide), so agreement is
    tolerance-level, not bit-level: matched candidates compare to 1e-3
    and the detection count may flip by a few threshold-straddlers."""
    cfg = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov3-tiny.cfg")
    net = Network.from_cfg(cfg, seed=5)
    u8 = rng.integers(0, 256, (2, 416, 416, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    out_u8 = net.submit_detect_device(u8, thresh=0.3, nms=0.45, top_k=64)
    out_f32 = net.submit_detect_device(f32, thresh=0.3, nms=0.45, top_k=64)
    d_u8 = net.device_out_to_dets(*out_u8)
    d_f32 = net.device_out_to_dets(*out_f32)
    for la, lb in zip(d_u8, d_f32):
        assert abs(len(la) - len(lb)) <= max(2, len(lb) // 10)
        # compare only the common prefix of the objectness-sorted lists:
        # a threshold-straddler mid-list would misalign a full pairwise
        # zip and fail every subsequent pair (advisor r4 finding) — the
        # high-confidence detections are the ones that must agree
        sa = sorted(la, key=lambda d: -d.objectness)
        sb = sorted(lb, key=lambda d: -d.objectness)
        n = min(len(sa), len(sb))
        for a, b in zip(sa[:n], sb[:n]):
            if abs(a.objectness - b.objectness) >= 1e-3:
                # straddler boundary reached: everything below is
                # threshold-dependent ordering noise
                break
            np.testing.assert_allclose(a.bbox, b.bbox, rtol=1e-3, atol=1e-4)


def test_uint8_ingest_shape_check():
    cfg = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov3-tiny.cfg")
    net = Network.from_cfg(cfg, seed=5)
    bad = np.zeros((1, 200, 416, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="input must be"):
        net.submit_detect_device(bad)
