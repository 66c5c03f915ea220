"""Vision-apps tests: tracker lifecycle, association, geo zones, visualize,
and the CLI image mode end-to-end with a tiny net."""

import os
import subprocess
import sys

import numpy as np
import pytest

from darknet_tpu.apps.geo import (GeoInfo, Handover, ParkingLot,
                                  is_in_polygon, polygon_area)
from darknet_tpu.apps.tracker import (ConfParam, MostProbDet, Track,
                                      TrackManager, STATIONARY)


def _det(x, y, w=0.1, h=0.1, cid=0, prob=0.95):
    return MostProbDet(bbox=(x, y, w, h), cid=cid, prob=prob)


def test_track_spawn_and_retire():
    tm = TrackManager(ConfParam(1, 3, 6), fps=15, iou_thresh=0.3)
    tm.track([_det(0.5, 0.5)])
    assert len(tm.tracks) == 1
    # no detections: confidence decays to zero and the track retires
    for _ in range(5):
        tm.track([])
    assert len(tm.tracks) == 0


def test_track_follows_moving_object():
    tm = TrackManager(ConfParam(1, 3, 6), fps=15, iou_thresh=0.3)
    for i in range(12):
        x = 0.3 + i * 0.01
        tm.track([_det(x, 0.5)])
    assert len(tm.tracks) == 1
    t = tm.tracks[0]
    assert t.label >= 0                     # labeled after min_conf frames
    assert abs(t.bbox[0] - 0.41) < 0.05     # tracked the motion
    assert t.conf == 6                      # capped at max_conf


def test_track_association_two_objects():
    tm = TrackManager(ConfParam(1, 3, 6), fps=15, iou_thresh=0.3)
    for i in range(6):
        tm.track([_det(0.2, 0.2), _det(0.8, 0.8)])
    assert len(tm.tracks) == 2
    xs = sorted(t.bbox[0] for t in tm.tracks)
    assert abs(xs[0] - 0.2) < 0.05 and abs(xs[1] - 0.8) < 0.05


def test_track_goes_stationary():
    tm = TrackManager(ConfParam(1, 2, 4), fps=3, iou_thresh=0.3)
    for _ in range(10):
        tm.track([_det(0.5, 0.5, prob=0.95)])
    assert tm.tracks[0].status == STATIONARY


def test_polygon_helpers():
    square = [(0.2, 0.2), (0.8, 0.2), (0.8, 0.8), (0.2, 0.8)]
    assert is_in_polygon(square, (0.5, 0.5))
    assert not is_in_polygon(square, (0.9, 0.5))
    assert abs(polygon_area(square) - 0.36) < 1e-6


def test_geo_xml_and_parking(tmp_path):
    xml = tmp_path / "zones.xml"
    xml.write_text("""<polygons>
      <polygon><name>P1</name><num>4</num>
        <x0>0.2</x0><y0>0.2</y0><x1>0.8</x1><y1>0.2</y1>
        <x2>0.8</x2><y2>0.8</y2><x3>0.2</x3><y3>0.8</y3></polygon>
      <polygon><name>HANDOVER</name><num>4</num>
        <x0>0.0</x0><y0>0.0</y0><x1>0.3</x1><y1>0.0</y1>
        <x2>0.3</x2><y2>1.0</y2><x3>0.0</x3><y3>1.0</y3></polygon>
    </polygons>""")
    geo = GeoInfo().load(str(xml), fps=3)
    assert len(geo.parking_lots) == 1
    assert len(geo.handovers) == 1

    # a stationary track inside P1 starts the occupancy timer
    tm = TrackManager(ConfParam(1, 2, 4), fps=3, iou_thresh=0.3)
    for _ in range(10):
        tm.track([_det(0.5, 0.5, prob=0.95)])
    geo.proc(tm.get_tracks())
    assert geo.parking_lots[0].curr_occ.start != 0


def test_handover_crosstalk():
    poly = [(0.0, 0.0), (0.3, 0.0), (0.3, 1.0), (0.0, 1.0)]
    h1 = Handover("HANDOVER", poly, fps=3)
    h2 = Handover("HANDOVER", poly, fps=3)

    tm1 = TrackManager(ConfParam(1, 2, 4), fps=3, iou_thresh=0.3)
    for _ in range(5):
        tm1.track([_det(0.15, 0.5)])       # old track exiting cam1's zone
    t1 = tm1.tracks[0]
    t1.count = 100                         # old track -> exit queue
    h1.proc([t1])
    assert len(h1.exit) == 1

    tm2 = TrackManager(ConfParam(1, 2, 4), fps=3, iou_thresh=0.3)
    tm2.track([_det(0.15, 0.5)])           # brand-new track in cam2's zone
    t2 = tm2.tracks[0]
    h2.proc([t2])
    assert len(h2.enter) == 1

    Handover.crosstalk(h1, h2)
    assert t2.label == t1.label            # label transferred
    assert t2.enter_status and t1.exit_status


def test_geo_draw_overlay():
    """GeoInfo.Draw parity (geo_info.cpp:132-166,244-260,342-353):
    polygon outline lands at the scaled vertex locations, ParkingLot
    renders an HH:MM:SS occupancy message while occupied, Handover
    renders its zone name."""
    import time as _time

    poly = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75)]
    geo = GeoInfo()
    geo.parking_lots.append(ParkingLot("P1", poly))
    geo.handovers.append(Handover("HANDOVER", poly, fps=3))

    img = np.zeros((200, 400, 3), np.uint8)
    geo.draw(img)
    assert img.sum() > 0
    # red (RGB) polyline passes through the scaled top edge midpoint
    edge = img[50, 150:250]
    assert (edge[:, 0] == 255).any() and not (edge[:, 2] == 255).all()

    # occupied lot: message becomes elapsed HH:MM:SS — text pixels (with a
    # white halo) appear near the centroid, unlike the empty-message case
    before = np.zeros((200, 400, 3), np.uint8)
    geo.parking_lots[0].draw(before)          # unoccupied: empty message
    geo.parking_lots[0].curr_occ.start = _time.time() - 3661  # 01:01:01
    after = np.zeros((200, 400, 3), np.uint8)
    geo.parking_lots[0].draw(after)
    center_region = (slice(80, 120), slice(150, 250))
    assert after[center_region].sum() > before[center_region].sum()
    # white halo pixels prove text (polylines only draw pure red)
    assert (after[center_region] == 255).all(axis=-1).any()

    # BGR mode puts the polyline red in channel 2
    bgr = np.zeros((200, 400, 3), np.uint8)
    geo.draw(bgr, bgr=True)
    assert (bgr[50, 150:250, 2] == 255).any()


def test_visualize_draws(tmp_path):
    from darknet_tpu.apps import visualize as viz

    img = np.zeros((240, 320, 3), np.uint8)
    dets = [_det(0.5, 0.5, 0.3, 0.3, cid=1)]
    out = viz.draw_detections(img.copy(), dets, ["a", "b", "c"])
    assert out.sum() > 0
    chart = viz.draw_loss_chart([0, 10, 20], [4.0, 2.0, 1.0],
                                max_iter=100, path=str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").exists()
    assert chart.shape == (720, 1000, 3)


def test_cli_image_mode(tmp_path, fixtures_dir):
    """End-to-end CLI: image mode with yolov3-tiny random weights."""
    import cv2

    img = np.full((240, 320, 3), 127, np.uint8)
    cv2.rectangle(img, (100, 60), (220, 180), (30, 200, 30), -1)
    img_path = str(tmp_path / "t.jpg")
    cv2.imwrite(img_path, img)

    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"c{i}" for i in range(80)))
    data = tmp_path / "t.data"
    data.write_text(f"classes=80\nnames={names}\n")

    from darknet_tpu.apps.cli import main

    main(["-mode", "image",
          "-data_file", str(data),
          "-model_file", os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
          "-weights_file", "/nonexistent",
          "-input_file", img_path,
          "-thresh", "0.3",
          "-out_dir", str(tmp_path / "out")])
    assert (tmp_path / "out" / "det_t.jpg").exists()


def test_multi_video_batched_predict(tmp_path, fixtures_dir):
    """Multi-camera frames ride ONE batch dimension (upgrade of
    yolo_core.cpp:276-392's sequential batch=1 loop): _proc_frames_batch
    produces per-camera results identical to per-frame _proc_frame."""
    import cv2

    from darknet_tpu.apps.cli import _proc_frame, _proc_frames_batch
    from darknet_tpu.config.metadata import Metadata
    from darknet_tpu.nn.network import Network

    rng = np.random.default_rng(3)
    frames = [
        (rng.uniform(0, 255, (120, 160, 3))).astype(np.uint8)
        for _ in range(3)]

    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"c{i}" for i in range(80)))
    data = tmp_path / "t.data"
    data.write_text(f"classes=80\nnames={names}\n")
    md = Metadata.from_file(str(data))

    net = Network.from_cfg(os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
                           seed=7)

    class A:
        thresh = 0.1
        nms_thresh = 0.45
        letter_box = False

    outs = _proc_frames_batch(net, md, frames, A())
    assert len(outs) == 3
    for frame, (display, dets) in zip(frames, outs):
        d1, dets1 = _proc_frame(net, md, frame, A())
        assert len(dets) == len(dets1)
        for a, b in zip(dets, dets1):
            np.testing.assert_allclose(a.bbox, b.bbox, atol=1e-5)
        np.testing.assert_array_equal(display, d1)


def test_multi_video_device_letterbox(tmp_path, fixtures_dir):
    """letter_box multi-camera path preprocesses ON DEVICE; detections
    match the host letterbox path to interpolation tolerance."""
    from darknet_tpu.apps.cli import _proc_frame, _proc_frames_batch
    from darknet_tpu.config.metadata import Metadata
    from darknet_tpu.nn.network import Network

    rng = np.random.default_rng(9)
    frames = [(rng.uniform(0, 255, (120, 200, 3))).astype(np.uint8)
              for _ in range(2)]

    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"c{i}" for i in range(80)))
    data = tmp_path / "t.data"
    data.write_text(f"classes=80\nnames={names}\n")
    md = Metadata.from_file(str(data))
    net = Network.from_cfg(os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
                           seed=7)

    class A:
        thresh = 0.1
        nms_thresh = 0.45
        letter_box = True

    outs = _proc_frames_batch(net, md, frames, A())
    assert len(outs) == 2
    for frame, (_display, dets) in zip(frames, outs):
        _d1, dets1 = _proc_frame(net, md, frame, A())
        assert abs(len(dets) - len(dets1)) <= max(2, len(dets1) // 10)


def test_cli_image_mode_device_nms(tmp_path, fixtures_dir):
    """-device_nms on: image mode rides the on-device decode+top-k+NMS
    serving program (the path bench.py measures) and still produces the
    detection overlay output."""
    import cv2

    img = np.full((240, 320, 3), 127, np.uint8)
    cv2.rectangle(img, (100, 60), (220, 180), (30, 200, 30), -1)
    img_path = str(tmp_path / "t.jpg")
    cv2.imwrite(img_path, img)

    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"c{i}" for i in range(80)))
    data = tmp_path / "t.data"
    data.write_text(f"classes=80\nnames={names}\n")

    from darknet_tpu.apps.cli import main

    main(["-mode", "image",
          "-data_file", str(data),
          "-model_file", os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
          "-weights_file", "/nonexistent",
          "-input_file", img_path,
          "-thresh", "0.3",
          "-device_nms", "on",
          "-out_dir", str(tmp_path / "out")])
    assert (tmp_path / "out" / "det_t.jpg").exists()


def test_cli_video_mode_end_to_end(tmp_path, fixtures_dir):
    """BASELINE config 4 smoke: `-mode video` drives capture -> predict ->
    NMS -> tracking -> proc-time overlay -> mp4 writer on a synthetic
    clip (yolo_core.cpp:219-274)."""
    import cv2

    from darknet_tpu.apps.cli import main

    vid = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                        (160, 120))
    for t in range(6):
        f = np.full((120, 160, 3), 110, np.uint8)
        cv2.rectangle(f, (20 + 8 * t, 30), (60 + 8 * t, 80),
                      (40, 90, 210), -1)
        w.write(f)
    w.release()

    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"c{i}" for i in range(80)))
    data = tmp_path / "t.data"
    data.write_text(f"classes=80\nnames={names}\n")

    main(["-mode", "video",
          "-data_file", str(data),
          "-model_file", os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
          "-weights_file", "/nonexistent",
          "-input_file", vid,
          "-thresh", "0.3",
          "-save_output",
          "-out_dir", str(tmp_path / "out")])
    out = tmp_path / "out" / "clip_out.mp4"
    assert out.exists()
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()


def test_cli_multi_video_mode_end_to_end(tmp_path, fixtures_dir):
    """`-mode multi-video`: two cameras through ONE batched network with
    per-camera trackers, auto-discovered geo zones and handover
    crosstalk wiring (yolo_core.cpp:276-392)."""
    import cv2

    from darknet_tpu.apps.cli import main

    xml = """<polygons>
      <polygon><name>HANDOVER</name><num>4</num>
        <x0>0.0</x0><y0>0.0</y0><x1>0.5</x1><y1>0.0</y1>
        <x2>0.5</x2><y2>1.0</y2><x3>0.0</x3><y3>1.0</y3></polygon>
    </polygons>"""
    vids = []
    for cam in range(2):
        vid = str(tmp_path / f"cam{cam}.mp4")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                            (160, 120))
        for t in range(4):
            f = np.full((120, 160, 3), 100 + 20 * cam, np.uint8)
            cv2.rectangle(f, (30 + 6 * t, 40), (80 + 6 * t, 90),
                          (50, 180, 90), -1)
            w.write(f)
        w.release()
        (tmp_path / f"cam{cam}.xml").write_text(xml)
        vids.append(vid)

    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"c{i}" for i in range(80)))
    data = tmp_path / "t.data"
    data.write_text(f"classes=80\nnames={names}\n")

    main(["-mode", "multi-video",
          "-data_file", str(data),
          "-model_file", os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
          "-weights_file", "/nonexistent",
          "-input_file", ",".join(vids),
          "-thresh", "0.3",
          "-save_output",
          "-out_dir", str(tmp_path / "out")])
    for cam in range(2):
        out = tmp_path / "out" / f"cam{cam}_out.mp4"
        assert out.exists(), out
        cap = cv2.VideoCapture(str(out))
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
        cap.release()


def test_cli_video_pipelined_device_path(tmp_path, fixtures_dir):
    """Device-postprocess video mode runs a depth-1 streaming pipeline
    (submit N while finalizing N-1): no dropped or duplicated frames,
    and per-frame detections equal the unpipelined _proc_frame path."""
    import cv2

    from darknet_tpu.apps.cli import (_finalize_frame, _proc_frame,
                                      _submit_frame, main)
    from darknet_tpu.config.metadata import Metadata
    from darknet_tpu.nn.network import Network

    vid = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                        (160, 120))
    rng = np.random.default_rng(5)
    frames = []
    for t in range(5):
        f = (rng.uniform(0, 255, (120, 160, 3))).astype(np.uint8)
        frames.append(f)
        w.write(f)
    w.release()

    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"c{i}" for i in range(80)))
    data = tmp_path / "t.data"
    data.write_text(f"classes=80\nnames={names}\n")

    main(["-mode", "video",
          "-data_file", str(data),
          "-model_file", os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
          "-weights_file", "/nonexistent",
          "-input_file", vid, "-thresh", "0.3",
          "-device_nms", "on", "-save_output",
          "-out_dir", str(tmp_path / "out")])
    cap = cv2.VideoCapture(str(tmp_path / "out" / "clip_out.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()

    # submit/finalize == _proc_frame on the same frames
    md = Metadata.from_file(str(data))
    net = Network.from_cfg(os.path.join(fixtures_dir, "yolov3-tiny.cfg"),
                           seed=7)

    class A:
        thresh = 0.25
        nms_thresh = 0.45
        letter_box = False
        device_nms = "on"
        top_k = 256

    for f in frames[:2]:
        out = _submit_frame(net, f, A())
        disp_a, dets_a = _finalize_frame(net, md, f, out, A())
        disp_b, dets_b = _proc_frame(net, md, f, A())
        assert len(dets_a) == len(dets_b)
        for a, b in zip(dets_a, dets_b):
            np.testing.assert_allclose(a.bbox, b.bbox, atol=1e-6)
        np.testing.assert_array_equal(disp_a, disp_b)


def test_multi_camera_batch_shards_over_serving_mesh():
    """-num_chips in the streaming path: _submit_frames_batch shards the
    camera batch over a dp mesh when it divides evenly (else falls back
    to single-chip), detections identical either way."""
    import argparse

    from darknet_tpu import model_zoo
    from darknet_tpu.apps.cli import (_finalize_frames_batch,
                                      _serving_mesh, _submit_frames_batch)
    from darknet_tpu.config.metadata import Metadata
    from darknet_tpu.nn.network import Network

    net = Network.from_cfg(model_zoo.yolov4_tiny_cfg(96, 96), seed=2)
    md = Metadata(classes=80, names=[f"c{i}" for i in range(80)])
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
              for _ in range(4)]

    def run(num_chips):
        args = argparse.Namespace(
            thresh=0.05, nms_thresh=0.45, device_nms="on", top_k=32,
            letter_box=False, num_chips=num_chips, disable_tracking=True,
            save_output=False)
        sub = _submit_frames_batch(net, frames, args)
        outs = _finalize_frames_batch(net, md, frames, sub, args)
        return [d for _f, dets in outs for d in dets], args

    d1, _ = run(1)
    dm, args_m = run(2)
    assert _serving_mesh(args_m, 4) is not None        # 4 % 2 == 0
    assert _serving_mesh(args_m, 3) is None            # ragged -> fallback
    assert len(d1) == len(dm)
    for a, b in zip(d1, dm):
        np.testing.assert_allclose(a.prob, b.prob, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a.bbox, b.bbox, rtol=1e-5, atol=1e-6)


def test_trainer_renders_chart_and_persists_history(tmp_path):
    """The reference's TrainDetector renders a live loss/mAP chart +
    chart.png (detector.cpp:122-123,269-270, visualize.cpp:172-315); the
    trainer must produce it and carry the history through a full-state
    checkpoint (the reference's chart restarts empty on resume)."""
    from darknet_tpu.data.synth import generate
    from darknet_tpu.train.trainer import DetectorTrainer

    files = generate(str(tmp_path / "ds"), n_train=16, n_val=4, seed=3)
    cfg = ("[net]\nbatch=4\nsubdivisions=1\nwidth=64\nheight=64\n"
           "channels=3\nlearning_rate=0.001\nburn_in=5\npolicy=constant\n"
           "max_epoch=1000\n"
           "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
           "stride=2\npad=1\nactivation=leaky\n"
           "[convolutional]\nfilters=27\nsize=1\nactivation=linear\n"
           "[yolo]\nmask=0,1,2\nnum=3\nclasses=4\n"
           "anchors=16,16, 24,24, 32,24\n")
    tr = DetectorTrainer(cfg, files["train_paths"], classes=4,
                         save_dir=str(tmp_path / "bk"), save_name="m",
                         loader_threads=2, log=lambda *a: None)
    tr.net.max_iter = 1000
    tr.train(max_iters=12)
    try:
        chart = tmp_path / "bk" / "chart.png"
        assert chart.exists() and chart.stat().st_size > 0
        assert len(tr._chart["iters"]) == 12

        # history survives the full-state checkpoint round trip
        tr.save_state()
        tr2 = DetectorTrainer(cfg, files["train_paths"], classes=4,
                              save_dir=str(tmp_path / "bk"), save_name="m",
                              loader_threads=2, log=lambda *a: None)
        tr2.load_state(tr.state_path)
        assert tr2._chart["iters"] == tr._chart["iters"]
        # losses persist as f32 in the npz — compare at that precision
        np.testing.assert_allclose(tr2._chart["losses"],
                                   tr._chart["losses"], rtol=1e-6)
        tr2.close()
    finally:
        tr.close()
