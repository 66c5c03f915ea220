"""Streaming video inference with multi-object tracking.

Synthesizes a short clip of moving shapes (no video file needed), then
runs the production streaming loop:

  * detect_batch_device as submit + finalize halves — the next frame's
    device program is dispatched BEFORE the current frame's host tail
    runs (JAX async dispatch overlaps device and host work; the CLI's
    video mode uses the same pattern);
  * apps.tracker.TrackManager — Kalman-filter prediction + Hungarian
    IoU association (track_manager.cpp semantics; the vendored
    1,079-LoC Kuhn-Munkres is a scipy call here);
  * apps.visualize.draw_trackings + an mp4 writer.

For real videos use the CLI:
  python -m darknet_tpu.apps.cli -mode video -data_file ... \\
      -model_file ... -weights_file ... -input_file clip.mp4
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from _common import base_parser, require_trained, workdir_paths  # noqa: E402

FPS = 15
N_FRAMES = 45
W, H = 256, 192


def synth_frames():
    """Moving shapes on a noise background, colored like the training
    classes (red rectangle moving right, blue circle moving down-left)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for t in range(N_FRAMES):
        img = rng.integers(90, 130, (H, W, 3)).astype(np.uint8)
        # red rectangle, constant velocity
        x0 = 10 + int(t * 3.5)
        y0 = 40
        img[y0:y0 + 56, x0:x0 + 64] = (210, 40, 40)
        # blue circle
        cx, cy = W - 50 - t * 2, 60 + t * 2
        yy, xx = np.mgrid[0:H, 0:W]
        mask = ((xx - cx) / 28.0) ** 2 + ((yy - cy) / 28.0) ** 2 <= 1.0
        img[mask] = (40, 70, 220)
        yield img


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()

    paths = workdir_paths(args.workdir)
    cfg = args.cfg or paths["cfg"]
    weights = args.weights or paths["weights"]
    if args.cfg is None:
        require_trained(paths)

    import time

    import cv2
    import numpy as np

    from darknet_tpu.apps import visualize as viz
    from darknet_tpu.apps.tracker import (ConfParam, TrackManager,
                                          get_most_prob_dets)
    from darknet_tpu.config.metadata import Metadata
    from darknet_tpu.data.image import resize_image_cv
    from darknet_tpu.nn.network import Network

    net = Network.from_cfg(cfg, weights=weights)
    names = (Metadata.from_file(paths["data"]).names
             if os.path.exists(paths["data"]) else [])
    tracker = TrackManager(ConfParam.from_fps(FPS), FPS, iou_thresh=0.3)

    out_path = os.path.join(args.workdir, "tracking.mp4")
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             FPS, (W, H))

    def submit(frame):
        """Dispatch the device program; returns device arrays (futures)."""
        x = resize_image_cv(frame.astype(np.float32) / 255.0,
                            net.net.w, net.net.h)
        return net.submit_detect_device(x[None], top_k=64)

    pending = None
    frames = list(synth_frames())
    t0 = time.perf_counter()
    n_tracked = 0
    for i, frame in enumerate(frames + [None]):
        nxt = submit(frame) if frame is not None else None
        if pending is not None:
            # finalize the PREVIOUS frame while `nxt` runs on device
            dets = Network.device_out_to_dets(*pending)[0]
            tracker.track(get_most_prob_dets(dets))
            disp = frames[i - 1].copy()
            viz.draw_trackings(disp, tracker.get_tracks(), names)
            viz.draw_frame_info(disp, i - 1, N_FRAMES)
            writer.write(disp[..., ::-1])
            n_tracked = max(n_tracked, len(tracker.get_tracks()))
        pending = nxt
    writer.release()
    dt = time.perf_counter() - t0

    labels = sorted({t.label for t in tracker.get_tracks() if t.label >= 0})
    print(f"{N_FRAMES} frames in {dt:.2f}s ({N_FRAMES / dt:.1f} fps incl. "
          f"compile), {n_tracked} concurrent tracks, labels {labels}")
    print(f"output video: {out_path}")


if __name__ == "__main__":
    main()
