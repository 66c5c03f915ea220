"""OpenCV visualization: detection/tracking overlays + training chart.

Port of `visualize.cpp`: per-class/per-label pseudo-random palette
(GetRandColor), detection boxes with name(prob%) tags, track boxes with
name(label, prob%) tags and thicker borders for STATIONARY tracks, proc-time
and frame counters, and the loss/mAP training chart rendered to chart.png
(visualize.cpp:172-315).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from darknet_tpu.apps.tracker import STATIONARY

_FONT = 0 if cv2 is None else cv2.FONT_HERSHEY_COMPLEX_SMALL


_gui_broken = False


def gui_ok() -> bool:
    """Live windows like the reference (imshow + waitKey,
    yolo_core.cpp:211-212,267-268,378-379; the training chart window,
    visualize.cpp:308-314) when a display exists; headless runs (no
    DISPLAY on linux, or DARKNET_TPU_NO_GUI=1) write files only."""
    import os
    import sys

    if cv2 is None or _gui_broken:
        return False
    if os.environ.get("DARKNET_TPU_NO_GUI"):
        return False
    if sys.platform in ("darwin", "win32"):
        return True
    return bool(os.environ.get("DISPLAY")
                or os.environ.get("WAYLAND_DISPLAY"))


def safe_imshow(window: str, img_bgr, wait_ms: int = 1) -> int:
    """imshow + waitKey that survives headless OpenCV builds
    (opencv-python-headless raises 'The function is not implemented'
    even with DISPLAY set): the first failure permanently disables the
    GUI instead of aborting the run.  Returns the waitKey code, or -1
    when the GUI is unavailable.  wait_ms=0 blocks for a key (the
    reference's image-mode behavior, yolo_core.cpp:212)."""
    global _gui_broken
    if not gui_ok():
        return -1
    try:
        cv2.imshow(window, img_bgr)
        return cv2.waitKey(wait_ms)
    except cv2.error:
        _gui_broken = True
        return -1


def get_rand_color(idx: int) -> tuple:
    """Deterministic pseudo-random palette keyed by class/label."""
    rng = np.random.default_rng(idx * 7919 + 17)
    c = rng.integers(64, 256, size=3)
    return int(c[0]), int(c[1]), int(c[2])


def _draw_tagged_box(img, left, top, right, bottom, tag, color, width,
                     font_sz=1.0):
    h, w = img.shape[:2]
    p1 = (int(left), int(top))
    p2 = (int(right), int(bottom))
    (tw, th), baseline = cv2.getTextSize(tag, _FONT, font_sz, 1)
    cv2.rectangle(img, p1, p2, color, width)
    bg1 = (int(left), int(top - baseline - th))
    bg2 = (int(left + tw), int(top))
    cv2.rectangle(img, bg1, bg2, color, -1)
    cv2.putText(img, tag, (int(left), int(top - baseline / 2)), _FONT,
                font_sz, (0, 0, 0), 1, cv2.LINE_AA)


def draw_detections(img, dets, names):
    """DrawYoloDetections: `dets` are tracker.MostProbDet (relative boxes)."""
    h, w = img.shape[:2]
    width = max(1, w // 640)
    for d in dets:
        x, y, bw, bh = d.bbox
        left, right = (x - bw / 2) * w, (x + bw / 2) * w
        top, bottom = (y - bh / 2) * h, (y + bh / 2) * h
        name = names[d.cid] if d.cid < len(names) else str(d.cid)
        tag = f"{name}({d.prob * 100:2.0f}%)"
        _draw_tagged_box(img, left, top, right, bottom, tag,
                         get_rand_color(d.cid), width)
    return img


def draw_trackings(img, tracks, names):
    """DrawYoloTrackings: thicker boxes for STATIONARY tracks."""
    h, w = img.shape[:2]
    base_width = max(1, w // 640)
    for t in tracks:
        x, y, bw, bh = t.bbox
        left, right = (x - bw / 2) * w, (x + bw / 2) * w
        top, bottom = (y - bh / 2) * h, (y + bh / 2) * h
        cid = t.det.cid
        name = names[cid] if cid < len(names) else str(cid)
        tag = f"{name}({t.label},{t.det.prob * 100:2.0f}%)"
        width = base_width * (2 if t.status == STATIONARY else 1)
        _draw_tagged_box(img, left, top, right, bottom, tag,
                         get_rand_color(t.label), width, font_sz=0.5)
    return img


def draw_proc_time(img, millisec: float):
    txt = f"Proc time: {int(millisec)} ms"
    cv2.putText(img, txt, (10, 25), _FONT, 1.0, (255, 255, 255), 4)
    cv2.putText(img, txt, (10, 25), _FONT, 1.0, (255, 0, 0), 1)
    return img


def draw_frame_info(img, curr_frame: int, max_frame: int):
    txt = f"Frame: {curr_frame}/{max_frame}"
    cv2.putText(img, txt, (10, 50), _FONT, 1.0, (255, 255, 255), 4)
    cv2.putText(img, txt, (10, 50), _FONT, 1.0, (255, 0, 0), 1)
    return img


def draw_loss_chart(iters, avg_losses, map_iters=None, maps=None,
                    max_iter=10000, max_loss=5.0, width=1000, height=720,
                    path="chart.png"):
    """Loss/mAP training chart -> PNG (DrawLossGraph, visualize.cpp:172-315)."""
    margin = 60
    img = np.full((height, width, 3), 255, np.uint8)
    x0, y0 = margin, height - margin
    x1, y1 = width - margin, margin
    # grid
    for frac in np.linspace(0, 1, 11):
        gx = int(x0 + frac * (x1 - x0))
        gy = int(y0 - frac * (y0 - y1))
        cv2.line(img, (gx, y1), (gx, y0), (224, 224, 224), 1)
        cv2.line(img, (x0, gy), (x1, gy), (224, 224, 224), 1)
        cv2.putText(img, f"{frac * max_loss:.1f}", (5, gy + 5), _FONT, 0.7,
                    (128, 128, 128), 1)
        cv2.putText(img, f"{int(frac * max_iter)}", (gx - 15, height - 30),
                    _FONT, 0.7, (128, 128, 128), 1)
    cv2.rectangle(img, (x0, y1), (x1, y0), (0, 0, 0), 1)

    def to_px(it, val, vmax):
        px = x0 + int((x1 - x0) * min(it / max(max_iter, 1), 1.0))
        # a NaN/inf loss (diverged run) pins to the top of the chart
        # instead of crashing the renderer mid-training
        frac = min(val / vmax, 1.0) if np.isfinite(val) else 1.0
        py = y0 - int((y0 - y1) * frac)
        return px, py

    pts = [to_px(i, v, max_loss) for i, v in zip(iters, avg_losses)]
    for a, b in zip(pts, pts[1:]):
        cv2.line(img, a, b, (255, 0, 0), 1)
    if map_iters and maps:
        mpts = [to_px(i, v, 1.0) for i, v in zip(map_iters, maps)]
        for a, b in zip(mpts, mpts[1:]):
            cv2.line(img, a, b, (0, 0, 255), 2)
        cv2.putText(img, "mAP%", (x1 - 60, y1 + 20), _FONT, 0.7, (0, 0, 255),
                    1)
    cv2.putText(img, "avg loss", (x0 + 10, y1 + 20), _FONT, 0.7, (255, 0, 0),
                1)
    if path:
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return img
