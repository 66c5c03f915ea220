"""mAP@IoU validation — exact port of ValidateDetector
(detector.cpp:326-561).

Semantics preserved:
* detection threshold .005, NMS .45 with the head's nms_kind/beta;
* per-image greedy match: a detection's (class, prob) entry matches the
  highest-IoU same-class GT with IoU > iou_thresh;
* global confidence-sorted PR accumulation with unique-GT TP logic
  (first match in confidence order claims the GT; later ones are FPs);
* AP by right-to-left interpolated precision (Riemann sum over recall
  deltas), mAP = mean over classes;
* recall/precision reported at the prob=0.5 crossing.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from darknet_tpu.data.image import load_image_rgb, resize_image_cv
from darknet_tpu.data.labels import image_to_label_path, read_box_annot


#: the COCO challenge's IoU sweep (AP@[.5:.95], step .05)
COCO_IOUS = tuple(round(0.5 + 0.05 * i, 2) for i in range(10))


@dataclasses.dataclass
class MapResult:
    map: float
    per_class_ap: np.ndarray
    recall: float
    precision: float
    pred_time_s: float
    imgs_per_s: float
    n_pred: int
    n_gt: int
    # multi-IoU sweep (iou_thresholds=): mAP per threshold, and their
    # mean — the COCO AP@[.5:.95] when thresholds == COCO_IOUS.  The
    # reference evaluates a single threshold only (detector.cpp:326).
    map_by_iou: dict | None = None
    map_mean_iou: float | None = None


def _iou_single(a, b):
    w = min(a[0] + a[2] / 2, b[0] + b[2] / 2) - \
        max(a[0] - a[2] / 2, b[0] - b[2] / 2)
    h = min(a[1] + a[3] / 2, b[1] + b[3] / 2) - \
        max(a[1] - a[3] / 2, b[1] - b[3] / 2)
    if w < 0 or h < 0:
        return 0.0
    inter = w * h
    u = a[2] * a[3] + b[2] * b[3] - inter
    eps = np.finfo(np.float32).eps
    if abs(inter) < eps or abs(u) < eps:
        return 0.0
    return inter / u


def _load_resized(path, w, h, resize: str = "cv"):
    im = load_image_rgb(path)
    if resize == "darknet":
        from darknet_tpu.data.image import resize_image_darknet

        return resize_image_darknet(im, w, h)
    return resize_image_cv(im, w, h)


def validate_detector(net, img_paths, classes: int, iou_thresh: float = 0.5,
                      thresh: float = 0.005, nms: float = 0.45,
                      batch: int = 1, progress: bool = True,
                      threads: int = 6, resize: str = "cv",
                      mesh=None, iou_thresholds=None) -> MapResult:
    """Run the full mAP pipeline with a `Network` (or anything exposing
    `detect_batch`).

    Image loading is prefetched on a thread pool (the reference overlaps
    load with predict via load_data_in_thread, detector.cpp:358-371): the
    next chunk decodes while the current one runs on the device, so valid
    mode is device-bound, not I/O-bound.

    mesh: shard each forward batch over the mesh's "dp" axis (multi-chip
    valid mode; batch must divide by the dp size).  Decode + NMS + the
    PR accumulation stay on host, bit-identical to the single-chip path
    — the reference's ValidateDetector is single-GPU only
    (detector.cpp:326-561).

    iou_thresholds (e.g. COCO_IOUS): evaluate additional IoU thresholds
    from the SAME prediction pass — only the cheap host-side det↔GT
    matching and PR accumulation repeat per threshold.  The headline
    fields stay at `iou_thresh` (reference semantics); `map_by_iou` /
    `map_mean_iou` carry the sweep (COCO AP@[.5:.95] when the sweep is
    COCO_IOUS).
    """
    import concurrent.futures as cf

    # thresholds to MATCH at: the headline iou_thresh plus the (deduped)
    # sweep; map_by_iou/map_mean_iou report over exactly iou_thresholds
    extra_ts: list = []
    if iou_thresholds is not None:
        for t in iou_thresholds:
            if float(t) not in extra_ts:
                extra_ts.append(float(t))
    sweep = [float(iou_thresh)] + [t for t in extra_ts
                                   if t != float(iou_thresh)]
    val_boxes = {t: [] for t in sweep}      # t -> (prob, cid, matched, gt_idx)
    num_gt_class = np.zeros(classes, np.int64)
    num_gt = 0
    pred_time = 0.0

    chunks = [img_paths[s:s + batch]
              for s in range(0, len(img_paths), batch)]
    pool = cf.ThreadPoolExecutor(max_workers=threads)

    def submit(chunk):
        return [pool.submit(_load_resized, p, net.net.w, net.net.h, resize)
                for p in chunk]

    pending = submit(chunks[0]) if chunks else None
    for ci, chunk in enumerate(chunks):
        futs = pending
        pending = submit(chunks[ci + 1]) if ci + 1 < len(chunks) else None
        x = np.stack([f.result() for f in futs])
        start = ci * batch
        # pad the ragged last chunk so every batch hits the same executable
        pad = batch - x.shape[0]
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:],
                                            x.dtype)])

        t0 = time.perf_counter()
        if mesh is not None:
            dets_batch = net.detect_batch(x, thresh=thresh, nms=nms,
                                          mesh=mesh)
        else:
            dets_batch = net.detect_batch(x, thresh=thresh, nms=nms)
        pred_time += time.perf_counter() - t0
        dets_batch = dets_batch[: len(chunk)]

        for p, dets in zip(chunk, dets_batch):
            gt = read_box_annot(image_to_label_path(p))
            for row in gt:
                cid = int(row[0])
                if 0 <= cid < classes:
                    num_gt_class[cid] += 1
            if dets:
                from darknet_tpu.utils.native import match_dets_native

                d_boxes = np.asarray([d.bbox for d in dets], np.float32)
                d_probs = np.stack([np.asarray(d.prob) for d in dets])
                # ONE matching pass at iou_thresh=0 serves every
                # threshold: the greedy match at t is the global
                # argmax-IoU same-class GT, matched iff best_iou > t
                # (detector.cpp:388-424 re-matches per threshold; the
                # derivation is exact, see yolo_host.cpp).
                rows = match_dets_native(d_boxes, d_probs, gt, 0.0)
                if rows is None:
                    rows = []
                    for d in dets:
                        probs = np.asarray(d.prob)
                        for cid in np.nonzero(
                                np.abs(probs)
                                >= np.finfo(np.float32).eps)[0]:
                            gt_idx, max_iou = -1, 0.0
                            for k, row in enumerate(gt):
                                if int(row[0]) != cid:
                                    continue
                                iou = _iou_single(d.bbox, row[1:5])
                                if iou > max_iou:
                                    max_iou = iou
                                    gt_idx = k
                            rows.append((float(probs[cid]), cid,
                                         gt_idx, max_iou))
                for prob, cid, gt_idx, best_iou in rows:
                    gi = int(gt_idx)
                    for t in sweep:
                        ok = gi > -1 and best_iou > t
                        val_boxes[t].append(
                            (float(prob), int(cid), ok,
                             num_gt + gi if ok else -1))
            num_gt += len(gt)
        if progress:
            print(f"\rCalculating mAP for {start + len(chunk)} samples...",
                  end="", flush=True)
    pool.shutdown(wait=False)
    if progress:
        print()

    res = _pr_from_valboxes(val_boxes[sweep[0]], num_gt_class, num_gt,
                            classes, pred_time, len(img_paths))
    if extra_ts:
        # the sweep mean covers exactly iou_thresholds — the headline
        # iou_thresh contributes only if the caller included it (so
        # map_mean_iou IS the COCO AP@[.5:.95] for COCO_IOUS regardless
        # of the headline threshold)
        by_iou = {}
        for t in extra_ts:
            by_iou[t] = (res.map if t == sweep[0] else _pr_from_valboxes(
                val_boxes[t], num_gt_class, num_gt, classes,
                pred_time, len(img_paths)).map)
        res.map_by_iou = dict(sorted(by_iou.items()))
        res.map_mean_iou = float(np.mean(list(by_iou.values())))
    return res


def _pr_from_valboxes(val_boxes, num_gt_class, num_gt, classes, pred_time,
                      n_imgs) -> MapResult:
    """PR accumulation + AP integration (detector.cpp:436-549)."""
    val_boxes = sorted(val_boxes, key=lambda v: -v[0])
    n = len(val_boxes)
    tp = np.zeros((classes,), np.int64)
    fp = np.zeros((classes,), np.int64)
    precision = np.zeros((classes, max(n, 1)), np.float64)
    recall = np.zeros((classes, max(n, 1)), np.float64)
    gt_flags = np.zeros(max(num_gt, 1), bool)
    rec_at_50 = prec_at_50 = 0.0

    for i, (p, cid, matched, gt_idx) in enumerate(val_boxes):
        if matched:
            if not gt_flags[gt_idx]:
                gt_flags[gt_idx] = True
                tp[cid] += 1
            else:
                fp[cid] += 1
        else:
            fp[cid] += 1
        denom_p = tp + fp
        fn = num_gt_class - tp
        with np.errstate(divide="ignore", invalid="ignore"):
            precision[:, i] = np.where(denom_p > 0, tp / denom_p, 0.0)
            recall[:, i] = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        if p > 0.5:
            # reference reports the LAST class's PR at the 0.5 crossing —
            # effectively the final class column; replicate with cid=-1
            rec_at_50 = recall[-1, i] * 100
            prec_at_50 = precision[-1, i] * 100

    aps = np.zeros(classes)
    if n:
        for cid in range(classes):
            last_recall = recall[cid, -1]
            last_precision = precision[cid, -1]
            ap = 0.0
            for i in range(n - 1, -1, -1):
                delta = last_recall - recall[cid, i]
                last_recall = recall[cid, i]
                last_precision = max(last_precision, precision[cid, i])
                ap += delta * last_precision
            aps[cid] = ap

    m = float(np.mean(aps)) if classes else 0.0
    return MapResult(
        map=m, per_class_ap=aps, recall=rec_at_50, precision=prec_at_50,
        pred_time_s=pred_time,
        imgs_per_s=n_imgs / pred_time if pred_time > 0 else 0.0,
        n_pred=n, n_gt=num_gt)
