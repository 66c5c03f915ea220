"""Golden numpy model of the reference YOLO training loss.

A literal, loop-for-loop port of ForwardYoloLayer's training section
(yolo_layer.cpp:430-757), delta_yolo_box (:172-273), delta_yolo_class
(:295-362), averages_yolo_deltas (:275-293) and Box::DxIou
(box.cpp:153-351), operating on darknet CHW-flat arrays.  Used only by
tests to validate the vectorized device implementation.
"""

from __future__ import annotations

import math

import numpy as np


def logistic(x):
    return 1.0 / (1.0 + np.exp(-x))


def box_iou(a, b):
    def inter(a, b):
        l1, l2 = a[0] - a[2] / 2, b[0] - b[2] / 2
        r1, r2 = a[0] + a[2] / 2, b[0] + b[2] / 2
        w = min(r1, r2) - max(l1, l2)
        t1, t2 = a[1] - a[3] / 2, b[1] - b[3] / 2
        b1, b2 = a[1] + a[3] / 2, b[1] + b[3] / 2
        h = min(b1, b2) - max(t1, t2)
        if w < 0 or h < 0:
            return 0.0
        return w * h

    i = inter(a, b)
    u = a[2] * a[3] + b[2] * b[3] - i
    eps = np.finfo(np.float32).eps
    if abs(i) < eps or abs(u) < eps:
        return 0.0
    return i / u


def box_giou(a, b):
    le = min(a[0] - a[2] / 2, b[0] - b[2] / 2)
    r = max(a[0] + a[2] / 2, b[0] + b[2] / 2)
    t = min(a[1] - a[3] / 2, b[1] - b[3] / 2)
    bo = max(a[1] + a[3] / 2, b[1] + b[3] / 2)
    c = (r - le) * (bo - t)
    iou = box_iou(a, b)
    if abs(c) < np.finfo(np.float32).eps:
        return iou
    i = 0.0
    # union
    def inter(a, b):
        l1, l2 = a[0] - a[2] / 2, b[0] - b[2] / 2
        r1, r2 = a[0] + a[2] / 2, b[0] + b[2] / 2
        w = min(r1, r2) - max(l1, l2)
        t1, t2 = a[1] - a[3] / 2, b[1] - b[3] / 2
        b1, b2 = a[1] + a[3] / 2, b[1] + b[3] / 2
        h = min(b1, b2) - max(t1, t2)
        return 0.0 if (w < 0 or h < 0) else w * h

    u = a[2] * a[3] + b[2] * b[3] - inter(a, b)
    return iou - (c - u) / c


def box_diou(a, b, beta=0.6):
    le = min(a[0] - a[2] / 2, b[0] - b[2] / 2)
    r = max(a[0] + a[2] / 2, b[0] + b[2] / 2)
    t = min(a[1] - a[3] / 2, b[1] - b[3] / 2)
    bo = max(a[1] + a[3] / 2, b[1] + b[3] / 2)
    w, h = r - le, bo - t
    c = w * w + h * h
    iou = box_iou(a, b)
    if abs(c) < np.finfo(np.float32).eps:
        return iou
    d = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
    return iou - (d / c) ** beta


def box_ciou(a, b):
    le = min(a[0] - a[2] / 2, b[0] - b[2] / 2)
    r = max(a[0] + a[2] / 2, b[0] + b[2] / 2)
    t = min(a[1] - a[3] / 2, b[1] - b[3] / 2)
    bo = max(a[1] + a[3] / 2, b[1] + b[3] / 2)
    w, h = r - le, bo - t
    c = w * w + h * h
    iou = box_iou(a, b)
    if abs(c) < np.finfo(np.float32).eps:
        return iou
    u = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
    d = u / c
    ar_gt = b[2] / b[3]
    ar_pred = a[2] / a[3]
    ar_loss = 4 / (math.pi ** 2) * (math.atan(ar_gt) - math.atan(ar_pred)) ** 2
    alpha = ar_loss / (1 - iou + ar_loss + 0.000001)
    return iou - (d + alpha * ar_loss)


def dx_box_iou(pred, gt, kind):
    """Literal port of Box::DxIou.  Returns (dx, dy, dw, dh)."""
    px, py, pw, ph = pred
    gx, gy, gw, gh = gt
    pt = min(py - ph / 2, py + ph / 2)
    pb = max(py - ph / 2, py + ph / 2)
    pl = min(px - pw / 2, px + pw / 2)
    pr = max(px - pw / 2, px + pw / 2)
    gt_t, gt_b = gy - gh / 2, gy + gh / 2
    gt_l, gt_r = gx - gw / 2, gx + gw / 2

    X = (pb - pt) * (pr - pl)
    Xhat = (gt_b - gt_t) * (gt_r - gt_l)
    Ih = min(pb, gt_b) - max(pt, gt_t)
    Iw = min(pr, gt_r) - max(pl, gt_l)
    I = Iw * Ih
    U = X + Xhat - I
    S = (px - gx) ** 2 + (py - gy) ** 2
    giou_Cw = max(pr, gt_r) - min(pl, gt_l)
    giou_Ch = max(pb, gt_b) - min(pt, gt_t)
    giou_C = giou_Cw * giou_Ch

    dX_t, dX_b = -(pr - pl), (pr - pl)
    dX_l, dX_r = -(pb - pt), (pb - pt)
    dI_t = -Iw if pt > gt_t else 0.0
    dI_b = Iw if pb < gt_b else 0.0
    dI_l = -Ih if pl > gt_l else 0.0
    dI_r = Ih if pr < gt_r else 0.0
    dU_t, dU_b = dX_t - dI_t, dX_b - dI_b
    dU_l, dU_r = dX_l - dI_l, dX_r - dI_r
    dC_t = -giou_Cw if pt < gt_t else 0.0
    dC_b = giou_Cw if pb > gt_b else 0.0
    dC_l = -giou_Ch if pl < gt_l else 0.0
    dC_r = giou_Ch if pr > gt_r else 0.0

    p_dt = p_db = p_dl = p_dr = 0.0
    if U > 0:
        p_dt = (U * dI_t - I * dU_t) / (U * U)
        p_db = (U * dI_b - I * dU_b) / (U * U)
        p_dl = (U * dI_l - I * dU_l) / (U * U)
        p_dr = (U * dI_r - I * dU_r) / (U * U)
    # corner-swap quirk (sequential assignment in the C)
    p_dt = p_dt if (py - ph / 2) < (py + ph / 2) else p_db
    p_db = p_db if (py - ph / 2) < (py + ph / 2) else p_dt
    p_dl = p_dl if (px - pw / 2) < (px + pw / 2) else p_dr
    p_dr = p_dr if (px - pw / 2) < (px + pw / 2) else p_dl

    if kind == "giou":
        if giou_C > 0:
            p_dt += (giou_C * dU_t - U * dC_t) / (giou_C * giou_C)
            p_db += (giou_C * dU_b - U * dC_b) / (giou_C * giou_C)
            p_dl += (giou_C * dU_l - U * dC_l) / (giou_C * giou_C)
            p_dr += (giou_C * dU_r - U * dC_r) / (giou_C * giou_C)
        if Iw <= 0 or Ih <= 0:
            p_dt = (giou_C * dU_t - U * dC_t) / (giou_C * giou_C)
            p_db = (giou_C * dU_b - U * dC_b) / (giou_C * giou_C)
            p_dl = (giou_C * dU_l - U * dC_l) / (giou_C * giou_C)
            p_dr = (giou_C * dU_r - U * dC_r) / (giou_C * giou_C)

    Ct = min(py - ph / 2, gy - gh / 2)
    Cb = max(py + ph / 2, gy + gh / 2)
    Cl = min(px - pw / 2, gx - gw / 2)
    Cr = max(px + pw / 2, gx + gw / 2)
    Cw, Ch = Cr - Cl, Cb - Ct
    C = Cw * Cw + Ch * Ch

    dCt_dy = 1.0 if pt < gt_t else 0.0
    dCt_dh = -0.5 if pt < gt_t else 0.0
    dCb_dy = 1.0 if pb > gt_b else 0.0
    dCb_dh = 0.5 if pb > gt_b else 0.0
    dCl_dx = 1.0 if pl < gt_l else 0.0
    dCl_dw = -0.5 if pl < gt_l else 0.0
    dCr_dx = 1.0 if pr > gt_r else 0.0
    dCr_dw = 0.5 if pr > gt_r else 0.0
    dCw_dx, dCw_dw = dCr_dx - dCl_dx, dCr_dw - dCl_dw
    dCh_dy, dCh_dh = dCb_dy - dCt_dy, dCb_dh - dCt_dh

    p_dx = p_dl + p_dr
    p_dy = p_dt + p_db
    p_dw = p_dr - p_dl
    p_dh = p_db - p_dt

    if kind in ("diou", "ciou"):
        if kind == "ciou":
            ar_gt = gw / gh
            ar_pred = pw / ph
            ar_loss = 4 / (math.pi ** 2) * \
                (math.atan(ar_gt) - math.atan(ar_pred)) ** 2
            alpha = ar_loss / (1 - I / U + ar_loss + 0.000001)
            ar_dw = 8 / (math.pi ** 2) * \
                (math.atan(ar_gt) - math.atan(ar_pred)) * ph
            ar_dh = -8 / (math.pi ** 2) * \
                (math.atan(ar_gt) - math.atan(ar_pred)) * pw
        if C > 0:
            ddx = (2 * (gx - px) * C - (2 * Cw * dCw_dx + 2 * Ch * 0) * S) / (C * C)
            ddy = (2 * (gy - py) * C - (2 * Cw * 0 + 2 * Ch * dCh_dy) * S) / (C * C)
            ddw = (2 * Cw * dCw_dw + 2 * Ch * 0) * S / (C * C)
            ddh = (2 * Cw * 0 + 2 * Ch * dCh_dh) * S / (C * C)
            if kind == "ciou":
                ddw += alpha * ar_dw
                ddh += alpha * ar_dh
            p_dx += ddx
            p_dy += ddy
            p_dw += ddw
            p_dh += ddh
            if Iw <= 0 or Ih <= 0:
                p_dx, p_dy, p_dw, p_dh = ddx, ddy, ddw, ddh
    return p_dx, p_dy, p_dw, p_dh


class GoldenYolo:
    """State for one head; arrays darknet CHW-flat, single batch item."""

    def __init__(self, l, net_w, net_h):
        self.l = l
        self.net_w = net_w
        self.net_h = net_h
        self.stride = l.out_w * l.out_h

    def entry(self, a, loc, entry):
        l = self.l
        return a * self.stride * (4 + l.classes + 1) + entry * self.stride + loc

    def get_box(self, out, n_anchor, idx, i, j):
        l, st = self.l, self.stride
        bx = (i + out[idx + 0 * st]) / l.out_w
        by = (j + out[idx + 1 * st]) / l.out_h
        bw = math.exp(out[idx + 2 * st]) * l.anchors[2 * n_anchor] / self.net_w
        bh = math.exp(out[idx + 3 * st]) * l.anchors[2 * n_anchor + 1] / self.net_h
        return np.array([bx, by, bw, bh], np.float64)

    def activate(self, raw_flat):
        l, st = self.l, self.stride
        out = raw_flat.astype(np.float64).copy()
        for a in range(l.n):
            i0 = self.entry(a, 0, 0)
            out[i0:i0 + 2 * st] = logistic(out[i0:i0 + 2 * st])
            out[i0:i0 + 2 * st] = out[i0:i0 + 2 * st] * l.scale_x_y \
                - 0.5 * (l.scale_x_y - 1)
            i4 = self.entry(a, 0, 4)
            out[i4:i4 + (1 + l.classes) * st] = \
                logistic(out[i4:i4 + (1 + l.classes) * st])
        return out

    def delta_box(self, truth, out, n_anchor, idx, i, j, delta, scale,
                  normalizer):
        l, st = self.l, self.stride
        pred = self.get_box(out, n_anchor, idx, i, j)
        ious = {
            "iou": box_iou(pred, truth),
            "giou": box_giou(pred, truth),
            "diou": box_diou(pred, truth),
            "ciou": box_ciou(pred, truth),
        }
        if pred[2] == 0:
            pred[2] = 1.0
        if pred[3] == 0:
            pred[3] = 1.0
        if l.iou_loss == "mse":
            tx = truth[0] * l.out_w - i
            ty = truth[1] * l.out_h - j
            tw = math.log(truth[2] * self.net_w / l.anchors[2 * n_anchor])
            th = math.log(truth[3] * self.net_h / l.anchors[2 * n_anchor + 1])
            delta[idx + 0 * st] += scale * (tx - out[idx + 0 * st]) * normalizer
            delta[idx + 1 * st] += scale * (ty - out[idx + 1 * st]) * normalizer
            delta[idx + 2 * st] += scale * (tw - out[idx + 2 * st]) * normalizer
            delta[idx + 3 * st] += scale * (th - out[idx + 3 * st]) * normalizer
        else:
            dx, dy, dw, dh = dx_box_iou(pred, truth, l.iou_loss)
            dw *= math.exp(out[idx + 2 * st])
            dh *= math.exp(out[idx + 3 * st])
            vals = []
            for v in (dx, dy, dw, dh):
                v *= normalizer
                if not np.isfinite(v):
                    v = 0.0
                if l.max_delta != float("inf"):
                    v = max(min(v, l.max_delta), -l.max_delta)
                vals.append(v)
            delta[idx + 0 * st] += vals[0]
            delta[idx + 1 * st] += vals[1]
            delta[idx + 2 * st] += vals[2]
            delta[idx + 3 * st] += vals[3]
        return ious

    def delta_class(self, out, delta, idx, class_id, class_mult):
        l, st = self.l, self.stride
        eps = l.label_smooth_eps
        if delta[idx + st * class_id]:
            y_true = 1 * (1 - eps) + 0.5 * eps if eps else 1.0
            rd = y_true - out[idx + st * class_id]
            if np.isfinite(rd):
                delta[idx + st * class_id] = rd
            if class_mult is not None:
                delta[idx + st * class_id] *= class_mult
            return
        for n in range(l.classes):
            y_true = (1.0 if n == class_id else 0.0)
            if eps:
                y_true = y_true * (1 - eps) + 0.5 * eps
            rd = y_true - out[idx + st * n]
            if np.isfinite(rd):
                delta[idx + st * n] = rd
            if class_mult is not None and n == class_id:
                delta[idx + st * class_id] *= class_mult

    def forward_train(self, raw_flat, truths):
        """Full training pass for one batch item.

        raw_flat: darknet CHW-flat (A*(5+C)*H*W,), truths: (T,5).
        Returns (delta_flat, cost, counters).
        """
        l, st = self.l, self.stride
        w, h = l.out_w, l.out_h
        out = self.activate(raw_flat)
        delta = np.zeros_like(out)
        T = truths.shape[0]
        cm = l.classes_multipliers

        tot = dict(iou=0.0, giou=0.0, iou_loss=0.0, giou_loss=0.0,
                   count=0, class_count=0, obj=0.0, cat=0.0, anyobj=0.0,
                   recall50=0.0, recall75=0.0)

        for j in range(h):
            for i in range(w):
                for a in range(l.n):
                    box_idx = self.entry(a, j * w + i, 0)
                    pred = self.get_box(out, l.mask[a], box_idx, i, j)
                    best_match_iou = 0.0
                    best_iou = 0.0
                    best_t = 0
                    for t in range(T):
                        truth = truths[t, :4]
                        cid = int(truths[t, 4])
                        if cid >= l.classes or cid < 0:
                            continue
                        if not truth[0]:
                            break
                        cls_idx = self.entry(a, j * w + i, 5)
                        obj_idx = self.entry(a, j * w + i, 4)
                        if not np.isfinite(out[obj_idx]):
                            out[obj_idx] = 0
                        match = any(out[cls_idx + st * k] > 0.25
                                    for k in range(l.classes))
                        iou = box_iou(pred, truth)
                        if iou > best_match_iou and match:
                            best_match_iou = iou
                        if iou > best_iou:
                            best_iou = iou
                            best_t = t
                    obj_idx = self.entry(a, j * w + i, 4)
                    tot["anyobj"] += out[obj_idx]
                    delta[obj_idx] = l.cls_normalizer * (0 - out[obj_idx])
                    if best_match_iou > l.ignore_thresh:
                        delta[obj_idx] = 0
                    if best_iou > l.truth_thresh:
                        delta[obj_idx] = l.cls_normalizer * (1 - out[obj_idx])
                        cid = int(truths[best_t, 4])
                        cls_idx = self.entry(a, j * w + i, 5)
                        self.delta_class(out, delta, cls_idx, cid,
                                         cm[cid] if cm else None)
                        truth = truths[best_t, :4]
                        cmul = cm[cid] if cm else 1.0
                        self.delta_box(truth, out, l.mask[a], box_idx, i, j,
                                       delta, 2 - truth[2] * truth[3],
                                       l.iou_normalizer * cmul)

        for t in range(T):
            truth = truths[t, :4]
            cid = int(truths[t, 4])
            if cid >= l.classes or cid < 0:
                continue
            if not truth[0]:
                break
            i = int(truth[0] * w)
            j = int(truth[1] * h)
            shift = np.array([0.0, 0.0, truth[2], truth[3]])
            best_iou, best_n = 0.0, 0
            for n in range(l.total):
                pr = np.array([0.0, 0.0, l.anchors[2 * n] / self.net_w,
                               l.anchors[2 * n + 1] / self.net_h])
                iou = box_iou(pr, shift)
                if iou > best_iou:
                    best_iou, best_n = iou, n

            def apply(n_anchor):
                mask_n = list(l.mask).index(n_anchor) \
                    if n_anchor in l.mask else -1
                if mask_n < 0:
                    return
                cmul = cm[cid] if cm else 1.0
                box_idx = self.entry(mask_n, j * w + i, 0)
                ious = self.delta_box(
                    truth, out, n_anchor, box_idx, i, j, delta,
                    2 - truth[2] * truth[3], l.iou_normalizer * cmul)
                tot["iou"] += ious["iou"]
                tot["iou_loss"] += 1 - ious["iou"]
                tot["giou"] += ious["giou"]
                tot["giou_loss"] += 1 - ious["giou"]
                obj_idx = self.entry(mask_n, j * w + i, 4)
                tot["obj"] += out[obj_idx]
                delta[obj_idx] = cmul * l.cls_normalizer * (1 - out[obj_idx])
                cls_idx = self.entry(mask_n, j * w + i, 5)
                tot["cat"] += out[cls_idx + st * cid]
                self.delta_class(out, delta, cls_idx, cid,
                                 cm[cid] if cm else None)
                tot["count"] += 1
                tot["class_count"] += 1
                if ious["iou"] > 0.5:
                    tot["recall50"] += 1
                if ious["iou"] > 0.75:
                    tot["recall75"] += 1

            apply(best_n)
            for n in range(l.total):
                if n != best_n and l.iou_thresh < 1.0:
                    pr = np.array([0.0, 0.0, l.anchors[2 * n] / self.net_w,
                                   l.anchors[2 * n + 1] / self.net_h])
                    kind = {"iou": box_iou, "giou": box_giou,
                            "diou": box_diou, "ciou": box_ciou,
                            "mse": box_iou}[l.iou_thresh_kind]
                    if kind(pr, shift) > l.iou_thresh:
                        apply(n)

        # averages_yolo_deltas
        for j in range(h):
            for i in range(w):
                for a in range(l.n):
                    box_idx = self.entry(a, j * w + i, 0)
                    cls_idx = self.entry(a, j * w + i, 5)
                    cnt = sum(1 for c in range(l.classes)
                              if delta[cls_idx + st * c] > 0)
                    if cnt > 0:
                        for k in range(4):
                            delta[box_idx + k * st] /= cnt
        return delta, tot
