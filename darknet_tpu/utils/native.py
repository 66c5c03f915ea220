"""ctypes loader for the native host kernels (darknet_tpu/_native).

Builds the shared library on first use (g++ -O3 -march=native) and caches
it next to the source — or, when the package directory is not writable
(installed wheel), under ``~/.cache/darknet_tpu``.  The source ships as
package data so an installed wheel keeps the native path; every consumer
falls back to the pure-numpy implementation when no toolchain is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "_native",
                    "yolo_host.cpp")


_CFLAGS = ["-O3", "-march=native", "-shared", "-fPIC"]


def _out_path(src: str, src_bytes: bytes) -> str:
    """Build target next to the source, or in a user cache dir when the
    package is installed read-only.  The filename carries a hash of the
    source + compiler flags: wheel mtimes are not version-ordered (and
    the cache dir may be shared across venvs with different package
    versions), so content is the only safe cache key."""
    import hashlib

    tag = hashlib.sha256(src_bytes + b"\0"
                         + " ".join(_CFLAGS).encode()).hexdigest()[:16]
    name = f"libyolo_host-{tag}.so"
    if os.access(os.path.dirname(src), os.W_OK):
        return os.path.join(os.path.dirname(src), name)
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.expanduser("~/.cache")), "darknet_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, name)


def load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    try:
        with open(src, "rb") as f:
            src_bytes = f.read()
        out = _out_path(src, src_bytes)
        if not os.path.exists(out):
            # compile to a private temp name and rename: concurrent
            # first-use processes (pytest workers, example subprocesses)
            # must never dlopen a half-linked file
            tmp = f"{out}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", *_CFLAGS, src, "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, out)
        lib = ctypes.CDLL(out)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.yolo_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_float, ctypes.c_int,
                                 ctypes.c_float]
        lib.yolo_iou_matrix.argtypes = [f32p, ctypes.c_int, f32p,
                                        ctypes.c_int, f32p]
        lib.yolo_match_dets.argtypes = [f32p, f32p, ctypes.c_int,
                                        ctypes.c_int, f32p, ctypes.c_int,
                                        ctypes.c_float, f32p]
        lib.yolo_match_dets.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def nms_native(boxes: np.ndarray, probs: np.ndarray, thresh: float,
               kind: str = "greedynms", beta: float = 0.6):
    """In-place-semantics native NMS; returns suppressed probs copy or None
    if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    probs = np.ascontiguousarray(probs, dtype=np.float32).copy()
    n, c = probs.shape
    lib.yolo_nms(_ptr(boxes), _ptr(probs), n, c, thresh,
                 0 if kind == "greedynms" else 1, beta)
    return probs


def match_dets_native(dets: np.ndarray, det_probs: np.ndarray,
                      gt: np.ndarray, iou_thresh: float):
    """Native greedy det->GT matching; returns (prob, cid, gt_idx,
    best_iou) rows or None if unavailable.  Matching at iou_thresh=0
    serves every higher threshold: matched-at-t == best_iou > t with the
    same gt_idx (see yolo_host.cpp)."""
    lib = load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    det_probs = np.ascontiguousarray(det_probs, dtype=np.float32)
    gt = np.ascontiguousarray(gt, dtype=np.float32)
    nd, nc = det_probs.shape
    ng = gt.shape[0]
    out = np.zeros((nd * nc, 4), np.float32)
    rows = lib.yolo_match_dets(_ptr(dets), _ptr(det_probs), nd, nc,
                               _ptr(gt), ng, iou_thresh, _ptr(out))
    return out[:rows]
