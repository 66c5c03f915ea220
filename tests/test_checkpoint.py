"""Checkpoint/resume tests: exact state round-trip and resumed training
determinism."""

import numpy as np

import jax
import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

import os

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from darknet_tpu.train.step import init_opt_state, make_train_step

CFG = """[net]
width=32
height=32
channels=3
learning_rate=0.01
momentum=0.9
decay=0.0005
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=16
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=3
anchors=8,8, 16,16
iou_loss=ciou
max_delta=5
"""


def test_checkpoint_roundtrip(tmp_path, rng):
    g = build_graph(CFG, train=True)
    params = paramlib.init_params(g, seed=0)
    opt = init_opt_state(g, params)
    step = make_train_step(g, donate=False)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    truths = np.zeros((2, 4, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 1]
    truths = jnp.asarray(truths)
    key = jax.random.PRNGKey(0)

    # 3 warmup steps, checkpoint, 2 more steps -> reference trajectory
    for _ in range(3):
        params, opt, _, _ = step(params, opt, x, truths, key, 0.01)
    path = tmp_path / "state.ckpt.npz"
    save_checkpoint(path, jax.device_get(params), jax.device_get(opt),
                    seen=3 * 2, rng_key=np.asarray(key))
    pa, oa = params, opt
    for _ in range(2):
        pa, oa, ca, _ = step(pa, oa, x, truths, key, 0.01)

    # restore and replay the same 2 steps -> identical result
    params2, opt2, seen, rkey, _extra = load_checkpoint(path, params, opt)
    assert seen == 6
    pb, ob = params2, opt2
    for _ in range(2):
        pb, ob, cb, _ = step(pb, ob, x, truths, key, 0.01)
    np.testing.assert_allclose(float(ca), float(cb), rtol=1e-6)
    for a, b in zip(pa, pb):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-6, atol=1e-7)
    # optimizer momentum buffers restored exactly too
    for a, b in zip(oa["u"], ob["u"]):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-6, atol=1e-7)


def test_sharded_checkpoint_roundtrip_on_mesh(tmp_path, rng):
    """Orbax-backed sharded checkpoint: GSPMD-sharded params/opt round-trip
    with shardings intact and the resumed trajectory replays exactly.
    (On one process this also exercises the exact multi-host code path —
    every process persists only its addressable shards.)"""
    from darknet_tpu import model_zoo
    from darknet_tpu.parallel.tensor import make_tp_mesh, make_tp_train_step
    from darknet_tpu.train.checkpoint import (load_checkpoint_sharded,
                                              save_checkpoint_sharded)

    size, batch = 64, 4
    g = build_graph(model_zoo.yolov4_tiny_cfg(size, size, batch=batch,
                                              subdiv=1), train=True)
    params = paramlib.init_params(g, seed=0)
    opt = init_opt_state(g, params)
    x = rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    truths = np.zeros((batch, 8, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 1]
    key = jax.random.PRNGKey(0)

    mesh = make_tp_mesh(2, 4)
    step, place = make_tp_train_step(g, mesh)
    pm, om, xm, tm = place(params, opt, x, truths)
    pm, om, _, _ = step(pm, om, xm, tm, key, jnp.float32(1e-3))

    ckdir = tmp_path / "sharded_ckpt"
    save_checkpoint_sharded(ckdir, pm, om, seen=batch,
                            rng_key=np.asarray(key),
                            extra={"best_map": 0.25})
    p2, o2, seen, rkey, extra = load_checkpoint_sharded(ckdir, pm, om)
    assert seen == batch
    np.testing.assert_array_equal(np.asarray(rkey), np.asarray(key))

    # shardings preserved and values exact
    flat_a, _ = jax.tree_util.tree_flatten(pm)
    flat_b, _ = jax.tree_util.tree_flatten(p2)
    for a, b in zip(flat_a, flat_b):
        assert b.sharding == a.sharding, (a.shape, b.sharding, a.sharding)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    for a, b in zip(jax.tree_util.tree_leaves(om),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    # resumed trajectory identical to the uninterrupted one
    pa, oa, ca, _ = step(pm, om, xm, tm, key, jnp.float32(1e-3))
    pb, ob, cb, _ = step(p2, o2, xm, tm, key, jnp.float32(1e-3))
    np.testing.assert_allclose(float(cb), float(ca), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    # crash-window recovery + PROMOTION: state stranded at the `.tmp`
    # swap sibling loads under the base name AND is renamed back to it —
    # otherwise the NEXT save's rmtree(tmp) would destroy the newest
    # durable checkpoint before its replacement is complete
    import os
    import shutil

    os.rename(ckdir, str(ckdir) + ".tmp")
    p3, o3, seen3, _, _ = load_checkpoint_sharded(ckdir, pm, om)
    assert seen3 == batch
    assert ckdir.is_dir() and not os.path.exists(str(ckdir) + ".tmp")
    for a, b in zip(jax.tree_util.tree_leaves(pm),
                    jax.tree_util.tree_leaves(p3)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # and the next save over the promoted dir works
    save_checkpoint_sharded(ckdir, p3, o3, seen=2 * batch)
    _, _, seen4, _, _ = load_checkpoint_sharded(ckdir, pm, om)
    assert seen4 == 2 * batch
    shutil.rmtree(ckdir)


def test_trainer_full_state_resume_is_exact(tmp_path):
    """DetectorTrainer writes a rolling full-state checkpoint; a new
    trainer with resume=True must continue the EXACT trajectory of an
    uninterrupted run — optimizer momentum, rng stream and the loader's
    data stream all pick up where the saved run stopped (the reference
    restarts from .weights alone and loses all three)."""
    import cv2

    from darknet_tpu.train.trainer import DetectorTrainer

    ds = tmp_path / "ds"
    ds.mkdir()
    paths = []
    for i in range(4):
        img = np.full((80, 80, 3), 70 + 10 * i, np.uint8)
        cv2.rectangle(img, (20, 20), (60, 60), (200, 90, 40), -1)
        p = str(ds / f"i{i}.jpg")
        cv2.imwrite(p, img)
        open(str(ds / f"i{i}.txt"), "w").write("0 0.5 0.5 0.5 0.5\n")
        paths.append(p)

    cfg = """[net]
batch=2
subdivisions=1
width=32
height=32
channels=3
learning_rate=0.01
momentum=0.9
decay=0.0005
max_epoch=100
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=12
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=1
anchors=12,12, 20,20
iou_loss=ciou
max_delta=5
"""
    mk = lambda resume: DetectorTrainer(
        cfg, paths, classes=1, loader_threads=1, loader_processes=0,
        save_dir=str(tmp_path / "bk"), save_name="r",
        log=lambda *a: None, resume=resume)

    # uninterrupted: 6 iterations
    tr_a = mk(False)
    tr_a.train(max_iters=6)

    # interrupted at 3 (train() writes the rolling state at the end),
    # then a FRESH trainer resumes for the remaining 3
    tr_b = mk(False)
    tr_b.train(max_iters=3)
    tr_c = mk(True)
    assert tr_c.curr_iter == 3
    tr_c.train(max_iters=3)

    for i, (a, c) in enumerate(zip(tr_a.params, tr_c.params)):
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(c[k]),
                err_msg=f"layer {i} {k} diverged across resume")


def test_checkpoint_save_is_atomic(tmp_path):
    """A crash mid-save must not destroy the previous good checkpoint:
    save goes to a tmp file then os.replace's over the old one."""
    from darknet_tpu.train.checkpoint import (load_checkpoint,
                                              save_checkpoint)

    path = tmp_path / "s.ckpt.npz"
    params = [{"w": np.ones((2, 2), np.float32)}]
    opt = {"u": [{"w": np.zeros((2, 2), np.float32)}]}
    save_checkpoint(path, params, opt, seen=7, extra={"avg_loss": 1.5})
    p, o, seen, rng, extra = load_checkpoint(path, params, opt)
    assert seen == 7 and float(extra["avg_loss"]) == 1.5
    assert not (tmp_path / "s.ckpt.npz.tmp").exists()

    # simulate a crash mid-write of the NEXT save: the tmp file exists,
    # the real file still loads the previous state
    (tmp_path / "s.ckpt.npz.tmp").write_bytes(b"garbage-partial-write")
    p, o, seen, rng, extra = load_checkpoint(path, params, opt)
    assert seen == 7


def test_resolve_sharded_dir_crash_window(tmp_path):
    """The sharded save's directory swap (rename path->old; rename
    tmp->path) has a crash window where `path` does not exist; the
    resolver must recover the NEWER completed state from `.tmp`, then
    fall back to `.old`, and must ignore candidates without a finalized
    orbax `state` subdir (a crash mid-save)."""
    from darknet_tpu.train.checkpoint import resolve_sharded_dir

    base = tmp_path / "ck"
    # nothing exists
    assert resolve_sharded_dir(base) is None
    # crash mid-FIRST-save: only an unfinalized tmp (no state subdir)
    (tmp_path / "ck.tmp").mkdir()
    assert resolve_sharded_dir(base) is None
    # crash between the two renames: complete .tmp (new) + .old (previous)
    (tmp_path / "ck.tmp" / "state").mkdir()
    (tmp_path / "ck.old" / "state").mkdir(parents=True)
    assert resolve_sharded_dir(base) == str(tmp_path / "ck.tmp")
    # crash after rename(path->old) on a FIRST save that had no tmp yet
    # is impossible (old only exists if path did), but .old alone loads
    import shutil

    shutil.rmtree(tmp_path / "ck.tmp")
    assert resolve_sharded_dir(base) == str(tmp_path / "ck.old")
    # normal state: path wins over both siblings
    (tmp_path / "ck" / "state").mkdir(parents=True)
    assert resolve_sharded_dir(base) == str(tmp_path / "ck")


def test_trainer_resume_exact_with_multiscale(tmp_path):
    """Exact resume under multi-scale training (random=1): the restored
    dims bucket + absolute-iteration cadence + persisted avg_loss make
    the resumed run pick the SAME resolutions the uninterrupted run did."""
    import cv2

    from darknet_tpu.train.trainer import DetectorTrainer

    ds = tmp_path / "ds"
    ds.mkdir()
    paths = []
    for i in range(4):
        img = np.full((90, 90, 3), 60 + 12 * i, np.uint8)
        cv2.rectangle(img, (25, 25), (65, 65), (180, 100, 60), -1)
        p = str(ds / f"i{i}.jpg")
        cv2.imwrite(p, img)
        open(str(ds / f"i{i}.txt"), "w").write("0 0.5 0.5 0.45 0.45\n")
        paths.append(p)

    cfg = """[net]
batch=2
subdivisions=1
width=32
height=32
channels=3
learning_rate=0.005
momentum=0.9
decay=0.0005
max_epoch=100
resize_step=32
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=12
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=1
anchors=12,12, 20,20
random=1
iou_loss=ciou
max_delta=5
"""
    logs_a, logs_c = [], []
    mk = lambda resume, log: DetectorTrainer(
        cfg, paths, classes=1, loader_threads=1, loader_processes=0,
        save_dir=str(tmp_path / "bk"), save_name="ms",
        log=log, resume=resume)

    tr_a = mk(False, logs_a.append)
    tr_a.train(max_iters=12)

    tr_b = mk(False, lambda *a: None)
    tr_b.train(max_iters=6)
    tr_c = mk(True, logs_c.append)
    assert tr_c.curr_iter == 6
    tr_c.train(max_iters=6)

    # the boundary-10 resize picked the same dims on both sides
    ra = [l for l in logs_a if l.startswith("Resizing:")]
    rc = [l for l in logs_c if l.startswith("Resizing:")]
    assert ra[-1] == rc[-1], (ra, rc)

    for i, (a, c) in enumerate(zip(tr_a.params, tr_c.params)):
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(c[k]),
                err_msg=f"layer {i} {k} diverged across multiscale resume")


def test_trainer_graceful_preemption(tmp_path):
    """SIGTERM during training finishes the iteration, saves the full
    resumable state, and exits cleanly; a -resume run continues from it."""
    import subprocess
    import sys

    import cv2

    ds = tmp_path / "ds"
    ds.mkdir()
    paths = []
    for i in range(4):
        img = np.full((80, 80, 3), 90, np.uint8)
        cv2.rectangle(img, (20, 20), (60, 60), (200, 90, 40), -1)
        p = str(ds / f"i{i}.jpg")
        cv2.imwrite(p, img)
        open(str(ds / f"i{i}.txt"), "w").write("0 0.5 0.5 0.5 0.5\n")
        paths.append(p)

    cfg_path = tmp_path / "m.cfg"
    cfg_path.write_text("""[net]
batch=2
subdivisions=1
width=32
height=32
channels=3
learning_rate=0.01
momentum=0.9
decay=0.0005
max_epoch=5000
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=12
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=1
anchors=12,12, 20,20
""")
    worker = tmp_path / "w.py"
    worker.write_text(f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {repr(REPO_DIR)})
from darknet_tpu.train.trainer import DetectorTrainer
tr = DetectorTrainer(open({repr(str(cfg_path))}).read(), {paths!r},
                     classes=1, loader_threads=1, loader_processes=0,
                     save_dir={repr(str(tmp_path / 'bk'))}, save_name="p")
print("READY", flush=True)
tr.train()          # runs until preempted
print("EXITED_CLEANLY", tr.curr_iter, flush=True)
""")
    import signal
    import time

    proc = subprocess.Popen([sys.executable, str(worker)],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    # wait for a couple of training iterations, then preempt
    deadline = time.time() + 240
    saw_iter = False
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line.startswith("[000") and "loss" in line:
            saw_iter = True
            if "[0002]" in line or "[0003]" in line:
                break
    assert saw_iter
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=240)
    assert proc.returncode == 0, out[-1200:]
    assert "Preempted at iteration" in out
    assert "EXITED_CLEANLY" in out
    assert (tmp_path / "bk" / "p_last.ckpt.npz").exists()
    assert (tmp_path / "bk" / "p_preempt.weights").exists()

    # and the state is resumable
    from darknet_tpu.train.trainer import DetectorTrainer

    tr = DetectorTrainer(cfg_path.read_text(), paths, classes=1,
                         loader_threads=1, loader_processes=0,
                         save_dir=str(tmp_path / "bk"), save_name="p",
                         log=lambda *a: None, resume=True)
    assert tr.curr_iter >= 2
    tr.train(max_iters=1)
