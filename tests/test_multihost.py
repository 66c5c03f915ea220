"""Two-process multi-host (DCN) test — VERDICT r2 action #8.

Launches TWO real OS processes, each owning 4 virtual CPU devices, joined
via `jax.distributed.initialize` (Gloo collectives).  Each process loads
only ITS slice of the global batch (`process_batch_slice`), assembles the
global dp-sharded array with `make_global_batch`
(jax.make_array_from_process_local_data — the GetPartialData analogue,
data.cpp:890-901), and runs ONE DP train step over the 8-device global
mesh.  The resulting params must match a single-process step on the same
global batch, proving the cross-host assembly + psum path end-to-end.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CFG = """[net]
batch=8
subdivisions=1
width=32
height=32
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
burn_in=0
policy=constant
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
anchors=10,14, 23,27
"""

WORKER = r'''
import sys

import jax

jax.config.update("jax_platforms", "cpu")

coord, pid, repo, cfg_path, out_path = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, repo)
from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.parallel import make_dp_train_step, replicate
from darknet_tpu.parallel.multihost import (make_global_batch,
                                            process_batch_slice)
from darknet_tpu.train.step import init_opt_state

graph = build_graph(cfg_path, train=True)
params = paramlib.init_params(graph, seed=5)
opt_state = init_opt_state(graph, params)
mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))

B = 8
rng = np.random.default_rng(99)
x_full = rng.uniform(0, 1, (B, 32, 32, 3)).astype(np.float32)
y_full = np.zeros((B, 90, 5), np.float32)
y_full[:, 0] = [0.5, 0.5, 0.4, 0.4, 0]

start, size = process_batch_slice(B)
x = make_global_batch(mesh, x_full[start:start + size])
y = make_global_batch(mesh, y_full[start:start + size])

step = make_dp_train_step(graph, mesh, donate=False)
import jax.numpy as jnp
key = replicate(mesh, jax.random.PRNGKey(0))
lr = replicate(mesh, jnp.float32(1e-3))
params2, opt2, cost, mets = step(params, opt_state, x, y, key, lr)

if pid == 0:
    flat = {}
    for i, p in enumerate(params2):
        for k, v in p.items():
            flat[f"{i}.{k}"] = np.asarray(
                jax.device_get(v.addressable_data(0)))
    flat["cost"] = np.float32(jax.device_get(cost.addressable_data(0)))
    np.savez(out_path, **flat)
print(f"proc {pid} done", flush=True)
'''


@pytest.mark.skipif(sys.platform != "linux", reason="gloo/linux only")
def test_two_process_dp_step_matches_single_process(tmp_path):
    cfg_path = tmp_path / "m.cfg"
    cfg_path.write_text(CFG)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out_path = tmp_path / "p0.npz"

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(i), repo, str(cfg_path),
         str(out_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    got = np.load(out_path)

    # single-process oracle: one plain train step on the same global batch
    import jax.numpy as jnp

    from darknet_tpu.graph.builder import build_graph
    from darknet_tpu.nn import params as paramlib
    from darknet_tpu.train.step import init_opt_state, make_train_step
    import jax

    graph = build_graph(str(cfg_path), train=True)
    params = paramlib.init_params(graph, seed=5)
    opt_state = init_opt_state(graph, params)
    rng = np.random.default_rng(99)
    x = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    y_full = np.zeros((8, 90, 5), np.float32)
    y_full[:, 0] = [0.5, 0.5, 0.4, 0.4, 0]
    step = make_train_step(graph, donate=False)
    params2, _opt2, cost, _mets = step(params, opt_state, x,
                                       jnp.asarray(y_full),
                                       jax.random.PRNGKey(0),
                                       jnp.float32(1e-3))

    np.testing.assert_allclose(float(got["cost"]), float(cost),
                               rtol=1e-5, atol=1e-5)
    for i, p in enumerate(params2):
        for k, v in p.items():
            np.testing.assert_allclose(
                got[f"{i}.{k}"], np.asarray(v), rtol=1e-5, atol=1e-6,
                err_msg=f"layer {i} param {k}")


CKPT_WORKER = r'''
import sys

import jax

jax.config.update("jax_platforms", "cpu")

coord, pid, repo, cfg_path, ckdir = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, repo)
from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.parallel import make_dp_train_step, replicate
from darknet_tpu.parallel.multihost import (make_global_batch,
                                            process_batch_slice)
from darknet_tpu.train.checkpoint import (load_checkpoint_sharded,
                                          save_checkpoint_sharded)
from darknet_tpu.train.step import init_opt_state

graph = build_graph(cfg_path, train=True)
params = paramlib.init_params(graph, seed=5)
opt_state = init_opt_state(graph, params)
mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))

B = 8
rng = np.random.default_rng(99)
x_full = rng.uniform(0, 1, (B, 32, 32, 3)).astype(np.float32)
y_full = np.zeros((B, 90, 5), np.float32)
y_full[:, 0] = [0.5, 0.5, 0.4, 0.4, 0]
start, size = process_batch_slice(B)
x = make_global_batch(mesh, x_full[start:start + size])
y = make_global_batch(mesh, y_full[start:start + size])

import jax.numpy as jnp
step = make_dp_train_step(graph, mesh, donate=False)
key = replicate(mesh, jax.random.PRNGKey(0))
params2, opt2, cost, mets = step(params, opt_state, x, y, key,
                                 replicate(mesh, jnp.float32(1e-3)))

# every process writes only its own shards; process 0 coordinates
save_checkpoint_sharded(ckdir, params2, opt2, seen=B,
                        rng_key=np.asarray(jax.random.PRNGKey(0)))
p3, o3, seen, rkey, extra = load_checkpoint_sharded(ckdir, params2, opt2)
assert seen == B, seen

# restored shards must equal the live ones on THIS process
for a, b in zip(jax.tree_util.tree_leaves(params2),
                jax.tree_util.tree_leaves(p3)):
    assert b.sharding == a.sharding
    for sa, sb in zip(a.addressable_shards, b.addressable_shards):
        np.testing.assert_array_equal(np.asarray(sb.data),
                                      np.asarray(sa.data))
for a, b in zip(jax.tree_util.tree_leaves(opt2),
                jax.tree_util.tree_leaves(o3)):
    for sa, sb in zip(a.addressable_shards, b.addressable_shards):
        np.testing.assert_array_equal(np.asarray(sb.data),
                                      np.asarray(sa.data))
print(f"proc {pid} ckpt ok", flush=True)
'''


@pytest.mark.skipif(sys.platform != "linux", reason="gloo/linux only")
def test_two_process_sharded_checkpoint_roundtrip(tmp_path):
    """Multi-host sharded checkpoint: two real processes save a
    dp-sharded train state (each persisting only its addressable
    shards, orbax coordinating) and restore it bit-exactly onto the
    same global mesh."""
    cfg_path = tmp_path / "m.cfg"
    cfg_path.write_text(CFG)
    worker = tmp_path / "ckpt_worker.py"
    worker.write_text(CKPT_WORKER)
    ckdir = tmp_path / "ck"

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(i), repo, str(cfg_path),
         str(ckdir)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
        assert "ckpt ok" in o


PREEMPT_WORKER = r'''
import os
import signal
import sys
import threading

import jax

jax.config.update("jax_platforms", "cpu")

coord, pid, repo, cfg_path, datadir = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.device_count() == 8

import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, repo)
from darknet_tpu.train.trainer import DetectorTrainer

paths = sorted(os.path.join(datadir, f) for f in os.listdir(datadir)
               if f.endswith(".png"))
mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))
with open(cfg_path) as f:
    cfg = f.read()
tr = DetectorTrainer(cfg, paths * 16, classes=1, mesh=mesh,
                     save_dir=os.path.join(datadir, "bk"), save_name="m",
                     loader_threads=1, loader_processes=0,
                     log=lambda *a: None)
# the cfg derives max_iter = iter_per_epoch (8) — far fewer iterations
# than the SIGTERM timer needs; pin it so the run outlasts the signal
# (a completed run would restore the default handler and the late kill
# would hard-terminate the process: a false failure)
tr.net.max_iter = 200

# deliver SIGTERM to process 0 ONLY, a beat into the loop: without the
# per-iteration cross-process consensus, process 1 would block forever
# in the step's psum / checkpoint rendezvous
if pid == 0:
    threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
tr.train(max_iters=200)
print(f"proc {pid} stopped at {tr.curr_iter}", flush=True)
tr.loader.close()
'''


@pytest.mark.skipif(sys.platform != "linux", reason="gloo/linux only")
def test_two_process_preemption_consensus(tmp_path):
    """SIGTERM reaching only ONE process must stop BOTH at the same
    iteration boundary (the per-iteration stop-flag allgather), then the
    collective full-state save must complete — instead of process 1
    deadlocking in the step's collectives while process 0 waits at the
    checkpoint rendezvous."""
    import cv2

    cfg_path = tmp_path / "m.cfg"
    cfg_path.write_text(CFG)
    worker = tmp_path / "preempt_worker.py"
    worker.write_text(PREEMPT_WORKER)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        cv2.imwrite(str(tmp_path / f"i{i}.png"), img)
        (tmp_path / f"i{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(i), repo, str(cfg_path),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    stops = []
    for o in outs:
        line = [ln for ln in o.splitlines() if "stopped at" in ln]
        assert line, o
        stops.append(int(line[-1].split()[-1]))
    # both processes agreed on the SAME stop iteration, before the end
    assert stops[0] == stops[1], (stops, outs)
    assert 0 < stops[0] < 200
    # the collective sharded full-state save completed
    from darknet_tpu.train.checkpoint import resolve_sharded_dir

    assert resolve_sharded_dir(tmp_path / "bk" / "m_last.ckpt") is not None
