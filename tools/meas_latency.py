"""Batch-1 serving latency budget (VERDICT r3 #5).

Decomposes the synchronous per-frame p50 at 608 into its components so
the 33 ms bench number stops being unexplained:

  rtt_floor     p50 of a trivial jitted program (scalar add) round trip —
                the axon dev-tunnel dispatch+fetch floor that NO model
                change can beat
  upload        p50 of shipping one (608,608,3) f32 frame host->device
                (measured as upload+tiny-exec+fetch minus rtt_floor)
  device_exec   amortized per-frame device time of the full serving
                program (pipelined dispatch, 30-deep) — what production
                (host co-located with the TPU) would see
  full_sync     p50 of the full serving program, device-resident input,
                one scalar fetched per frame (bench.py's
                p50_latency_ms_batch1_sync)
  e2e_host      p50 from a host numpy frame through _prep_input ->
                submit -> device_out_to_dets (the CLI video path,
                per-frame sync)

plus latency-mode candidates: top_k 64, 416 input, both.

Usage: python tools/meas_latency.py [int8|bf16]
Prints one JSON line with every component in ms.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from darknet_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np
import jax
import jax.numpy as jnp

from darknet_tpu import model_zoo
from darknet_tpu.nn.network import Network

mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
rng = np.random.default_rng(0)


def p50(fn, reps=30, warmup=2):
    for _ in range(warmup):
        fn()
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        lat.append((time.perf_counter() - t0) * 1000)
    return sorted(lat)[len(lat) // 2]


out = {"mode": mode}


def mark(msg):
    print(f"[meas_latency] {msg}  partial={json.dumps(out)}",
          file=sys.stderr, flush=True)


# 1. tunnel floor: trivial program, scalar fetch
mark("rtt floor")
one = jax.device_put(jnp.float32(1.0))
triv = jax.jit(lambda x: x + 1.0)
_ = float(triv(one))
out["rtt_floor_ms"] = round(p50(lambda: float(triv(one))), 2)

mark(f"rtt_floor={out['rtt_floor_ms']} ms; frame upload")
# 2. frame upload: put + first-element fetch, minus the floor
frame = rng.uniform(0, 1, (1, 608, 608, 3)).astype(np.float32)
pick = jax.jit(lambda x: x[0, 0, 0, 0])
_ = float(pick(jax.device_put(frame)))
up = p50(lambda: float(pick(jax.device_put(frame))))
out["upload_608_frame_ms"] = round(up - out["rtt_floor_ms"], 2)

mark(f"upload={out['upload_608_frame_ms']} ms; building 608 net")


# serving nets
def make_net(size):
    net = Network.from_cfg(model_zoo.yolov4_cfg(size, size), seed=0,
                           int8=(mode == "int8"))
    if mode == "int8":
        calib = [rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
                 for _ in range(4)]
        net.calibrate_int8(calib)
    return net


def serve_fn(net, size, top_k):
    fn = net._device_detect_fn(1, size, size, 0.25, 0.45, top_k,
                               score_dtype=jnp.bfloat16)

    @jax.jit
    def run(params, x):
        tb, ov, probs = fn(params, x)
        return tb, ov, probs, jnp.sum(ov.astype(jnp.float32))

    return run


net608 = make_net(608)
x608 = jax.device_put(jnp.asarray(frame))

mark("compiling 608 k256 serving program")
run608 = serve_fn(net608, 608, 256)
_ = float(run608(net608.params, x608)[3])
mark("608 k256 compiled; timing full_sync")
out["full_sync_608_k256_ms"] = round(
    p50(lambda: float(run608(net608.params, x608)[3])), 2)

# amortized device time (pipelined dispatch, one sync per 30)
def amortized(run, params, x, n=30):
    _ = float(run(params, x)[3])
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = run(params, x)
    _ = float(o[3])
    return (time.perf_counter() - t0) / n * 1000


out["device_exec_608_ms"] = round(amortized(run608, net608.params, x608), 2)
mark("e2e host frame")

# e2e from a 720p host camera frame like the CLI video path: host resize
# (resize_image_cv) + normalize -> submit -> materialize the top-k triple
from darknet_tpu.data.image import resize_image_cv

img = rng.uniform(0, 255, (720, 1280, 3)).astype(np.uint8)


def e2e():
    x = resize_image_cv(img.astype(np.float32) / 255.0, 608, 608)
    sub = net608.submit_detect_device(x)
    net608.device_out_to_dets(*sub)


try:
    e2e()
    out["e2e_host_frame_608_ms"] = round(p50(e2e, reps=15), 2)
except Exception as e:  # keep the budget even if the helper signature drifts
    out["e2e_host_frame_608_err"] = f"{type(e).__name__}: {str(e)[:120]}"

# uint8 ingest (the shipped low-latency streaming path): uint8 resize on
# host, raw uint8 upload, normalize on device — 1/4 the H2D bytes
import cv2


def e2e_u8():
    x = cv2.resize(img, (608, 608), interpolation=cv2.INTER_LINEAR)
    sub = net608.submit_detect_device(x)
    net608.device_out_to_dets(*sub)


try:
    e2e_u8()
    out["e2e_u8_frame_608_ms"] = round(p50(e2e_u8, reps=15), 2)
except Exception as e:
    out["e2e_u8_frame_608_err"] = f"{type(e).__name__}: {str(e)[:120]}"

# bare uint8 upload for comparison with the f32 number — the astype
# folds INTO the jitted pick so both measurements have identical
# dispatch structure (device_put + one jitted program + scalar fetch;
# advisor r4 finding)
u8frame = rng.integers(0, 256, (1, 608, 608, 3)).astype(np.uint8)
pick_u8 = jax.jit(lambda x: x.astype(jnp.float32)[0, 0, 0, 0])
_ = float(pick_u8(jax.device_put(u8frame)))
out["upload_608_u8_frame_ms"] = round(
    p50(lambda: float(pick_u8(jax.device_put(u8frame))))
    - out["rtt_floor_ms"], 2)
mark("u8 done; latency-mode candidates")

# latency-mode candidates
mark("compiling 608 k64")
run_k64 = serve_fn(net608, 608, 64)
_ = float(run_k64(net608.params, x608)[3])
out["full_sync_608_k64_ms"] = round(
    p50(lambda: float(run_k64(net608.params, x608)[3])), 2)
out["device_exec_608_k64_ms"] = round(
    amortized(run_k64, net608.params, x608), 2)

mark("compiling 416 k64")
sys.stderr.flush()
net416 = make_net(416)
x416 = jax.device_put(jnp.asarray(
    rng.uniform(0, 1, (1, 416, 416, 3)).astype(np.float32)))
run416 = serve_fn(net416, 416, 64)
_ = float(run416(net416.params, x416)[3])
out["full_sync_416_k64_ms"] = round(
    p50(lambda: float(run416(net416.params, x416)[3])), 2)
out["device_exec_416_k64_ms"] = round(
    amortized(run416, net416.params, x416), 2)

print(json.dumps(out))
