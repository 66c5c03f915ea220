"""Post-optimization training measurements: step time + trace at 608."""
import sys, time
sys.path.insert(0, "/root/repo")
from darknet_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np
import jax, jax.numpy as jnp
from darknet_tpu import model_zoo
from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.train.step import make_train_step, init_opt_state

rng_np = np.random.default_rng(0)
_graphs = {}
def _g(size):
    if size not in _graphs:
        _graphs[size] = build_graph(model_zoo.yolov4_cfg(size, size))
    return _graphs[size]

def run(batch, remat, stem=None, iters=3, label="", act=None, size=608):
    g = _g(size)
    x16 = rng_np.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    tr16 = np.zeros((batch, 90, 5), np.float32); tr16[:, 0] = [0.3, 0.3, 0.2, 0.2, 1]
    params = jax.device_put(paramlib.init_params(g, seed=0))
    opt = jax.device_put(init_opt_state(g, params))
    x = jax.device_put(x16); tr = jax.device_put(tr16)
    step = make_train_step(g, compute_dtype=jnp.bfloat16, remat=remat,
                           stem_train=stem, train_act_dtype=act)
    t0 = time.perf_counter()
    try:
        params, opt, c, m = step(params, opt, x, tr, jax.random.PRNGKey(0), 1e-4)
        c = float(c)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    print(f"{label}: compile+first {time.perf_counter()-t0:.0f}s cost={c:.1f}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt, c, m = step(params, opt, x, tr, jax.random.PRNGKey(1), 1e-4)
        float(c)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label}: {best*1e3:.1f} ms/step  {batch/best:.1f} img/s", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "main"):
    run(16, True, label="b16 remat stem-on (new default)")
if which in ("all", "nostem"):
    run(16, True, stem=False, label="b16 remat stem-off (old path)")
if which in ("all", "act16"):
    run(16, True, act=jnp.bfloat16, label="b16 remat stem-on act-bf16")
if which in ("all", "steps16"):
    run(16, "steps", act=jnp.bfloat16, label="b16 remat-steps stem-on act-bf16")
if which in ("all", "rall16"):
    run(16, "all", act=jnp.bfloat16, label="b16 remat-all stem-on act-bf16")
if which in ("all", "b8"):
    run(8, False, label="b8 no-remat stem-on (fit check)")
if which in ("all", "v416"):
    run(16, False, size=416, label="416 b16 no-remat stem-on")
# round-4 follow-ups: no-remat fit boundary + act16 on no-remat configs
if which in ("all2", "b8a"):
    run(8, False, act=jnp.bfloat16, label="b8 no-remat act-bf16")
if which in ("all2", "b16nr"):
    run(16, False, act=jnp.bfloat16, label="b16 no-remat act-bf16 (fit check)")
if which in ("all2", "b16nrf"):
    run(16, False, label="b16 no-remat f32-act (fit check)")
if which in ("all2", "b32"):
    run(32, True, act=jnp.bfloat16, label="b32 remat act-bf16")

# official training metric (VERDICT r3 #1): ONE JSON line for the
# committed one-chip yolov4-608 recipe.  Keep in sync with the defaults
# in train/trainer.py (compute bf16 on TPU) + the NOTES round-4 matrix.
if which == "bench":
    import json
    g = _g(608)
    batch, remat, act = 8, False, jnp.bfloat16
    x = rng_np.uniform(0, 1, (batch, 608, 608, 3)).astype(np.float32)
    tr = np.zeros((batch, 90, 5), np.float32); tr[:, 0] = [0.3, 0.3, 0.2, 0.2, 1]
    params = jax.device_put(paramlib.init_params(g, seed=0))
    opt = jax.device_put(init_opt_state(g, params))
    xd, td = jax.device_put(x), jax.device_put(tr)
    step = make_train_step(g, compute_dtype=jnp.bfloat16, remat=remat,
                           train_act_dtype=act)
    params, opt, c, m = step(params, opt, xd, td, jax.random.PRNGKey(0), 1e-4)
    float(c)
    # measure in the trainer's ACTUAL dispatch regime (trainer.py
    # metric_lag=3 on TPU): keep 3 steps in flight, fetch step i-3's loss
    # at step i — so the per-step wall includes exactly one deferred
    # metric fetch per iteration, as production training does, instead of
    # a full tunnel-RTT sync every few steps.
    from collections import deque

    best = 1e9
    for _ in range(3):
        pend = deque()
        t0 = time.perf_counter()
        n = 12
        for _ in range(n):
            params, opt, c, m = step(params, opt, xd, td,
                                     jax.random.PRNGKey(1), 1e-4)
            pend.append(c)
            if len(pend) > 3:
                float(pend.popleft())
        while pend:
            float(pend.popleft())
        best = min(best, (time.perf_counter() - t0) / n)
    print(json.dumps({
        "metric": "yolov4-608 training images/sec/chip",
        "train_608_img_s": round(batch / best, 1),
        "ms_per_step": round(best * 1e3, 1),
        "config": f"b{batch} remat={remat} act16={act is not None} "
                  "stem_train=on compute=bf16 metric_lag=3"}))

# per-layer trace of the COMMITTED one-chip recipe (VERDICT r4 #1:
# "re-trace the current step and rank the top 3 costs").  Usage:
#   python tools/meas_train.py trace [top_n]
if which == "trace":
    from darknet_tpu.utils.profiler import trace_report
    g = _g(608)
    batch, remat, act = 8, False, jnp.bfloat16
    x = rng_np.uniform(0, 1, (batch, 608, 608, 3)).astype(np.float32)
    tr = np.zeros((batch, 90, 5), np.float32); tr[:, 0] = [0.3, 0.3, 0.2, 0.2, 1]
    params = jax.device_put(paramlib.init_params(g, seed=0))
    opt = jax.device_put(init_opt_state(g, params))
    xd, td = jax.device_put(x), jax.device_put(tr)
    # donate=False: trace_report replays the compiled call with the SAME
    # argument buffers, which donation would delete after the first call.
    step = make_train_step(g, compute_dtype=jnp.bfloat16, remat=remat,
                           train_act_dtype=act, donate=False, jit=False)

    def one(params, opt, x, tr):
        p, o, c, m = step(params, opt, x, tr, jax.random.PRNGKey(1), 1e-4)
        # keep EVERY output live — returning only the cost lets XLA
        # dead-code-eliminate the whole backward+update (measured: the
        # "trace" then shows just the 23 ms forward of a 69 ms step)
        acc = c.astype(jnp.float32)
        for leaf in jax.tree.leaves((p, o)):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    trace_report(one, params, opt, xd, td, graph=g, iters=5, top=top)

# upload A/B (round 4): does the per-iteration host->device batch ship
# sit on the training critical path over the tunnel, and does casting to
# bf16 ON HOST (bit-identical: the stem casts to compute_dtype at the
# first conv anyway) buy it back?  Feeds a FRESH host batch every
# iteration like real training (bench above uses a device-resident
# batch), same metric_lag=3 dispatch regime.
if which == "upload":
    import json
    import ml_dtypes
    from collections import deque

    g = _g(608)
    batch = 8
    step = make_train_step(g, compute_dtype=jnp.bfloat16, remat=False,
                           train_act_dtype=jnp.bfloat16)
    tr = np.zeros((batch, 90, 5), np.float32); tr[:, 0] = [0.3, 0.3, 0.2, 0.2, 1]
    td = jax.device_put(tr)
    # 4 distinct host batches cycled so no caching effects; pre-built so
    # the loader cost isn't measured (the double buffer overlaps it)
    xs_f32 = [rng_np.uniform(0, 1, (batch, 608, 608, 3)).astype(np.float32)
              for _ in range(4)]
    xs_bf16 = [x.astype(ml_dtypes.bfloat16) for x in xs_f32]

    out = {"metric": "608 b8 train step with per-iter host batch upload"}
    for name, xs in (("f32_upload", xs_f32), ("bf16_upload", xs_bf16)):
        # fresh state per branch (step donates params/opt buffers)
        p2 = jax.device_put(paramlib.init_params(g, seed=0))
        o2 = jax.device_put(init_opt_state(g, p2))
        # warmup/compile for this input dtype
        p2, o2, c, m = step(p2, o2, jnp.asarray(xs[0]), td,
                            jax.random.PRNGKey(0), 1e-4)
        float(c)
        best = 1e9
        for _ in range(3):
            pend = deque()
            t0 = time.perf_counter()
            n = 12
            for i in range(n):
                p2, o2, c, m = step(p2, o2, jnp.asarray(xs[i % 4]), td,
                                    jax.random.PRNGKey(1), 1e-4)
                pend.append(c)
                if len(pend) > 3:
                    float(pend.popleft())
            while pend:
                float(pend.popleft())
            best = min(best, (time.perf_counter() - t0) / n)
        out[name + "_ms"] = round(best * 1e3, 1)
        out[name + "_img_s"] = round(batch / best, 1)
        # host-cast cost for reference (overlappable in the loader)
        t0 = time.perf_counter()
        _ = xs_f32[0].astype(ml_dtypes.bfloat16)
        out.setdefault("host_cast_ms", round((time.perf_counter() - t0) * 1e3, 1))
    print(json.dumps(out))
