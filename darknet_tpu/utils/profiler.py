"""Per-layer cost reports — the `-benchmark_layers` equivalent
(network_kernels.cu:27-114: per-layer wall time with device sync, EMA 0.9,
sorted report).

Two tools:

* `trace_report` (PREFERRED): runs the program under `jax.profiler.trace`,
  joins the device-stream op durations against the compiled HLO's
  `op_name` metadata (which carries the emitter's per-layer
  `jax.named_scope` tags, nn/emit.py), and prints the reference's sorted
  per-layer table.  This measures the REAL fused program on-device —
  reliable over the axon tunnel where wall-clock differencing is not.
* `benchmark_layers` (legacy approximation): compiles a prefix program per
  checkpoint and differences wall times.  Marginals can go negative when
  compile-service latency dominates (NOTES.md); use trace_report instead
  whenever a profiler trace is available.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import time

import numpy as np

import jax
import jax.numpy as jnp

from darknet_tpu.nn.emit import make_forward


def _hlo_op_scopes(compiled_text: str) -> dict:
    """Map each HLO op id -> the emitter's layer scope from its op_name
    metadata (e.g. op_name="jit(f)/L042_convolutional/conv_general...")."""
    scopes = {}
    for m in re.finditer(
            r"%?([\w.\-]+) = .*?metadata=\{[^}]*?op_name=\"([^\"]+)\"",
            compiled_text):
        op, op_name = m.group(1), m.group(2)
        s = re.search(r"(L\d{3}(?:-\d{3})?_[\w]+)", op_name)
        if s is None:
            # non-layer scopes from the train step: optimizer_update /
            # head_delta_N (train/step.py) — keeps "(other)" honest
            s = re.search(r"((?:optimizer_update|head_delta_\d+))", op_name)
        scopes[op] = s.group(1) if s else None
    return scopes


def trace_report(fn, *args, graph=None, iters: int = 5, log=print,
                 trace_dir: str | None = None, top: int = 0):
    """Profile `fn(*args)` on its device and print a sorted per-layer cost
    table (the -benchmark_layers contract, network_kernels.cu:92-113).

    fn is jitted if it isn't already; the first call compiles.  Each HLO
    op's device duration is attributed to the cfg layer whose
    `jax.named_scope` tag (nn/emit.py) appears in its op_name metadata;
    unattributed time is reported as "(other)".  When `graph` is given the
    table also shows each layer's static BFLOPs (parser.cpp:1461).

    Returns a list of (scope, ms_per_iter, bflops) sorted descending.
    """
    import shutil
    import tempfile

    jfn = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    compiled = jfn.lower(*args).compile()
    scopes = _hlo_op_scopes(compiled.as_text())

    # run the AOT-compiled executable directly — calling jfn would compile
    # a second time through the jit dispatch cache.
    # device_get (a real D2H fetch) instead of block_until_ready: over the
    # axon tunnel block_until_ready returns EARLY, closing the trace with
    # iterations still in flight and undercounting every op ~proportionally
    # (observed 25 ms total for a 74.5 ms step).  The device queue is FIFO,
    # so fetching the last call's outputs proves all prior calls ran.
    r = compiled(*args)                 # warm
    jax.device_get(r)
    tdir = trace_dir or tempfile.mkdtemp(prefix="dk_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            r = compiled(*args)
        jax.device_get(r)

    files = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise RuntimeError(f"no trace produced under {tdir}")
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    if trace_dir is None:
        shutil.rmtree(tdir, ignore_errors=True)   # traces can be 100s of MB

    # Two trace schemas:
    #  * CPU backend: per-op events carry args.hlo_op on a host pid.
    #  * TPU (xprof): events on the device pid's "XLA Ops" thread; the
    #    event NAME is the HLO op id, args has hlo_category/long_name
    #    but no hlo_op, and "XLA Modules" rows are whole-program spans
    #    (excluded — they'd double-count the total).
    dev_pids = set()
    op_tids = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        a = e.get("args") or {}
        if e.get("name") == "process_name" and \
                str(a.get("name", "")).startswith("/device:"):
            dev_pids.add(e["pid"])
        if e.get("name") == "thread_name":
            op_tids[(e["pid"], e.get("tid"))] = a.get("name", "")

    per_op: dict = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args") or {}
        op = a.get("hlo_op")
        if not op and e.get("pid") in dev_pids:
            tname = op_tids.get((e["pid"], e.get("tid")), "")
            if "XLA Ops" in tname:
                op = e.get("name")
        if not op:
            continue
        per_op[op] += e["dur"]          # microseconds

    per_scope: dict = collections.Counter()
    for op, dur in per_op.items():
        per_scope[scopes.get(op) or "(other)"] += dur

    bflops = {}
    if graph is not None:
        for l in graph.layers:
            for key in per_scope:
                if key.startswith(f"L{l.index:03d}_"):
                    bflops[key] = l.bflops
                elif "-" in key and key.startswith("L"):
                    m = re.match(r"L(\d{3})-(\d{3})_", key)
                    if m and m.group(1) <= f"{l.index:03d}" <= m.group(2):
                        bflops[key] = bflops.get(key, 0.0) + l.bflops

    rows = sorted(((k, v / iters / 1000.0, bflops.get(k, 0.0))
                   for k, v in per_scope.items()),
                  key=lambda r: -r[1])
    total_ms = sum(r[1] for r in rows)
    log(f"{'layer':<28} {'ms/iter':>9} {'%':>6} {'BFLOPs':>8} {'TFLOP/s':>8}")
    shown = rows[:top] if top else rows
    for k, ms, bf in shown:
        tf = (bf / ms) if ms > 0 else 0.0   # BFLOP/ms == TFLOP/s
        log(f"{k:<28} {ms:9.3f} {100 * ms / max(total_ms, 1e-9):5.1f}% "
            f"{bf:8.2f} {tf:8.1f}")
    log(f"{'TOTAL (device)':<28} {total_ms:9.3f}")
    return rows


def benchmark_layers(graph, params, *, batch: int = 1, compute_dtype=None,
                     fused_bn: bool = True, iters: int = 5,
                     checkpoints: list | None = None, log=print):
    """LEGACY approximation — prefer trace_report.  Times prefix programs
    at `checkpoints` (default: every 10th layer + heads) and prints a
    marginal-cost table; marginals can go negative over remote-compile
    tunnels.  Returns list of (layer_range, ms, bflops)."""
    n = len(graph.layers)
    if checkpoints is None:
        checkpoints = sorted(
            set(list(range(9, n, 10)) + [l.index for l in graph.heads()] +
                [n - 1]))
    fwd = make_forward(graph, compute_dtype=compute_dtype, fused_bn=fused_bn)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (batch, graph.net.h, graph.net.w, graph.net.c)
    ).astype(np.float32))

    # prefix programs: re-emit with a truncated graph
    import copy

    times = []
    prev_t = 0.0
    prev_i = -1
    for ci in checkpoints:
        sub = copy.copy(graph)
        sub.layers = graph.layers[: ci + 1]
        # drop dangling head bookkeeping beyond the cut
        f = make_forward(sub, compute_dtype=compute_dtype, fused_bn=fused_bn)

        def run(params, x, f=f):
            r = f(params, x)
            return jnp.sum(r["output"].astype(jnp.float32))

        jr = jax.jit(run)
        _ = float(jr(params, x))          # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jr(params, x)
        _ = float(out)                     # force execution (tunnel-safe)
        ms = (time.perf_counter() - t0) / iters * 1000
        marginal = ms - prev_t
        bflops = sum(l.bflops for l in graph.layers[prev_i + 1: ci + 1])
        times.append(((prev_i + 1, ci), marginal, bflops))
        log(f"layers {prev_i + 1:3d}-{ci:3d}: {marginal:8.2f} ms marginal "
            f"({ms:8.2f} ms cum), {bflops:6.2f} BFLOPs")
        prev_t, prev_i = ms, ci
    return times
