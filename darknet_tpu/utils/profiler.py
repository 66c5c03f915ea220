"""Per-layer benchmark — the `-benchmark_layers` equivalent
(network_kernels.cu:27-114: per-layer wall time with device sync, EMA 0.9,
sorted report).

Under XLA the whole graph is one fused executable, so "layer time" is
measured by compiling a prefix program per layer and differencing — an
approximation that charges each layer its marginal cost including fusion
effects (which is what you actually pay).  Also reports per-layer BFLOPs
from the IR (static, like parser.cpp:1461).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from darknet_tpu.nn.emit import make_forward


def benchmark_layers(graph, params, *, batch: int = 1, compute_dtype=None,
                     fused_bn: bool = True, iters: int = 5,
                     checkpoints: list | None = None, log=print):
    """Times prefix programs at `checkpoints` (default: every 10th layer +
    heads) and prints a marginal-cost table.  Returns list of
    (layer_range, ms, bflops)."""
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
