"""Pipeline parallelism — stage-partitioned inference across devices.

The reference has no model-parallel mode (SURVEY.md §2.7); this is the
TPU-native layer-axis split completing the dp/sp/tp set: the layer graph
is cut into contiguous stages balanced by BFLOPs, each stage's params
live only on its device, and micro-batches stream through the stages.
JAX's async dispatch is the pipeline schedule — stage s of micro-batch m
runs concurrently with stage s-1 of micro-batch m+1 because each jitted
stage call only depends on its own inputs; device-to-device transfers
ride ICI on real multi-chip hardware.

Cross-stage dataflow is computed from the graph: a cut at layer c must
carry layer c-1's output (the sequential `cur`) plus every earlier
output still consumed at or after c (route/shortcut/scale_channels
back-references — yolov4's neck reaches ~60 layers back into the
backbone).  The stage executor is the stock emitter in slice mode
(nn/emit.make_forward's _lo/_hi/_extern), so every layer-kind quirk is
inherited rather than reimplemented.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def consumed(layer, i: int) -> list:
    """Graph indices layer i reads: routes consume exactly their listed
    layers; everything else implicitly consumes i-1 plus any extra edges
    (shortcut/scale_channels from_layer)."""
    if layer.kind == "route":
        return list(layer.input_indices())
    return ([i - 1] if i > 0 else []) + list(layer.input_indices())


def crossing_set(graph, cut: int) -> list:
    """Sorted indices j < cut-1 whose outputs are consumed at/after cut.
    (cut-1 itself travels as the sequential activation, not in the set —
    unless a layer >= cut back-references it explicitly, which still
    resolves because the stage seeds outs with cut-1 when listed.)"""
    need = set()
    for i in range(cut, len(graph.layers)):
        for s in consumed(graph.layers[i], i):
            if 0 <= s < cut:
                need.add(s)
    need.discard(cut - 1)
    return sorted(need)


def plan_cuts(graph, n_stages: int, *, forbidden=()) -> list:
    """Stage boundaries [c_1..c_{S-1}] balancing cumulative BFLOPs,
    snapped away from `forbidden` positions (fused-region interiors)."""
    bf = np.array([l.bflops or 0.0 for l in graph.layers])
    cum = np.cumsum(bf)
    total = cum[-1] if len(cum) else 0.0
    cuts = []
    for s in range(1, n_stages):
        target = total * s / n_stages
        c = int(np.searchsorted(cum, target)) + 1
        c = max(1, min(c, len(graph.layers) - 1))
        # snap forward, then backward, to the nearest allowed position
        orig = c
        while c in forbidden and c < len(graph.layers) - 1:
            c += 1
        if c in forbidden:
            c = orig
            while c in forbidden and c > 1:
                c -= 1
        if cuts and c <= cuts[-1]:
            c = cuts[-1] + 1
        cuts.append(c)
    return cuts


def _forbidden_cuts(graph, *, fuse_regions, stem_s2d) -> set:
    out = set()
    if stem_s2d:
        out.add(1)                    # the s2d stem fuses layers 0-1
    if fuse_regions:
        from darknet_tpu.ops.pallas.fused_region import plan_graph_regions

        for a, pl in plan_graph_regions(graph, stem=stem_s2d).items():
            out.update(range(a + 1, pl.stop + 1))
    return out


class PipelineForward:
    """Stage-partitioned inference executor.

    fn = PipelineForward(graph, params, devices); heads = fn(x)
    Each stage's param slice is resident only on its device; `x` is split
    into `microbatches` chunks that stream through the stages.
    """

    def __init__(self, graph, params, devices, *, compute_dtype=None,
                 fused_bn: bool = True, fuse_regions=None,
                 microbatches: int = 2):
        from darknet_tpu.nn.emit import make_forward

        if fuse_regions is None:
            fuse_regions = (fused_bn
                            and jax.default_backend() == "tpu")
        stem = False        # stem fold stays off: cut bookkeeping is per
        #                     layer index and the fold rewrites 0-1
        fwd = make_forward(graph, compute_dtype=compute_dtype,
                           fused_bn=fused_bn, fuse_regions=fuse_regions,
                           stem_s2d=stem)
        n_stages = len(devices)
        forb = _forbidden_cuts(graph, fuse_regions=fuse_regions,
                               stem_s2d=stem)
        cuts = plan_cuts(graph, n_stages, forbidden=forb)
        bounds = [0] + cuts + [len(graph.layers)]
        self.devices = list(devices)
        self.microbatches = microbatches
        self.stages = []
        for s in range(n_stages):
            lo, hi = bounds[s], bounds[s + 1]
            keys_in = crossing_set(graph, lo) if lo else []
            keys_out = crossing_set(graph, hi) if hi < len(graph.layers) \
                else []
            needed = set(range(lo, hi))
            for l in graph.layers[lo:hi]:
                if (l.kind == "convolutional"
                        and getattr(l, "share_index", None) is not None):
                    needed.add(l.share_index)
            params_s = [p if i in needed else {}
                        for i, p in enumerate(params)]
            params_s = jax.device_put(params_s, self.devices[s])

            def stage(params, cur, ext, lo=lo, hi=hi,
                      keys_in=tuple(keys_in), keys_out=tuple(keys_out)):
                extern = dict(zip(keys_in, ext))
                if lo:
                    extern[lo - 1] = cur    # cur IS layer lo-1's output;
                    # keys_out may carry it to a later back-reference
                r = fwd(params, cur, _lo=lo, _hi=hi, _extern=extern)
                return (r["output"], tuple(r["outs"][k] for k in keys_out),
                        tuple(r["heads"]))

            self.stages.append({
                "lo": lo, "hi": hi, "keys_in": tuple(keys_in),
                "keys_out": tuple(keys_out), "params": params_s,
                "fn": jax.jit(stage)})

    def _run_micro(self, x):
        cur, ext = x, ()
        heads = []
        for s, st in enumerate(self.stages):
            dev = self.devices[s]
            cur = jax.device_put(cur, dev)
            ext = tuple(jax.device_put(e, dev) for e in ext)
            cur, ext_out, heads_s = st["fn"](st["params"], cur, ext)
            # re-key: next stage's keys_in ⊆ this stage's keys_out ∪ keys_in
            produced = dict(zip(st["keys_out"], ext_out))
            carry_in = dict(zip(st["keys_in"], ext))
            nxt = self.stages[s + 1]["keys_in"] \
                if s + 1 < len(self.stages) else ()
            ext = tuple(produced.get(k, carry_in.get(k)) for k in nxt)
            heads.extend(heads_s)
        return heads

    def __call__(self, x):
        x = jnp.asarray(x)
        m = max(1, min(self.microbatches, x.shape[0]))
        chunks = np.array_split(np.arange(x.shape[0]), m)
        outs = [self._run_micro(x[c[0]:c[-1] + 1]) for c in chunks if len(c)]
        heads = [jnp.concatenate([o[h] for o in outs], axis=0)
                 for h in range(len(outs[0]))]
        return heads
