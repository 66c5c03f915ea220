"""Fused conv-region Pallas kernel — the flagship TPU inference kernel.

The reference's hot path is a per-layer fused conv+BN+activation CUDA
kernel (`convolutional_kernels.cu:252-552`); every layer still round-trips
its activations through device memory.  On TPU the lane-starved CSP stages
(304²/152² feature maps with 32–64 channels, i.e. half/quarter of the 128
VPU lanes) additionally pay 2-4x lane padding on every one of those trips.
This kernel goes further than the reference can: it executes an ENTIRE
stage — s2d stem, 1x1/3x3 convs, shortcuts, CSP route-concats — as one
Pallas program.  The input is DMA'd from HBM once per row-slab, every
intermediate lives in VMEM, and only the stage output is written back.

Layout: "p2 pixel packing".  NHWC (B, H, W, C) is viewed as
(B, H, W/2, 2C) — a pure bitcast (adjacent W-pixel pairs fold into lanes,
`[pixel0 channels | pixel1 channels]`) — so 64-channel tensors fill all
128 lanes.  Convs become matmuls over lane-concatenated shifted taps
("im2col in VMEM"): a 1x1 conv is a block-diagonal (2C, 2N) matmul, a 3x3
conv gathers 9 packed taps (dy, dJ).  Route concats never materialize —
they fold into the next conv's weight-row layout.  Accumulation is f32 on
the MXU (`preferred_element_type`); bias + activation run in the compute
dtype, matching `ops/conv.py`'s fast path.

Halo: all intermediates are computed on a row slab of S = rt + T + rb
rows.  Each 3x3 conv grows the required halo by one row; rows outside the
halo budget hold garbage that never reaches the center T output rows.
Image-edge tiles zero-fill their halo, which IS the conv zero-padding.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# activations safe inside the packed kernel: strictly elementwise AND
# expressible without vector compares (Mosaic has no bf16 cmpf on this
# target) — min/max/exp/tanh only.  NORM_CHAN* reduce over the channel
# axis and would mix packed pixels; where()-based acts are excluded.
ELEMENTWISE_ACTS = frozenset({
    "linear", "leaky", "relu", "relu6", "relie", "ramp", "mish", "swish",
    "logistic", "loggy", "tanh", "hardtan", "gelu",
})


def _recip(x, approx: bool):
    """Mosaic's full divide is slow; the approximate reciprocal is exact
    to ~2^-12 — below bf16 resolution, so it is used only when the
    kernel's compute dtype is bf16."""
    if not approx:
        return 1.0 / x
    try:
        # pl.reciprocal is f32-only; round-trip through f32
        return pl.reciprocal(x.astype(jnp.float32),
                             approx=True).astype(x.dtype)
    except Exception:      # interpret/CPU fallback
        return 1.0 / x


def _sigmoid(y, approx: bool):
    ex = jnp.exp(-jnp.abs(y))
    s = _recip(1.0 + ex, approx)
    # sigmoid(|y|) = 1/(1+e^-|y|); reflect for negatives without a
    # vector compare: sigmoid(y) = 0.5 + sign(y)*(s - 0.5)
    return 0.5 + jnp.sign(y) * (s - 0.5)


def kernel_act(y, act: str, approx: bool = False):
    """Compare-free activations, numerics matching ops/activations.py.

    leaky(x) = max(x, 0.1x) is exact; mish uses the same closed form
    tanh(softplus(x)) = ((1+e^x)^2-1)/((1+e^x)^2+1) with a min() clamp at
    20 instead of a where(): exact in f32 for |x| <= 20, and both tails
    agree with the reference's threshold-20 formula to full precision
    (q -> inf gives y = x; q -> 1 gives y ~ x*e^x ~ 0).
    """
    if act == "linear":
        return y
    if act == "leaky":
        return jnp.maximum(y, 0.1 * y)
    if act == "relu":
        return jnp.maximum(y, 0)
    if act == "relu6":
        return jnp.minimum(jnp.maximum(y, 0), 6)
    if act == "relie":
        return jnp.maximum(y, 0.01 * y)
    if act == "ramp":
        return jnp.maximum(y, 0) + 0.1 * y
    if act == "mish":
        ex = jnp.exp(jnp.minimum(y, 20.0))
        q = (1.0 + ex) * (1.0 + ex)
        return y * (q - 1.0) * _recip(q + 1.0, approx)
    if act == "swish":
        return y * _sigmoid(y, approx)
    if act == "logistic":
        return _sigmoid(y, approx)
    if act == "loggy":
        return 2.0 * _sigmoid(y, approx) - 1.0
    if act == "tanh":
        return jnp.tanh(y)
    if act == "hardtan":
        return jnp.minimum(jnp.maximum(y, -1.0), 1.0)
    if act == "gelu":
        return 0.5 * y * (1.0 + jnp.tanh(0.797885 * y + 0.035677 * y ** 3))
    raise NotImplementedError(act)

IN_SLOT = -1          # region input tensor


class _Unplannable(Exception):
    """A layer inside the candidate region references an unresolvable
    slot (e.g. a stem region whose body routes to raw layer 0)."""


@dataclasses.dataclass(frozen=True)
class ConvStep:
    """One conv (possibly consuming a folded route-concat of srcs)."""

    srcs: tuple                  # slot ids, concat order (route order)
    srcs_c: tuple                # ORIG (unpacked) channels per src
    kh: int
    kw: int
    pt: int                      # top pad
    pl_: int                     # left pad
    n: int                       # orig output channels
    act: str
    out_slot: int
    w_fn: Callable               # params -> orig (kh, kw, sum(srcs_c), n)
    b_fn: Callable               # params -> orig (n,) (BN beta when bn)
    sy: int = 1                  # stride (rows / orig W); a strided packed
    sx: int = 1                  # conv runs at stride (sy, sx) over packed
                                 # cols: out px 2j'+q reads sx*(2j'+q)+ox-pl
    bn: bool = False             # training-mode batch norm inside the region
    s_fn: Callable = None        # params -> BN scales (n,) when bn
    li: int = -1                 # graph layer index of this conv (for the
                                 # int8 serving path: params[li]["x_scale"]
                                 # holds its calibrated input scale)

    @property
    def taps(self) -> tuple:
        """Packed taps (dy, dJ): relative to the strided base, output
        packed col j' phase q reads input packed col sx*j' + dJ, phase p,
        with v = sx*q + ox - pl_, dJ = v//2, p = v%2 (sx=1 reduces to the
        round-1 formula)."""
        return tuple(sorted({
            (oy - self.pt, (self.sx * q + ox - self.pl_) // 2)
            for oy in range(self.kh) for ox in range(self.kw)
            for q in (0, 1)}))

    @property
    def c_tot(self) -> int:
        return sum(self.srcs_c)


@dataclasses.dataclass(frozen=True)
class AddStep:
    """Shortcut: out = act(a + b)."""

    a: int
    b: int
    act: str
    out_slot: int


@dataclasses.dataclass
class RegionPlan:
    steps: tuple                 # ConvStep | AddStep
    rt: int                      # input halo rows above
    rb: int                      # below
    h: int                       # region spatial height (= width/rows)
    w2: int                      # packed width (W // 2)
    in_c: int                    # orig input channels (packed = 2x)
    out_slot: int
    out_c: int                   # orig output channels
    start: int                   # first graph layer covered
    stop: int                    # last graph layer covered (inclusive)
    stem: bool = False           # input is the s2d-packed net input
    tile: int = 0                # rows per grid step (set by pick_tile)
    out_h: int = 0               # stop layer's output dims (for unpack);
    out_w: int = 0               # == h / 2*w2 for stride-free regions
    xla_only: bool = False       # contains strided convs (no Pallas path)

    @property
    def conv_steps(self):
        return [s for s in self.steps if isinstance(s, ConvStep)]


# --------------------------------------------------------------------------
# Weight packing
# --------------------------------------------------------------------------


def pack_step_weights(step: ConvStep, w):
    """Orig (kh, kw, C_tot, N) -> packed (len(taps)*2*C_tot, 2N).

    Patch lane layout (must match the kernel): tap-major, then src, then
    [pixel-phase0 C_s | phase1 C_s].  Output cols [phase0 N | phase1 N].
    For output phase q and orig kernel offset (oy, ox): the input pixel is
    2j + q + ox - pl_ = 2(j + dJ) + p.
    """
    w = jnp.asarray(w)
    c_tot, n = step.c_tot, step.n
    taps = step.taps
    tap_i = {t: i for i, t in enumerate(taps)}
    src_off = np.concatenate([[0], np.cumsum(step.srcs_c)])
    out = jnp.zeros((len(taps) * 2 * c_tot, 2 * n), w.dtype)
    for oy in range(step.kh):
        dy = oy - step.pt
        for ox in range(step.kw):
            for q in (0, 1):
                v = step.sx * q + ox - step.pl_
                base = tap_i[(dy, v // 2)] * 2 * c_tot
                p = v % 2
                for si, cs in enumerate(step.srcs_c):
                    r0 = base + 2 * int(src_off[si]) + p * cs
                    c0 = int(src_off[si])
                    out = out.at[r0:r0 + cs, q * n:(q + 1) * n].add(
                        w[oy, ox, c0:c0 + cs, :])
    return out


def pack_step_bias(step: ConvStep, b):
    b = jnp.asarray(b, jnp.float32)
    return jnp.concatenate([b, b]).reshape(1, 2 * step.n)


# --------------------------------------------------------------------------
# Planner: graph -> RegionPlan(s)
# --------------------------------------------------------------------------


def _conv_ok(l) -> bool:
    return (l.kind == "convolutional" and l.groups == 1 and l.dilation == 1
            and l.share_index is None and not l.antialiasing
            and l.stride_x == l.stride_y and l.stride_x in (1, 2)
            and l.size in (1, 3) and l.pad == l.size // 2
            and l.activation in ELEMENTWISE_ACTS
            and not l.binary and not l.xnor)


def _layer_inputs(layers, j):
    l = layers[j]
    if l.kind == "route":
        return list(l.layers)
    ins = [j - 1]
    ins += l.input_indices()
    return ins


def _plan_region(graph, a: int, *, stem_steps=None, in_c=None,
                 train: bool = False):
    """Try to build a maximal region starting at layer `a` whose input is
    layer a-1's output (or the net input via `stem_steps`).  Returns a
    RegionPlan or None."""
    layers = graph.layers
    res = (layers[a].h, layers[a].w)
    if res[1] % 2:
        return None

    # scan forward tracking the CURRENT resolution: stride-2 convs are
    # allowed (they become strided packed convs), so a region can span
    # stage boundaries — the packed layout never round-trips through HBM
    # in unpacked form between stages (the pack/unpack reshapes are
    # layout COPIES in TPU tiled memory, ~3ms each at 608²/b32)
    end = a
    j = a
    cur = res
    wide_run = 0     # consecutive convs with min(c,n) >= 128: packing
                     # those is pure 2x-FLOPs loss, so stop at a run of 2
    while j < len(layers):
        l = layers[j]
        # training: per-layer gradient gates lower to stop_gradient on the
        # layer output (emit), which a fused region cannot express inside
        if train and (l.stopbackward or l.onlyforward or l.train_only_bn):
            break
        # route dims reflect concatenated bookkeeping, not a spatial shape;
        # out_h/out_w is authoritative for every kind
        if l.kind == "convolutional":
            if (l.h, l.w) != cur or not _conv_ok(l):
                break
            if min(l.c, l.n) >= 128:
                wide_run += 1
                if wide_run >= 2:
                    break
            else:
                wide_run = 0
            if l.stride_x == 2 and (cur[0] % 2 or cur[1] % 2
                                    or l.out_w % 2):
                break
            cur = (l.out_h, l.out_w)
        elif (l.out_h, l.out_w) != cur:
            break
        elif l.kind == "route":
            if l.groups != 1 or any(s < a - 1 for s in l.layers):
                break
        elif l.kind == "shortcut":
            if (l.from_layer < a - 1
                    or l.activation not in ELEMENTWISE_ACTS):
                break
        else:
            break
        j += 1
    end = j - 1
    if end < a:
        return None

    # shrink until no inner layer is consumed outside [a, end]; a stem
    # region also swallows layers 0..a-1, whose raw outputs must then be
    # dead beyond the region (only the region output is materialized)
    lo = 0 if stem_steps else a

    def consumed_outside(e):
        for k in range(e + 1, len(layers)):
            for s in _layer_inputs(layers, k):
                if lo <= s < e:
                    return True
        return False

    # alternate both trims to a fixpoint: dropping a trailing route can
    # expose inner layers it consumed, and vice versa
    changed = True
    while changed and end >= a:
        changed = False
        while end > a and consumed_outside(end):
            end -= 1
            changed = True
        # region output must be the tensor flowing to layer end+1
        while end >= a and layers[end].kind == "route" and \
                len(layers[end].layers) > 1:
            end -= 1   # a multi-concat output tensor is never materialized
            changed = True
    n_convs = sum(1 for k in range(a, end + 1)
                  if layers[k].kind == "convolutional")
    if end < a or n_convs < 3:
        return None
    # only fuse lane-starved stages (some tensor with <128 channels, i.e.
    # padded lanes in plain NHWC execution).  Wide stages (256-1024ch SPP/
    # heads) are compute-bound and already run near MXU peak under XLA;
    # fusing them would only add halo-recompute overhead.
    lane_starved = any(
        l.kind == "convolutional" and min(l.c, l.n) < 128
        for l in layers[a:end + 1]) or stem_steps is not None
    if not lane_starved:
        return None

    # build steps; slots: layer index, or tuple-of-slots for route concats
    steps = list(stem_steps or [])
    slot_of = {a - 1: (steps[-1].out_slot if steps else IN_SLOT)}
    chan_of = {IN_SLOT: in_c if in_c is not None else layers[a].c}
    for s in steps:
        chan_of[s.out_slot] = s.n

    def resolve(idx):
        """Layer index -> ((slot, channels), ...)."""
        if idx not in slot_of:
            raise _Unplannable
        s = slot_of[idx]
        if isinstance(s, tuple):
            return s
        return ((s, chan_of[s]),)

    try:
        _build_steps(layers, a, end, steps, slot_of, chan_of, resolve,
                     train)
    except _Unplannable:
        return None
    out = slot_of[end]
    if isinstance(out, tuple):
        return None

    halo = _steps_halo(steps)

    strided = any(isinstance(s, ConvStep) and (s.sy > 1 or s.sx > 1)
                  for s in steps)
    plan = RegionPlan(
        steps=tuple(steps), rt=halo[out][0], rb=halo[out][1],
        h=res[0], w2=res[1] // 2,
        in_c=chan_of[IN_SLOT], out_slot=out, out_c=chan_of[out],
        out_h=layers[end].out_h, out_w=layers[end].out_w,
        start=a, stop=end, stem=stem_steps is not None,
        xla_only=strided)
    if strided:
        plan.tile = 0          # Pallas kernel doesn't support strides
    else:
        plan.tile = pick_tile(plan)
        if plan.tile is None:
            return None
    return plan


def _build_steps(layers, a, end, steps, slot_of, chan_of, resolve,
                 train=False):
    for k in range(a, end + 1):
        l = layers[k]
        if l.kind == "convolutional":
            pairs = resolve(k - 1)
            srcs = tuple(p[0] for p in pairs)
            srcs_c = tuple(p[1] for p in pairs)
            steps.append(ConvStep(
                srcs=srcs, srcs_c=srcs_c, kh=l.size, kw=l.size,
                pt=l.pad, pl_=l.pad, n=l.n, act=l.activation, out_slot=k,
                w_fn=(lambda p, k=k: p[k]["w"]),
                b_fn=(lambda p, k=k: p[k]["b"]),
                sy=l.stride_y, sx=l.stride_x,
                bn=bool(train and l.batch_normalize),
                s_fn=(lambda p, k=k: p[k]["scales"])
                if train and l.batch_normalize else None,
                li=k))
            slot_of[k] = k
            chan_of[k] = l.n
        elif l.kind == "route":
            pairs = []
            for s in l.layers:
                pairs.extend(resolve(s))
            slot_of[k] = tuple(pairs)
        elif l.kind == "shortcut":
            (sa, ca), = resolve(k - 1)
            (sb, cb), = resolve(l.from_layer)
            if ca != cb:
                raise _Unplannable
            steps.append(AddStep(a=sa, b=sb, act=l.activation, out_slot=k))
            slot_of[k] = k
            chan_of[k] = ca


def _steps_halo(steps) -> dict:
    """Halo rows (top, bottom) required at each slot, keyed by slot id."""
    halo = {IN_SLOT: (0, 0)}
    for s in steps:
        if isinstance(s, ConvStep):
            up = max(0, -min(dy for dy, _ in s.taps))
            dn = max(0, max(dy for dy, _ in s.taps))
            ht = max(halo[x][0] for x in s.srcs) + up
            hb = max(halo[x][1] for x in s.srcs) + dn
        else:
            ht = max(halo[s.a][0], halo[s.b][0])
            hb = max(halo[s.a][1], halo[s.b][1])
        halo[s.out_slot] = (ht, hb)
    return halo


def hybrid_prefix(plan: RegionPlan):
    """Largest stride-1 step prefix of an xla_only region that can run as
    ONE Pallas kernel, leaving the strided remainder to the XLA step loop.

    The motivating case is the s2d stem fold: its conv0'' matmul
    (K=216, N=256 at 304x152) is HBM-bound under XLA — the 757 MB
    intermediate round-trips through HBM — but VMEM-resident in the
    kernel.  A valid cut k requires every step in steps[k:] to reference
    only the boundary slot (steps[k-1].out_slot) among prefix-produced
    slots, so the kernel materializes exactly one tensor.

    Returns (sub_plan, k) or None.
    """
    steps = plan.steps
    first_strided = len(steps)
    for i, s in enumerate(steps):
        if isinstance(s, ConvStep) and (s.sy > 1 or s.sx > 1):
            first_strided = i
            break

    chan = {IN_SLOT: plan.in_c}
    for s in steps:
        chan[s.out_slot] = s.n if isinstance(s, ConvStep) else chan[s.a]

    for k in range(first_strided, 1, -1):
        prefix = steps[:k]
        if sum(1 for s in prefix if isinstance(s, ConvStep)) < 2:
            return None
        if any(isinstance(s, ConvStep) and s.bn for s in prefix):
            return None
        boundary = prefix[-1].out_slot
        produced = {IN_SLOT} | {s.out_slot for s in prefix}
        ok = True
        for s in steps[k:]:
            srcs = s.srcs if isinstance(s, ConvStep) else (s.a, s.b)
            if any(x in produced and x != boundary for x in srcs):
                ok = False
                break
        if not ok:
            continue
        rt, rb = _steps_halo(prefix)[boundary]
        sub = RegionPlan(
            steps=tuple(prefix), rt=rt, rb=rb, h=plan.h, w2=plan.w2,
            in_c=plan.in_c, out_slot=boundary, out_c=chan[boundary],
            out_h=plan.h, out_w=2 * plan.w2,
            start=plan.start, stop=plan.start, stem=plan.stem)
        sub.tile = pick_tile(sub)
        if sub.tile is None:
            continue
        return sub, k
    return None


def pick_tile(plan, budget_bytes=12 * 1024 * 1024, t_max=64):
    """Largest divisor of H whose liveness-peak VMEM fits the budget
    (usable VMEM is ~16 MiB/core; leave headroom for Mosaic's own
    pipeline buffers)."""
    for t in range(min(t_max, plan.h), max(plan.rt, plan.rb, 4) - 1, -1):
        if plan.h % t:
            continue
        if _vmem_estimate(plan, t) <= budget_bytes:
            return t
    return None


def _vmem_estimate(plan, t):
    """Peak VMEM with step-level liveness (slot freed after last use)."""
    s = plan.rt + t + plan.rb
    px = s * plan.w2
    # in/out pipeline blocks are double-buffered by Pallas
    io = 3 * 2 * (t * plan.w2) * 2 * plan.in_c * 2 \
        + 2 * (t * plan.w2) * 2 * plan.out_c * 2

    chan = {IN_SLOT: plan.in_c}
    last_use = {IN_SLOT: 0}
    for i, st in enumerate(plan.steps):
        srcs = st.srcs if isinstance(st, ConvStep) else (st.a, st.b)
        for x in srcs:
            last_use[x] = i
        chan[st.out_slot] = st.n if isinstance(st, ConvStep) else \
            chan[srcs[0]]
        last_use[st.out_slot] = i
    last_use[plan.out_slot] = len(plan.steps)

    live = {IN_SLOT}
    peak = 0
    for i, st in enumerate(plan.steps):
        live.add(st.out_slot)
        cur = sum(px * 2 * chan[x] * 2 for x in live)
        if isinstance(st, ConvStep):
            k_chunk = _chunk_len(st) * 2 * st.c_tot
            cur += px * k_chunk * 2 + px * 2 * st.n * 4   # patch + f32 acc
        peak = max(peak, cur)
        live = {x for x in live if last_use.get(x, -1) > i}
    return io + peak


def _chunk_len(step) -> int:
    """dJ taps per wide-patch chunk: K capped at 512 to bound VMEM."""
    k1 = 2 * step.c_tot
    n_dj = len({dj for _, dj in step.taps})
    return max(1, min(n_dj, max(1, 512 // k1)))


def make_stem_steps(graph):
    """Fold the s2d stem (ops/stem.py) into region steps.

    Region input = space-to-depth(net input): (B, H/2, W/2, 4*C_in).
    conv0 becomes a 3x3 conv over s2d coords with pack_w0 weights (output
    = conv0's four phases packed into channels); conv1 (stride 2) becomes
    a 2x2 conv with pack_w1 weights and taps {-1, 0} (pad (1,0)).
    """
    from darknet_tpu.ops.stem import pack_w0, pack_w1

    l0, l1 = graph.layers[0], graph.layers[1]
    c_in = 4 * l0.c
    s0 = ConvStep(
        srcs=(IN_SLOT,), srcs_c=(c_in,), kh=3, kw=3, pt=1, pl_=1,
        n=4 * l0.n, act=l0.activation, out_slot=-100,
        w_fn=lambda p: pack_w0(p[0]["w"]),
        b_fn=lambda p: jnp.tile(jnp.asarray(p[0]["b"], jnp.float32), 4),
        li=0)
    s1 = ConvStep(
        srcs=(-100,), srcs_c=(4 * l0.n,), kh=2, kw=2, pt=1, pl_=1,
        n=l1.n, act=l1.activation, out_slot=1,
        w_fn=lambda p: pack_w1(p[1]["w"]),
        b_fn=lambda p: p[1]["b"],
        li=1)
    return [s0, s1], c_in


def plan_graph_regions(graph, *, stem: bool = False, train: bool = False,
                       first: int = 0):
    """Scan the graph for fusable regions.  Returns {start_layer: plan};
    a stem plan's start is 0 (it consumes the net input).

    train=True plans training regions: BN runs inside the packed layout,
    gradient-gate layers break regions, and the s2d stem fold is skipped
    (it presumes folded BN).  `first` skips layers below it — the emitter
    passes 2 when the train-mode packed stem (fused_stem_train) already
    consumes layers 0-1."""
    from darknet_tpu.ops.stem import stem_pattern

    layers = graph.layers
    plans = {}
    i = first
    if stem and not train and stem_pattern(graph) and len(layers) > 2:
        stem_steps, in_c = make_stem_steps(graph)
        p = _plan_region(graph, 2, stem_steps=stem_steps, in_c=in_c)
        if p is not None:
            p.start = 0
            plans[0] = p
            i = p.stop + 1
    while i < len(layers):
        if layers[i].kind == "convolutional" and _conv_ok(layers[i]) \
                and i > 0:
            p = _plan_region(graph, i, train=train)
            if p is not None:
                plans[i] = p
                i = p.stop + 1
                continue
        i += 1
    return plans


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _shift(v, dy: int, dj: int):
    """shifted[r, j] = v[r + dy, j + dj], zero-filled (= conv zero-pad;
    slab-edge garbage stays within the halo budget)."""
    s_, w_, c_ = v.shape
    z = functools.partial(jnp.zeros, dtype=v.dtype)
    if dy > 0:
        v = jnp.concatenate([v[dy:], z((dy, w_, c_))], axis=0)
    elif dy < 0:
        v = jnp.concatenate([z((-dy, w_, c_)), v[:s_ + dy]], axis=0)
    if dj > 0:
        v = jnp.concatenate([v[:, dj:], z((s_, dj, c_))], axis=1)
    elif dj < 0:
        v = jnp.concatenate([z((s_, -dj, c_)), v[:, :w_ + dj]], axis=1)
    return v


def build_region_call(plan: RegionPlan, batch: int, *,
                      compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Returns run(x_packed, weights, biases) -> packed output.

    x_packed: (B, H, W2, 2*in_c) compute_dtype; weights/biases: lists in
    conv-step order, packed via pack_step_weights/bias.
    """
    t, rt, rb = plan.tile, plan.rt, plan.rb
    s = rt + t + rb
    h, w2 = plan.h, plan.w2
    n_t = h // t
    cd = compute_dtype
    out_c2 = 2 * plan.out_c
    conv_steps = plan.conv_steps
    n_w = len(conv_steps)
    f32 = jnp.float32

    def kernel(*refs):
        # input arrives as three row-tiles (prev/cur/next, clamped at the
        # image edges) — the halo slab is assembled in VMEM and out-of-image
        # rows are zeroed, which IS the convs' zero padding
        xp_ref, xc_ref, xn_ref = refs[0], refs[1], refs[2]
        w_refs = refs[3:3 + n_w]
        b_refs = refs[3 + n_w:3 + 2 * n_w]
        o_ref = refs[3 + 2 * n_w]
        ti = pl.program_id(1)

        parts = []
        if rt:
            parts.append(xp_ref[0, t - rt:])
        parts.append(xc_ref[0])
        if rb:
            parts.append(xn_ref[0, :rb])
        slab = parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=0)
        in_img = None
        if rt or rb:
            gi = ti * t + (
                jax.lax.broadcasted_iota(jnp.int32, (s, 1, 1), 0) - rt)
            in_img = (gi >= 0) & (gi < h)
            slab = jnp.where(in_img, slab, jnp.zeros_like(slab))

        def mask_rows(v):
            # out-of-image slab rows of EVERY tensor must be zero: the
            # next conv's zero padding reads them, and the "virtual" conv
            # value of a beyond-edge row is nonzero even for zero input
            # rows (the opposing taps still see in-image pixels)
            if in_img is None:
                return v
            return jnp.where(in_img, v, jnp.zeros_like(v))

        slots = {IN_SLOT: slab}
        wi = -1
        for step in plan.steps:
            if isinstance(step, AddStep):
                y = slots[step.a] + slots[step.b]
                slots[step.out_slot] = mask_rows(
                    kernel_act(y, step.act, approx=cd == jnp.bfloat16))
                continue
            wi += 1
            srcv = [slots[x] for x in step.srcs]
            k1 = 2 * step.c_tot          # patch lanes per tap
            n2 = 2 * step.n
            # taps form a full (dy x dJ) product (dy depends only on oy,
            # dJ only on (ox, q)).  The dJ lane-concat is the one real
            # copy; every dy offset is a row-slice of the flattened view
            # (sublane-aligned because w2 % 8 == 0 after tiling), so a
            # 3x3 conv costs 3 shifted copies instead of 9.
            dys = sorted({dy for dy, _ in step.taps})
            djs = sorted({dj for _, dj in step.taps})
            pad_t, pad_b = -dys[0], dys[-1]
            acc = None
            dj_cl = max(1, min(len(djs), max(1, 512 // k1)))
            for g0 in range(0, len(djs), dj_cl):
                djg = djs[g0:g0 + dj_cl]
                parts = [_shift(v, 0, dj) for dj in djg for v in srcv]
                wide = parts[0] if len(parts) == 1 else \
                    jnp.concatenate(parts, axis=-1)
                kg = len(djg) * k1
                if pad_t or pad_b:
                    z = jnp.zeros((1, w2, kg), wide.dtype)
                    wide = jnp.concatenate(
                        [z] * pad_t + [wide] + [z] * pad_b, axis=0)
                flat = wide.reshape((s + pad_t + pad_b) * w2, kg)
                for i_dy, dy in enumerate(dys):
                    off = (dy + pad_t) * w2
                    pk = flat[off:off + s * w2] if (pad_t or pad_b) \
                        else flat
                    # packed rows are (dy-major, dJ-minor)
                    r0 = (i_dy * len(djs) + g0) * k1
                    wk = w_refs[wi][r0:r0 + kg, :]
                    y = jnp.dot(pk, wk, preferred_element_type=f32)
                    acc = y if acc is None else acc + y
            y = acc + b_refs[wi][:]
            if cd != f32:
                y = y.astype(cd)
            y = kernel_act(y, step.act, approx=cd == jnp.bfloat16)
            slots[step.out_slot] = mask_rows(y.reshape(s, w2, n2))

        o_ref[0] = slots[plan.out_slot][rt:rt + t].astype(o_ref.dtype)

    in_c2 = 2 * plan.in_c
    xblock = (1, t, w2, in_c2)
    x_specs = [
        pl.BlockSpec(xblock, lambda b, ti: (b, jnp.maximum(ti - 1, 0), 0, 0)),
        pl.BlockSpec(xblock, lambda b, ti: (b, ti, 0, 0)),
        pl.BlockSpec(xblock,
                     lambda b, ti: (b, jnp.minimum(ti + 1, n_t - 1), 0, 0)),
    ]
    w_specs = [pl.BlockSpec(
        (len(st.taps) * 2 * st.c_tot, 2 * st.n),
        lambda b, ti: (0, 0), memory_space=pltpu.VMEM)
        for st in conv_steps]
    b_specs = [pl.BlockSpec((1, 2 * st.n), lambda b, ti: (0, 0),
                            memory_space=pltpu.VMEM)
               for st in conv_steps]

    kw = {}
    if not interpret:
        # both grid dims are independent (each output tile depends only on
        # its input tiles): declaring them parallel lets Mosaic pipeline
        # grid steps instead of serializing — measured 1.5x on the bare
        # matmul at this geometry (M=2888, K=216)
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    call = pl.pallas_call(
        kernel,
        grid=(batch, n_t),
        in_specs=x_specs + w_specs + b_specs,
        out_specs=pl.BlockSpec((1, t, w2, out_c2),
                               lambda b, ti: (b, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, h, w2, out_c2), cd),
        interpret=interpret,
        **kw,
    )

    def run(x_packed, weights, biases):
        weights = [w.astype(cd) for w in weights]
        return call(x_packed, x_packed, x_packed, *weights, *biases)

    return run


# --------------------------------------------------------------------------
# XLA-mode region execution (same packed algebra, plain lax.conv ops)
# --------------------------------------------------------------------------


def run_region_xla(plan: RegionPlan, params, x, *,
                   compute_dtype=jnp.bfloat16, train: bool = False,
                   act_dtype=None, step_remat: bool = False):
    """Execute the region as p2-packed XLA convs instead of one Pallas
    kernel.

    The same pixel-pair packing (64ch -> 128 lanes) applies, but each step
    is a regular `lax.conv_general_dilated` over the packed layout with
    weights (n_dy, n_dJ, 2C, 2N) — `pack_step_weights` output reshaped
    (rows are (dy-major, dJ-minor) so the reshape is exact).  This halves
    the lane-padded HBM traffic of the plain NHWC path at the cost of 2x
    (block-sparse-as-dense) MXU FLOPs, and keeps XLA's epilogue fusion of
    bias/activation/shortcut.  Route concats materialize as lane concats;
    the following conv's weight rows absorb the phase interleave.

    train=True: BN runs INSIDE the packed layout (the packed lanes hold
    [phase0 C | phase1 C] of the same channels, so per-channel batch
    stats combine the phase pair: mean = avg of lane means, sum-of-square
    deviations add — exactly `ops/conv.batch_mean_var` math, Bessel
    1/(N-1)).  The whole region is differentiable (plain lax ops), so
    `jax.vjp` pulls gradients through it.  Returns (out, bn_stats) with
    UNPACKED per-channel (mean, var) keyed by layer index for the rolling
    updates; inference returns just out (BN must be pre-folded then).
    """
    cd = compute_dtype
    if plan.stem:
        from darknet_tpu.ops.stem import space_to_depth

        x = space_to_depth(x)
    b, h, w, c = x.shape
    # keep the input's own dtype: each fp step casts src to cd itself, and
    # the int8 path must quantize from the RAW image (f32) exactly like
    # the per-layer conv_block_int8 — a premature bf16 round-trip here
    # shifts ~20% of x_q by one and breaks bit-parity with the unpacked
    # int8 path (train still casts: activations saved under remat)
    xp = x.reshape(b, h, w // 2, 2 * c)
    if train:
        xp = xp.astype(cd)

    slots = {IN_SLOT: xp}
    bn_stats = _run_steps_xla(params, slots, plan.steps, cd, train=train,
                              act_dtype=act_dtype, step_remat=step_remat)
    out = slots[plan.out_slot]
    out = out.reshape(b, plan.out_h, plan.out_w, plan.out_c)
    if train:
        if act_dtype is not None:
            # interior ran reduced-precision; hand the rest of the net the
            # f32 convention it expects (the cast is epilogue-fused)
            out = out.astype(jnp.float32)
        return out, bn_stats
    return out


def _run_steps_xla(params, slots, steps, cd, *, train: bool = False,
                   act_dtype=None, step_remat: bool = False):
    """Execute region steps as packed XLA convs, updating `slots` in
    place.  Returns bn_stats ({out_slot: (mean, var)}, train only).

    act_dtype (train only): dtype the interior slot tensors carry between
    steps.  Default None keeps the f32 convention (conv -> f32 epilogue ->
    f32 slot); bfloat16 halves the region's HBM traffic in BOTH passes —
    the interior activations are vjp residuals (304²/152² tensors at 608)
    — while BN statistics stay f32 (computed before the cast)."""
    from jax import lax

    from darknet_tpu.ops.activations import apply_activation
    from darknet_tpu.ops.conv import BN_EPS

    bn_stats = {}

    def _train_step(step, params, *srcs):
        """One region conv step, training fp path — a pure function of
        (params, source slots) so it can be jax.checkpoint'ed: under
        step_remat the backward stores ONLY the slot tensors (bf16 when
        act_dtype is set) and recomputes the conv + BN + activation,
        instead of saving the step's f32 BN/activation internals."""
        src = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        w2k = pack_step_weights(step, step.w_fn(params))
        dys = sorted({dy for dy, _ in step.taps})
        djs = sorted({dj for _, dj in step.taps})
        w4 = w2k.reshape(len(dys), len(djs), 2 * step.c_tot, 2 * step.n)
        out_dtype = cd if cd != jnp.float32 else jnp.float32
        precision = lax.Precision.HIGHEST if cd == jnp.float32 else None
        y = lax.conv_general_dilated(
            src.astype(cd), w4.astype(cd), (step.sy, step.sx),
            ((-dys[0], dys[-1]), (-djs[0], djs[-1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
            preferred_element_type=out_dtype)
        keep_lp = step.bn and act_dtype is not None and cd != jnp.float32
        if cd != jnp.float32 and not keep_lp:
            y = y.astype(jnp.float32)
        beta = jnp.asarray(step.b_fn(params), jnp.float32)
        if step.bn:
            # fused BN+act epilogue, phases=2 (the packed lanes hold
            # [phase0 C | phase1 C]): custom VJP stores one y_hat
            # residual at act_dtype instead of the f32 pre-normalize +
            # pre-activation tensors — the region backward measured 3.3x
            # its forward under plain autodiff (ops/train_epilogue.py).
            # Under act16 the conv output itself stays bf16 (keep_lp):
            # the full-resolution f32 tensor never exists in HBM, stats
            # accumulate f32 inside a convert-fused reduce, and the
            # backward emits the dy cotangent in bf16 — trace-measured,
            # the f32 materialization + f32 dy writes dominated the
            # region's backward
            from darknet_tpu.ops.train_epilogue import bn_act_train

            scales = jnp.asarray(step.s_fn(params), jnp.float32)
            return bn_act_train(step.act, 2, act_dtype, act_dtype,
                                y, scales, beta)
        y = y + jnp.concatenate([beta, beta])
        y = apply_activation(y, step.act)
        if act_dtype is not None:
            y = y.astype(act_dtype)
        return y, None

    for step in steps:
        if isinstance(step, AddStep):
            y = slots[step.a] + slots[step.b]
            slots[step.out_slot] = apply_activation(y, step.act)
            continue
        if train:
            fn = functools.partial(_train_step, step)
            if step_remat:
                fn = jax.checkpoint(fn)
            y, st = fn(params, *[slots[s] for s in step.srcs])
            if st is not None:
                bn_stats[step.out_slot] = st
            slots[step.out_slot] = y
            continue
        w2k = pack_step_weights(step, step.w_fn(params))
        dys = sorted({dy for dy, _ in step.taps})
        djs = sorted({dj for _, dj in step.taps})
        w4 = w2k.reshape(len(dys), len(djs), 2 * step.c_tot, 2 * step.n)
        src = slots[step.srcs[0]] if len(step.srcs) == 1 else \
            jnp.concatenate([slots[s] for s in step.srcs], axis=-1)

        # int8 serving path: when the step's graph layer carries a static
        # calibrated activation scale (nn/params.apply_conv_input_scales),
        # run the packed conv on the MXU's int8 path — int8 activations
        # (static per-tensor scale: the quantize is pure elementwise work,
        # fused into the producer's epilogue) x int8 packed weights
        # (per-packed-output-channel symmetric absmax scales), int32
        # accumulation, f32 dequant+bias epilogue.  Exactly the packed
        # analogue of ops/conv.conv_block_int8: the packed per-channel
        # weight scales are the original per-filter scales tiled over the
        # two pixel phases, so every int32 accumulator sums the same
        # quantized products as the unpacked conv (associativity makes the
        # match exact — see test_fused_region int8 parity).
        p_l = params[step.li] if (not train and 0 <= step.li < len(params)) \
            else {}
        if "x_scale" in p_l:
            x_scale = jnp.asarray(p_l["x_scale"], jnp.float32)
            w4f = w4.astype(jnp.float32)
            if "w_scale" in p_l:
                # use the layer's stored per-filter scales, tiled over the
                # pixel phases (packed channel order is phase-major, see
                # b_fn's jnp.tile/concat) — the packed w_q then holds the
                # SAME quantized integers as the unpacked p["w_q"] (a
                # phase channel sees only a subset of the filter's taps,
                # so a per-packed-channel absmax would pick a different,
                # finer grid and break bit-exactness with conv_block_int8)
                s0 = jnp.asarray(p_l["w_scale"], jnp.float32)
                w_scale = jnp.tile(s0, w4.shape[-1] // s0.shape[0])
            else:
                w_scale = jnp.maximum(
                    jnp.max(jnp.abs(w4f), axis=(0, 1, 2)), 1e-8) / 127.0
            w_q = jnp.clip(jnp.round(w4f / w_scale), -127,
                           127).astype(jnp.int8)
            x_q = jnp.clip(jnp.round(src.astype(jnp.float32) / x_scale),
                           -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                x_q, w_q, (step.sy, step.sx),
                ((-dys[0], dys[-1]), (-djs[0], djs[-1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            beta = jnp.asarray(step.b_fn(params), jnp.float32)
            y = acc.astype(jnp.float32) * (x_scale * w_scale) \
                + jnp.concatenate([beta, beta])
            y = apply_activation(y.astype(cd), step.act)
            slots[step.out_slot] = y
            continue

        # inference fp path (train went through _train_step above)
        # f32 compute = the parity path: HIGHEST precision like
        # ops/conv.conv2d_raw (TPU default f32 conv is bf16-reduced)
        precision = lax.Precision.HIGHEST if cd == jnp.float32 else None
        y = lax.conv_general_dilated(
            src.astype(cd), w4.astype(cd), (step.sy, step.sx),
            ((-dys[0], dys[-1]), (-djs[0], djs[-1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
            preferred_element_type=jnp.float32)
        beta = jnp.asarray(step.b_fn(params), jnp.float32)
        y = y + jnp.concatenate([beta, beta])
        y = y.astype(cd)
        y = apply_activation(y, step.act)
        slots[step.out_slot] = y
    return bn_stats


# --------------------------------------------------------------------------
# Forward-path integration
# --------------------------------------------------------------------------


def region_runner(plan: RegionPlan, *, compute_dtype=jnp.bfloat16,
                  interpret: bool = False, mode: str = "pallas",
                  train: bool = False, act_dtype=None,
                  step_remat: bool = False):
    """Returns run(params, x_nhwc) -> out_nhwc for use in nn/emit.py.

    For a stem plan, x is the raw net input (any float dtype); otherwise x
    is the previous layer's NHWC output.  Weight packing happens inside
    the traced function — tiny ops, hoisted/cached by jit.

    mode="xla" runs the packed algebra as plain lax.convs (measured faster
    on v5e than the monolithic Pallas kernel: XLA's transcendental
    lowering and epilogue fusion beat Mosaic's, and the MXU work is the
    same); mode="pallas" uses the single-kernel path; mode="hybrid" runs
    the stride-1 step prefix (hybrid_prefix) as one Pallas kernel and the
    strided remainder as XLA packed convs — the best of both where the
    prefix's intermediates (esp. the stem fold's 757 MB conv0'' output at
    608x608/b32) are HBM-bound under XLA.
    """
    cd = compute_dtype
    if mode == "hybrid" and not train:
        pre = hybrid_prefix(plan)
        if pre is None:
            mode = "xla" if plan.xla_only else "pallas"
        else:
            sub, k = pre

            def run_hybrid(params, x):
                if plan.stem:
                    from darknet_tpu.ops.stem import space_to_depth

                    x = space_to_depth(x)
                b, h, w, c = x.shape
                x_packed = x.reshape(b, h, w // 2, 2 * c).astype(cd)
                weights = [pack_step_weights(st, st.w_fn(params))
                           for st in sub.conv_steps]
                biases = [pack_step_bias(st, st.b_fn(params))
                          for st in sub.conv_steps]
                call = build_region_call(sub, b, compute_dtype=cd,
                                         interpret=interpret)
                yp = call(x_packed, weights, biases)
                slots = {sub.out_slot: yp}
                _run_steps_xla(params, slots, plan.steps[k:], cd)
                out = slots[plan.out_slot]
                return out.reshape(b, plan.out_h, plan.out_w, plan.out_c)

            return run_hybrid
    if mode == "xla" or plan.xla_only or train:
        return functools.partial(run_region_xla, plan, compute_dtype=cd,
                                 train=train, act_dtype=act_dtype,
                                 step_remat=step_remat)

    def run(params, x):
        if plan.stem:
            from darknet_tpu.ops.stem import space_to_depth

            x = space_to_depth(x)
        b, h, w, c = x.shape
        x_packed = x.reshape(b, h, w // 2, 2 * c).astype(cd)
        weights = [pack_step_weights(st, st.w_fn(params))
                   for st in plan.conv_steps]
        biases = [pack_step_bias(st, st.b_fn(params))
                  for st in plan.conv_steps]
        call = build_region_call(plan, b, compute_dtype=cd,
                                 interpret=interpret)
        yp = call(x_packed, weights, biases)
        return yp.reshape(b, plan.h, 2 * plan.w2, plan.out_c)

    return run
