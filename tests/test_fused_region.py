"""Fused-region kernel (ops/pallas/fused_region.py): planner invariants and
numerical parity of both execution modes (monolithic Pallas kernel in
interpret mode, and the p2-packed XLA conv form) against the plain
unfused f32 path.

The packed algebra must be EXACT (modulo f32 reduction order): pixel-pair
packing, tap decomposition, route folding and halo handling are all pure
reformulations of `convolutional_layer.cpp:1128-1305` semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.nn.emit import make_forward
from darknet_tpu.ops.pallas import fused_region as fr

# stem + one CSP block + a shortcut-only tail, mixed 1x1/3x3, mish+leaky
CSP_CFG = """[net]
batch=1
subdivisions=1
width=64
height=64
channels=3
[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=mish
[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=mish
[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=mish
[route]
layers = -2
[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=mish
[convolutional]
batch_normalize=1
filters=8
size=1
stride=1
pad=1
activation=leaky
[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=mish
[shortcut]
from=-3
activation=linear
[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=mish
[route]
layers = -1,-7
[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=mish
[convolutional]
filters=12
size=1
stride=1
pad=1
activation=linear
[yolo]
mask=0
num=1
classes=7
anchors=16,16
"""


@pytest.fixture(scope="module")
def setup():
    g = build_graph(CSP_CFG)
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=3))
    x = np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = make_forward(g, fused_bn=True, fuse_regions=False)(params, x)
    return g, params, x, ref


def test_planner_regions(setup):
    g, *_ = setup
    plans = fr.plan_graph_regions(g, stem=True)
    assert 0 in plans
    p = plans[0]
    assert p.stem and p.stop == 11     # extends through the head 1x1 conv
    # halo: stem (3x3 up1/dn1, then 2x2 up1) + one CSP 3x3
    assert (p.rt, p.rb) == (3, 2)
    assert p.out_c == 12
    assert p.tile is not None and p.h % p.tile == 0


def test_pallas_kernel_parity(setup):
    g, params, x, ref = setup
    f = make_forward(g, fused_bn=True, fuse_regions="pallas",
                     region_interpret=True)
    out = f(params, x)
    np.testing.assert_allclose(np.asarray(out["heads"][0]),
                               np.asarray(ref["heads"][0]),
                               rtol=1e-4, atol=1e-5)


def test_xla_packed_parity(setup):
    g, params, x, ref = setup
    f = make_forward(g, fused_bn=True, fuse_regions="xla")
    out = f(params, x)
    np.testing.assert_allclose(np.asarray(out["heads"][0]),
                               np.asarray(ref["heads"][0]),
                               rtol=1e-4, atol=1e-5)


def test_hybrid_mode_parity(setup):
    """hybrid = Pallas stride-1 prefix + XLA packed remainder.  The cut
    must reference only the boundary slot and reproduce the same output."""
    g, params, x, ref = setup
    plans = fr.plan_graph_regions(g, stem=True)
    pre = fr.hybrid_prefix(plans[0])
    assert pre is not None
    sub, k = pre
    assert k >= 2 and sub.tile is not None
    f = make_forward(g, fused_bn=True, fuse_regions="hybrid",
                     region_interpret=True)
    out = f(params, x)
    np.testing.assert_allclose(np.asarray(out["heads"][0]),
                               np.asarray(ref["heads"][0]),
                               rtol=1e-4, atol=1e-5)


STRIDED_CFG = """[net]
batch=1
subdivisions=1
width=64
height=64
channels=3
[convolutional]
filters=8
size=3
stride=1
pad=1
activation=mish
[convolutional]
filters=16
size=3
stride=2
pad=1
activation=mish
[convolutional]
filters=16
size=1
stride=1
pad=1
activation=leaky
[convolutional]
filters=16
size=3
stride=1
pad=1
activation=leaky
[shortcut]
from=-2
activation=linear
[convolutional]
filters=32
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=32
size=1
stride=1
pad=1
activation=leaky
[convolutional]
filters=12
size=1
stride=1
pad=1
activation=linear
[yolo]
mask=0
classes=7
anchors=16,16
"""


def test_hybrid_mode_strided_region():
    """A region containing a stride-2 conv (xla_only) still gets a Pallas
    prefix under hybrid mode; the strided remainder runs as XLA convs."""
    g = build_graph(STRIDED_CFG)
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=5))
    x = np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = make_forward(g, fused_bn=True, fuse_regions=False)(params, x)
    plans = fr.plan_graph_regions(g, stem=True)
    assert plans, "expected at least one region"
    a = min(plans)
    plan = plans[a]
    assert plan.xla_only, "region should contain the strided conv"
    pre = fr.hybrid_prefix(plan)
    assert pre is not None and pre[1] < len(plan.steps)
    f = make_forward(g, fused_bn=True, fuse_regions="hybrid",
                     region_interpret=True)
    out = f(params, x)
    np.testing.assert_allclose(np.asarray(out["heads"][0]),
                               np.asarray(ref["heads"][0]),
                               rtol=1e-4, atol=1e-5)


def test_region_spans_stages_but_skips_wide_ones():
    """One region covers the stem + BOTH lane-starved CSP stages via
    strided packed convs (stage-boundary pack/unpack reshapes are layout
    COPIES in TPU tiled memory — spanning them was worth ~20% e2e), and
    stops before stage 3 (>=128ch everywhere: packing it is pure 2x-FLOPs
    loss)."""
    from darknet_tpu import model_zoo

    g = build_graph(model_zoo.yolov4_cfg(128, 128))
    plans = fr.plan_graph_regions(g, stem=True)
    assert set(plans) == {0}
    p = plans[0]
    assert p.stop == 23 and p.xla_only and p.stem
    assert (p.out_h, p.out_w, p.out_c) == (32, 32, 128)
    strides = [st.sx for st in p.steps if isinstance(st, fr.ConvStep)]
    # layer 11's downsample is an explicit strided packed conv (the stem's
    # own stride-2 is folded into the s2d algebra)
    assert strides.count(2) == 1
    for st in p.steps:
        if isinstance(st, fr.ConvStep):
            assert st.act in fr.ELEMENTWISE_ACTS


def test_kernel_act_matches_reference():
    from darknet_tpu.ops.activations import apply_activation

    x = jnp.asarray(np.linspace(-30, 30, 401, dtype=np.float32))
    for act in ("leaky", "mish", "relu", "swish", "logistic", "tanh",
                "gelu", "hardtan", "relu6"):
        got = np.asarray(fr.kernel_act(x, act))
        want = np.asarray(apply_activation(x, act))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=act)


@pytest.mark.parametrize("seed", [11, 23, 41, 101, 137, 251])
def test_region_parity_on_random_graphs(seed):
    """The planner must stay exact on arbitrary graphs: random cfgs (incl.
    stride-2 convs, maxpools and upsamples that break regions, shortcut/
    route combos) — packed-region output vs the unfused path."""
    from tests.test_reference_fuzz import random_cfg

    g = build_graph(random_cfg(seed))
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=1))
    x = np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = make_forward(g, fused_bn=True, fuse_regions=False)(params, x)
    got = make_forward(g, fused_bn=True, fuse_regions="xla")(params, x)
    np.testing.assert_allclose(np.asarray(got["heads"][0]),
                               np.asarray(ref["heads"][0]),
                               rtol=1e-4, atol=1e-5)


TRAIN_CSP_CFG = CSP_CFG.replace("batch=1", "batch=2")


def test_train_region_parity_forward_stats_grads():
    """Training-mode packed regions: batch-BN inside the packed layout
    (phase-pair lane combine = ops/conv.batch_mean_var math exactly), and
    jax.grad through the region matches the unfused train path.

    (On deep nets at random init the f32 grad conditioning floor is ~0.3
    max-rel — a 1e-6 param perturbation moves grads that much — so the
    tight gate lives on this shallow net.)"""
    import jax

    g = build_graph(TRAIN_CSP_CFG, train=True)
    params = paramlib.init_params(g, seed=5)
    x = np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)

    f_ref = make_forward(g, train=True, fuse_regions=False)
    f_new = make_forward(g, train=True, fuse_regions="xla")
    from darknet_tpu.ops.pallas import fused_region as frm
    plans = frm.plan_graph_regions(g, train=True)
    assert plans, "no train region planned"
    assert any(getattr(s, "bn", False)
               for p in plans.values() for s in p.steps)

    def loss(f):
        def go(p):
            r = f(p, x)
            aux = (r["raw_heads"], r["bn_stats"])
            return jnp.sum(jnp.square(r["raw_heads"][0])), aux
        return go

    (v1, (h1, s1)), g1 = jax.value_and_grad(loss(f_ref), has_aux=True)(params)
    (v2, (h2, s2)), g2 = jax.value_and_grad(loss(f_new), has_aux=True)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h1[0]), np.asarray(h2[0]),
                               rtol=1e-4, atol=1e-4)
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k][0]), np.asarray(s2[k][0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1[k][1]), np.asarray(s2[k][1]),
                                   rtol=1e-4, atol=1e-5)
    for pa, pb in zip(g1, g2):
        for key in pa:
            a, b = np.asarray(pa[key]), np.asarray(pb[key])
            np.testing.assert_allclose(
                a, b, rtol=2e-3, atol=2e-3 * (np.abs(a).max() + 1e-6),
                err_msg=key)


def test_train_step_with_regions_matches():
    """Full make_train_step with training regions vs without: costs track
    over several optimizer steps."""
    import jax

    from darknet_tpu.train.step import init_opt_state, make_train_step

    g = build_graph(TRAIN_CSP_CFG, train=True)
    x = np.random.default_rng(2).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    truths = np.zeros((2, 8, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.4, 0.4, 3]

    costs = {}
    for name, fuse in (("unfused", False), ("regions", "xla")):
        import darknet_tpu.nn.emit as emitlib
        import darknet_tpu.train.step as steplib

        params = paramlib.init_params(g, seed=5)
        opt = init_opt_state(g, params)
        fwd = emitlib.make_forward(g, train=True, fuse_regions=fuse)
        import unittest.mock as mock
        with mock.patch.object(steplib, "make_forward",
                               lambda *a, **kw: fwd):
            step = steplib.make_train_step(g, jit=True, donate=False)
        cs = []
        for it in range(6):
            params, opt, cost, _m = step(params, opt, jnp.asarray(x),
                                         jnp.asarray(truths),
                                         jax.random.PRNGKey(it),
                                         jnp.float32(1e-3))
            cs.append(float(cost))
        costs[name] = cs
    np.testing.assert_allclose(costs["unfused"], costs["regions"],
                               rtol=5e-3)
    assert costs["regions"][-1] < costs["regions"][0]


def test_train_region_remat_matches():
    """remat=True wraps the region runner in jax.checkpoint — gradients
    must be identical to the non-remat region path (recompute changes
    memory, not math)."""
    import jax

    g = build_graph(TRAIN_CSP_CFG, train=True)
    params = paramlib.init_params(g, seed=5)
    x = np.random.default_rng(2).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)

    f_a = make_forward(g, train=True, fuse_regions="xla")
    f_b = make_forward(g, train=True, fuse_regions="xla", remat="all")

    def loss(f):
        def go(p):
            r = f(p, x)
            return jnp.sum(jnp.square(r["raw_heads"][0]))
        return go

    v1, g1 = jax.value_and_grad(loss(f_a))(params)
    v2, g2 = jax.value_and_grad(loss(f_b))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for pa, pb in zip(g1, g2):
        for key in pa:
            np.testing.assert_allclose(np.asarray(pa[key]),
                                       np.asarray(pb[key]),
                                       rtol=1e-5, atol=1e-6, err_msg=key)


def test_int8_region_matches_per_layer_int8():
    """Packed int8 region == per-layer conv_block_int8 chain, bit-exact.

    With a static activation scale on every conv, each packed step
    quantizes the same values (packing rearranges, adds only zeros), the
    int32 accumulators sum the same products (integer addition is
    associative), and the f32 dequant+bias epilogue is the same 3-op
    chain — so the region output must equal the unpacked int8 path
    exactly, not just approximately."""
    g = build_graph(CSP_CFG)
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=3))
    # quantize EVERY conv (min_ch=1, heads too) so all region steps go int8
    params = paramlib.quantize_conv_params(g, params, min_ch=1,
                                           skip_heads=False)
    x = np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    absmax = paramlib.calibrate_conv_input_scales(g, params, [x])
    conv_idx = {i for i, l in enumerate(g.layers)
                if l.kind == "convolutional"}
    params = paramlib.apply_conv_input_scales(params, absmax, graph=g,
                                              extra=conv_idx)
    assert all("x_scale" in params[i] for i in conv_idx)

    cd = jnp.bfloat16
    ref = make_forward(g, fused_bn=True, fuse_regions=False,
                       stem_s2d=False, compute_dtype=cd)(params, x)
    got = make_forward(g, fused_bn=True, fuse_regions="xla",
                       compute_dtype=cd)(params, x)
    np.testing.assert_array_equal(np.asarray(got["heads"][0], np.float32),
                                  np.asarray(ref["heads"][0], np.float32))


def test_calibrate_int8_region_opt_in():
    """Network.calibrate_int8: region_int8=True attaches x_scale to
    region-covered convs minus head-feeding ones; default (False) leaves
    only the quantized ("w_q") convs scaled."""
    from darknet_tpu.nn.network import Network
    from darknet_tpu.nn.emit import region_conv_indices

    g = build_graph(CSP_CFG)
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=5))
    params = paramlib.quantize_conv_params(g, params, min_ch=1)
    rng = np.random.default_rng(1)
    imgs = [rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)]

    net = Network(g, [dict(p) for p in params], fused=True)
    net.calibrate_int8(imgs)
    scaled_default = {i for i, p in enumerate(net.params) if "x_scale" in p}
    assert scaled_default == {i for i, p in enumerate(params) if "w_q" in p}

    net2 = Network(g, [dict(p) for p in params], fused=True)
    net2.calibrate_int8(imgs, region_int8=True)
    scaled = {i for i, p in enumerate(net2.params) if "x_scale" in p}
    covered = region_conv_indices(g, fused_bn=True)
    head_in = {l.index - 1 for l in g.layers
               if l.kind in ("yolo", "gaussian_yolo", "detection")}
    assert (covered - head_in) <= scaled
    # quantize_conv_params skips head convs (skip_heads default), so no
    # head-feeding conv may carry a scale through either route
    assert not (scaled & head_in)


def test_int8_region_head_conv_stays_fp():
    """Network.calibrate_int8 must not attach scales to head-feeding convs
    even when a region covers them (CSP_CFG's region runs through the head
    1x1 conv)."""
    from darknet_tpu.nn.emit import region_conv_indices

    g = build_graph(CSP_CFG)
    covered = region_conv_indices(g, fused_bn=True)
    assert 11 in covered          # the head conv IS region-covered
    head_in = {l.index - 1 for l in g.layers
               if l.kind in ("yolo", "gaussian_yolo", "detection")}
    assert 11 in head_in          # ...and is a head input: must be excluded


def test_train_region_bf16_interior_close():
    """Opt-in reduced-precision region interior (act_dtype=bfloat16,
    run_region_xla): BN stats stay f32-computed, forward/grads agree with
    the f32-interior path to bf16 quantization tolerance, and the region
    output is handed back as f32."""
    import jax

    g = build_graph(TRAIN_CSP_CFG, train=True)
    params = paramlib.init_params(g, seed=5)
    x = np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)

    f_32 = make_forward(g, train=True, fuse_regions="xla")
    f_16 = make_forward(g, train=True, fuse_regions="xla",
                        train_act_dtype=jnp.bfloat16)

    def loss(f):
        def go(p):
            r = f(p, x)
            return jnp.sum(jnp.square(r["raw_heads"][0])), r
        return go

    (v1, r1), g1 = jax.value_and_grad(loss(f_32), has_aux=True)(params)
    (v2, r2), g2 = jax.value_and_grad(loss(f_16), has_aux=True)(params)
    assert r2["raw_heads"][0].dtype == r1["raw_heads"][0].dtype
    np.testing.assert_allclose(float(v2), float(v1), rtol=0.05)
    for k in r1["bn_stats"]:
        np.testing.assert_allclose(np.asarray(r2["bn_stats"][k][0]),
                                   np.asarray(r1["bn_stats"][k][0]),
                                   rtol=0.05, atol=0.02)
    for pa, pb in zip(g1, g2):
        for key in pa:
            a, b = np.asarray(pa[key]), np.asarray(pb[key])
            assert np.isfinite(b).all(), key
            np.testing.assert_allclose(
                b, a, rtol=0.2, atol=0.05 * (np.abs(a).max() + 1e-6),
                err_msg=key)


def test_train_region_step_remat_matches():
    """remat="steps" checkpoints each region conv step individually
    (stores only the slot tensors, recomputes the step's conv+BN+act in
    backward) — values and gradients must equal the non-remat path."""
    import jax

    g = build_graph(TRAIN_CSP_CFG, train=True)
    params = paramlib.init_params(g, seed=5)
    x = np.random.default_rng(2).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)

    f_a = make_forward(g, train=True, fuse_regions="xla")
    f_b = make_forward(g, train=True, fuse_regions="xla", remat="steps")

    def loss(f):
        def go(p):
            r = f(p, x)
            return (jnp.sum(jnp.square(r["raw_heads"][0])), r["bn_stats"])
        return go

    (v1, s1), g1 = jax.value_and_grad(loss(f_a), has_aux=True)(params)
    (v2, s2), g2 = jax.value_and_grad(loss(f_b), has_aux=True)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s2[k][0]), np.asarray(s1[k][0]),
                                   rtol=1e-6, atol=1e-8)
    for pa, pb in zip(g1, g2):
        for key in pa:
            np.testing.assert_allclose(np.asarray(pa[key]),
                                       np.asarray(pb[key]),
                                       rtol=1e-5, atol=1e-6, err_msg=key)
