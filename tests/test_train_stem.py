"""Training-mode packed stem (ops/stem.fused_stem_train): exact parity
with the per-layer path — forward, live BN statistics, and parameter
gradients.  The packed form is a pure reformulation (S2D coordinates,
phase-packed channels) of the reference's conv+BN forward/backward
(convolutional_layer.cpp, batchnorm_layer.c), so everything must agree
to f32 reduction-order tolerance."""

import numpy as np

import jax
import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.nn.emit import make_forward

STEM_CFG = """[net]
batch=2
subdivisions=1
width=32
height=32
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
activation=leaky
[convolutional]
filters=12
size=1
stride=1
pad=1
activation=linear
"""

STEM_CFG_NOBN = STEM_CFG.replace("batch_normalize=1\n", "")


def _emitted(cfg_text, stem_train, remat=False):
    g = build_graph(cfg_text)
    params = paramlib.init_params(g, seed=7)
    fwd = make_forward(g, train=True, stem_train=stem_train, remat=remat)
    return g, params, fwd


def _run(cfg_text, stem_train, remat=False):
    g, params, fwd = _emitted(cfg_text, stem_train, remat)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    r = fwd(params, x)

    def loss(p):
        return jnp.sum(jnp.square(fwd(p, x)["output"]))

    grads = jax.grad(loss)(params)
    return r, grads


def test_forward_and_bn_stats_match_plain():
    r_plain, _ = _run(STEM_CFG, stem_train=False)
    r_pack, _ = _run(STEM_CFG, stem_train=True)
    np.testing.assert_allclose(np.asarray(r_pack["output"]),
                               np.asarray(r_plain["output"]),
                               rtol=2e-5, atol=2e-6)
    assert set(r_pack["bn_stats"]) == set(r_plain["bn_stats"]) == {0, 1}
    for i in (0, 1):
        for a, b in zip(r_pack["bn_stats"][i], r_plain["bn_stats"][i]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)


def test_param_gradients_match_plain():
    _, g_plain = _run(STEM_CFG, stem_train=False)
    _, g_pack = _run(STEM_CFG, stem_train=True)
    for i, (gp, gq) in enumerate(zip(g_plain, g_pack)):
        for k in gp:
            np.testing.assert_allclose(
                np.asarray(gq[k]), np.asarray(gp[k]),
                rtol=5e-4, atol=5e-6,
                err_msg=f"layer {i} grad {k}")


def test_no_bn_stem_matches_plain():
    r_plain, g_plain = _run(STEM_CFG_NOBN, stem_train=False)
    r_pack, g_pack = _run(STEM_CFG_NOBN, stem_train=True)
    np.testing.assert_allclose(np.asarray(r_pack["output"]),
                               np.asarray(r_plain["output"]),
                               rtol=2e-5, atol=2e-6)
    assert not r_pack["bn_stats"]
    for gp, gq in zip(g_plain, g_pack):
        for k in gp:
            np.testing.assert_allclose(np.asarray(gq[k]), np.asarray(gp[k]),
                                       rtol=5e-4, atol=5e-6)


def test_remat_stem_same_values():
    r0, g0 = _run(STEM_CFG, stem_train=True, remat=False)
    r1, g1 = _run(STEM_CFG, stem_train=True, remat=True)
    np.testing.assert_array_equal(np.asarray(r0["output"]),
                                  np.asarray(r1["output"]))
    for gp, gq in zip(g0, g1):
        for k in gp:
            np.testing.assert_allclose(np.asarray(gq[k]), np.asarray(gp[k]),
                                       rtol=1e-6, atol=1e-8)


HEAD_CFG = STEM_CFG + """[convolutional]
filters=18
size=1
stride=1
pad=1
activation=linear
[yolo]
mask=0,1,2
anchors=10,14, 23,27, 37,58
classes=1
num=3
"""


def test_stem_train_under_spatial_sharding():
    """The S2D reshape must partition correctly when H is sharded over an
    sp mesh axis (GSPMD inserts the pair-regrouping exchanges): one train
    step over a (dp, sp) mesh == the unsharded step."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from darknet_tpu.train.step import init_opt_state, make_train_step

    g = build_graph(HEAD_CFG)
    params = paramlib.init_params(g, seed=5)
    opt0 = init_opt_state(g, params)
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    truths = np.zeros((4, 8, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 0]
    key, lr = jax.random.PRNGKey(0), jnp.float32(1e-3)

    inner = make_train_step(g, jit=False, stem_train=True)
    p1, _, c1, _ = jax.jit(inner)(params, opt0, x, truths, key, lr)

    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("dp", "sp"))
    rep = NamedSharding(mesh, P())
    x_sh = NamedSharding(mesh, P("dp", "sp", None, None))
    step = jax.jit(inner, in_shardings=(rep, rep, x_sh,
                                        NamedSharding(mesh, P("dp")),
                                        rep, rep),
                   out_shardings=(rep, rep, rep, rep))
    p2, _, c2, _ = step(jax.device_put(params, rep),
                        jax.device_put(opt0, rep),
                        jax.device_put(x, x_sh),
                        jax.device_put(truths,
                                       NamedSharding(mesh, P("dp"))),
                        key, lr)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_stem_train_under_tensor_parallelism():
    """pack_w0/pack_w1 read tp-sharded filter weights (HWIO dim 3 sharded):
    GSPMD must resolve the packed-weight gathers — one tp train step with
    the packed stem == single-device."""
    import jax
    from jax.sharding import Mesh

    from darknet_tpu.parallel.tensor import make_tp_train_step
    from darknet_tpu.train.step import init_opt_state, make_train_step

    g = build_graph(HEAD_CFG)
    params = paramlib.init_params(g, seed=5)
    opt0 = init_opt_state(g, params)
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    truths = np.zeros((4, 8, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 0]
    key, lr = jax.random.PRNGKey(0), jnp.float32(1e-3)

    inner = make_train_step(g, jit=False, stem_train=True)
    p1, _, c1, _ = jax.jit(inner)(params, opt0, x, truths, key, lr)

    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    step, place = make_tp_train_step(g, mesh, stem_train=True)
    pp, oo, xx, tt = place(params, opt0, x, truths)
    p2, _, c2, _ = step(pp, oo, xx, tt, key, lr)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_stem_train_under_pipeline_training():
    """PipelineTrain with the packed stem: cut bookkeeping must match the
    emitted program (stem fuses layers 0-1 — cut 1 forbidden) and the
    GPipe step must equal the single-device accumulation step."""
    import jax

    from darknet_tpu.parallel.pipeline import PipelineTrain
    from darknet_tpu.train.step import init_opt_state, make_train_step

    g = build_graph(HEAD_CFG)
    params = paramlib.init_params(g, seed=5)
    opt0 = init_opt_state(g, params)
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    truths = np.zeros((4, 8, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 0]
    key = jax.random.PRNGKey(0)

    inner = make_train_step(g, jit=False, stem_train=True, accum=2)
    p1, _, c1, _ = jax.jit(inner)(params, opt0, x, truths, key,
                                  jnp.float32(1e-3))

    pt = PipelineTrain(g, params, jax.devices()[:2], microbatches=2,
                       stem_train=True)
    c2, _ = pt.step(x, truths, key, 1e-3)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)
    p2 = pt.gather_params()
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_train_act_dtype_bf16_close_and_heads_stay_f32():
    """train_act_dtype=bfloat16: interlayer conv outputs carry bf16, but
    head-feeding convs stay f32 (loss math dtype-identical); one train
    step lands close to the f32 path."""
    import jax

    from darknet_tpu.train.step import init_opt_state, make_train_step

    g = build_graph(HEAD_CFG)
    params = paramlib.init_params(g, seed=5)
    opt0 = init_opt_state(g, params)
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    truths = np.zeros((4, 8, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 0]
    key, lr = jax.random.PRNGKey(0), jnp.float32(1e-3)

    fwd = make_forward(g, train=True, train_act_dtype=jnp.bfloat16)
    r = fwd(params, jnp.asarray(x))
    assert r["raw_heads"][0].dtype == jnp.float32

    s32 = make_train_step(g, jit=False, compute_dtype=jnp.bfloat16)
    s16 = make_train_step(g, jit=False, compute_dtype=jnp.bfloat16,
                          train_act_dtype=jnp.bfloat16)
    p1, _, c1, _ = jax.jit(s32)(params, opt0, x, truths, key, lr)
    p2, _, c2, _ = jax.jit(s16)(params, opt0, x, truths, key, lr)
    np.testing.assert_allclose(float(c2), float(c1), rtol=0.05)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        # tolerance covers the act16 fast path's BN statistics, which
        # accumulate (in f32) from the bf16 conv output — the f32 copy of
        # each conv output intentionally never exists (round-5 keep_lp
        # epilogue), so stats carry bf16 input rounding (~0.4% per
        # element) on top of the interlayer bf16 rounding
        np.testing.assert_allclose(b, a, rtol=0.1,
                                   atol=0.08 * (np.abs(a).max() + 1e-6))


import pytest


@pytest.mark.parametrize("n0,n1,act0,act1,hw", [
    (4, 8, "swish", "mish", (24, 40)),     # non-square
    (16, 32, "leaky", "relu", (32, 32)),
    (8, 8, "mish", "logistic", (40, 24)),
])
def test_fused_stem_train_fuzz(n0, n1, act0, act1, hw):
    """Packed train stem across filter counts, activations and non-square
    dims: forward + grads must match the per-layer path."""
    h, w = hw
    cfg = f"""[net]
batch=2
subdivisions=1
width={w}
height={h}
channels=3
[convolutional]
batch_normalize=1
filters={n0}
size=3
stride=1
pad=1
activation={act0}
[convolutional]
batch_normalize=1
filters={n1}
size=3
stride=2
pad=1
activation={act1}
[convolutional]
filters=6
size=1
stride=1
pad=1
activation=linear
"""
    g = build_graph(cfg)
    params = paramlib.init_params(g, seed=1)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))

    outs, grads = [], []
    for st in (False, True):
        fwd = make_forward(g, train=True, stem_train=st)
        outs.append(np.asarray(fwd(params, x)["output"]))
        grads.append(jax.grad(
            lambda p: jnp.sum(jnp.square(fwd(p, x)["output"])))(params))
    np.testing.assert_allclose(outs[1], outs[0], rtol=3e-5, atol=3e-6)
    for gp, gq in zip(grads[0], grads[1]):
        for k in gp:
            # atol floor: non-smooth activations (relu/leaky kinks) flip
            # a subgradient when f32 reordering moves a pre-activation
            # value across 0 — measure-zero, tiny absolute effect
            np.testing.assert_allclose(np.asarray(gq[k]), np.asarray(gp[k]),
                                       rtol=1e-3, atol=1e-4, err_msg=k)


def test_stem_train_skips_gated_layers():
    """stopbackward/onlyforward/train_only_bn on layer 0/1 must fall back
    to the per-layer path (where emit lowers the gates to stop_gradient)."""
    cfg = STEM_CFG.replace("activation=mish", "activation=mish\nstopbackward=1",
                           1)
    g = build_graph(cfg)
    params = paramlib.init_params(g, seed=7)
    fwd = make_forward(g, train=True, stem_train=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    def loss(p):
        return jnp.sum(jnp.square(fwd(p, x)["output"]))

    grads = jax.grad(loss)(params)
    # gradient is cut BELOW layer 0's output: conv0 weights get no grad
    assert float(jnp.max(jnp.abs(grads[0]["w"]))) == 0.0
    assert float(jnp.max(jnp.abs(grads[1]["w"]))) > 0.0
