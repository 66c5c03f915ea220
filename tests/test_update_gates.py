"""Per-layer update gates (UpdateNetworkGpu, network_kernels.cu:226-240).

Transfer-learning cfgs freeze layers three ways; the reference applies them
in the GPU interpreter's update loop:

  * ``burnin_update``: skip while ``burnin_update * net.burn_in > iter``
  * ``train_only_bn``: never update (weights frozen; BN rolling stats still
    move in the forward pass); back-propagates to earlier layers
    (SetTrainOnlyBn, parser.cpp:1058-1071)
  * ``dont_update``: an ITERATION THRESHOLD — update only once
    ``dont_update < iter`` (parser.cpp:1363, network_kernels.cu:237)

While gated, the backward pass still ACCUMULATES into the updates buffer;
the backlog applies in one step when the gate opens.
Also covers ``clip=`` (constrain_ongpu, convolutional_kernels.cu:919-921).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.train.step import init_opt_state, make_train_step

CFG_TMPL = """[net]
batch=2
subdivisions=1
width=32
height=32
channels=3
learning_rate=0.01
momentum=0.9
decay=0.0005
burn_in=2
{adam}
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
{flag0}
[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky
{flag1}
[convolutional]
filters=16
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=3
anchors=8,8, 16,16
ignore_thresh=.5
"""


def _setup(flag0="", flag1="", adam=""):
    g = build_graph(CFG_TMPL.format(flag0=flag0, flag1=flag1, adam=adam),
                    train=True)
    params = paramlib.init_params(g, seed=0)
    return g, params


def _data(rng):
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    truths = np.zeros((2, 4, 5), np.float32)
    truths[:, 0] = [0.55, 0.55, 0.25, 0.25, 1]
    return jnp.asarray(x), jnp.asarray(truths)


def _run(g, params, n_steps, lr=0.01):
    """Run n_steps; return list of per-step param snapshots (numpy)."""
    step = make_train_step(g, donate=False)
    opt = init_opt_state(g, params)
    rng = np.random.default_rng(0)
    x, truths = _data(rng)
    key = jax.random.PRNGKey(0)
    snaps = []
    for _ in range(n_steps):
        params, opt, cost, _ = step(params, opt, x, truths, key, lr)
        assert np.isfinite(float(cost))
        snaps.append(([{k: np.asarray(v) for k, v in p.items()}
                       for p in params], jax.tree.map(np.asarray, opt)))
    return snaps


def test_dont_update_is_iteration_threshold(rng):
    # dont_update=3: layer 0 frozen for iter 1..3 (3 < iter fails), first
    # update at iter 4 applies the accumulated backlog
    g, params0 = _setup(flag0="dont_update=3")
    w0 = np.asarray(params0[0]["w"])
    snaps = _run(g, [dict(p) for p in params0], 5)

    for it in range(3):                       # iters 1..3: frozen
        np.testing.assert_array_equal(snaps[it][0][0]["w"], w0)
        # ...but the backlog accumulates in the updates buffer
        assert np.abs(snaps[it][1]["u"][0]["w"]).sum() > 0
    # iter 4: gate opens, weights move
    assert not np.array_equal(snaps[3][0][0]["w"], w0)
    # un-gated layers trained from step 1
    assert not np.array_equal(snaps[0][0][2]["w"],
                              np.asarray(params0[2]["w"]))


def test_dont_update_backlog_grows_monotonically(rng):
    g, params0 = _setup(flag0="dont_update=3")
    snaps = _run(g, [dict(p) for p in params0], 3)
    norms = [np.abs(s[1]["u"][0]["w"]).sum() for s in snaps]
    # same batch every step: the un-decayed backlog strictly grows
    assert norms[0] < norms[1] < norms[2]


def test_burnin_update_gate(rng):
    # burn_in=2, burnin_update=2 -> skip while 4 > iter (iters 1..3),
    # update from iter 4
    g, params0 = _setup(flag1="burnin_update=2")
    w1 = np.asarray(params0[1]["w"])
    snaps = _run(g, [dict(p) for p in params0], 4)
    for it in range(3):
        np.testing.assert_array_equal(snaps[it][0][1]["w"], w1)
    assert not np.array_equal(snaps[3][0][1]["w"], w1)


def test_train_only_bn_freezes_and_backpropagates(rng):
    # train_only_bn on layer 1 back-propagates to layer 0: both layers'
    # weights/biases/scales frozen forever; BN rolling stats still move;
    # the head conv (after it) trains
    g, params0 = _setup(flag1="train_only_bn=1")
    assert g.layers[0].train_only_bn and g.layers[1].train_only_bn
    assert not g.layers[2].train_only_bn
    snaps = _run(g, [dict(p) for p in params0], 4)
    last = snaps[-1][0]
    for li in (0, 1):
        for k in ("w", "b", "scales"):
            np.testing.assert_array_equal(last[li][k],
                                          np.asarray(params0[li][k]))
        # rolling stats update in the forward pass, not the optimizer
        assert not np.array_equal(last[li]["mean"],
                                  np.asarray(params0[li]["mean"]))
    assert not np.array_equal(last[2]["w"], np.asarray(params0[2]["w"]))


def test_gates_under_adam(rng):
    # the same gate logic guards the Adam path (network_kernels.cu gates
    # l->update_gpu regardless of optimizer)
    g, params0 = _setup(flag0="dont_update=2", adam="adam=1\nB1=0.9\nB2=0.999")
    w0 = np.asarray(params0[0]["w"])
    snaps = _run(g, [dict(p) for p in params0], 3)
    np.testing.assert_array_equal(snaps[0][0][0]["w"], w0)   # iter 1
    np.testing.assert_array_equal(snaps[1][0][0]["w"], w0)   # iter 2
    assert not np.array_equal(snaps[2][0][0]["w"], w0)       # iter 3
    # pending-updates buffer: accumulates while gated, zeroed once applied
    assert np.abs(snaps[1][1]["u"][0]["w"]).sum() > 0
    assert np.abs(snaps[2][1]["u"][0]["w"]).sum() == 0


def test_clip_constrains_conv_weights(rng):
    g, params0 = _setup(flag0="clip=0.01")
    snaps = _run(g, [dict(p) for p in params0], 2, lr=10.0)
    w = snaps[-1][0][0]["w"]
    assert np.abs(w).max() <= 0.01 + 1e-7
    # sanity: an unclipped layer under the same huge lr exceeds the bound
    assert np.abs(snaps[-1][0][2]["w"]).max() > 0.01


def test_gate_counter_resumes_from_seen():
    """Weights-only resume: the gate iteration counter must be seeded
    from the resumed iteration (GetCurrIter = seen/batch,
    network.cpp:225-231) — NOT restart at 0, which would re-freeze
    dont_update/burnin_update layers after every restart."""
    g, params = _setup(flag0="dont_update=3")
    step = make_train_step(g, donate=False)
    rng = np.random.default_rng(0)
    x, truths = _data(rng)
    key = jax.random.PRNGKey(0)

    # resumed at iteration 10 (> dont_update=3): layer 0 must update
    # on the very first step
    opt = init_opt_state(g, params, iter0=10)
    p2, opt, cost, _ = step(params, opt, x, truths, key, 0.01)
    assert not np.allclose(np.asarray(p2[0]["w"]),
                           np.asarray(params[0]["w"]))

    # fresh run (iter0=0): the same first step must leave it frozen
    opt0 = init_opt_state(g, params, iter0=0)
    p3, _, _, _ = step(params, opt0, x, truths, key, 0.01)
    np.testing.assert_array_equal(np.asarray(p3[0]["w"]),
                                  np.asarray(params[0]["w"]))


def test_adam_pending_buffer_only_for_gated_layers():
    """The Adam pending-updates buffer exists only where a temporary
    gate needs it (review finding: a params-sized zero buffer on every
    ungated layer costs HBM + zero-fill for nothing)."""
    g, params = _setup(flag0="burnin_update=2", adam="adam=1")
    opt = init_opt_state(g, params)
    assert opt["u"][0], "gated layer must carry the pending buffer"
    assert not opt["u"][1], "ungated layer must not"
    # and the step still runs + matches structure across iterations
    step = make_train_step(g, donate=False)
    rng = np.random.default_rng(0)
    x, truths = _data(rng)
    key = jax.random.PRNGKey(0)
    params2, opt2, cost, _ = step(params, opt, x, truths, key, 0.01)
    assert np.isfinite(float(cost))
    assert set(opt2["u"][0].keys()) == set(opt["u"][0].keys())
    assert not opt2["u"][1]
