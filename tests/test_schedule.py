"""LR schedule unit tests — GetCurrLr (network.cpp:32-84) semantics,
including this fork's fractional-steps quirk and burn-in warmup."""

import math

import numpy as np
import pytest

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.train.schedule import get_lr


def _net(policy_lines):
    text = ("[net]\nwidth=32\nheight=32\nchannels=3\nlearning_rate=0.1\n"
            + policy_lines + "\n[avgpool]\n")
    g = build_graph(text, train=True)
    return g.net


def test_burn_in_warmup():
    net = _net("policy=constant\nburn_in=100\npower=4")
    # lr * (iter/burn_in)^power during warmup (network.cpp:35-36)
    np.testing.assert_allclose(get_lr(net, 50), 0.1 * 0.5 ** 4)
    np.testing.assert_allclose(get_lr(net, 100), 0.1)


def test_constant():
    net = _net("policy=constant")
    assert get_lr(net, 12345) == pytest.approx(0.1)


def test_step_policy():
    net = _net("policy=step\nstep=100\nscale=0.5")
    np.testing.assert_allclose(get_lr(net, 250), 0.1 * 0.5 ** 2)


def test_steps_policy_fractional():
    """This fork's quirk: step boundaries are FRACTIONS of max_iter
    (network.cpp:49)."""
    net = _net("policy=steps\nsteps=0.8,0.9\nscales=.1,.1")
    net.max_iter = 1000
    assert get_lr(net, 500) == pytest.approx(0.1)
    assert get_lr(net, 850) == pytest.approx(0.01)
    assert get_lr(net, 950) == pytest.approx(0.001)


def test_exp_policy():
    net = _net("policy=exp\ngamma=0.99")
    np.testing.assert_allclose(get_lr(net, 10), 0.1 * 0.99 ** 10)


def test_poly_policy():
    net = _net("policy=poly\npower=2")
    net.max_iter = 100
    np.testing.assert_allclose(get_lr(net, 50), 0.1 * 0.5 ** 2)


def test_sig_policy():
    net = _net("policy=sigmoid\ngamma=0.1\nstep=50")
    want = 0.1 / (1 + math.exp(0.1 * (30 - 50)))
    np.testing.assert_allclose(get_lr(net, 30), want)


def test_sgdr_policy():
    net = _net("policy=sgdr\nsgdr_cycle=100\nsgdr_mult=2\n"
               "learning_rate_min=0.001")
    net.max_iter = 1000
    # iter 0: cos(0) -> max lr
    np.testing.assert_allclose(get_lr(net, 0), 0.1)
    # mid first cycle: lr_min + 0.5*(lr-lr_min)*(1+cos(pi/2)) at iter 50
    want = 0.001 + 0.5 * (0.1 - 0.001) * (1 + math.cos(math.pi * 0.5))
    np.testing.assert_allclose(get_lr(net, 50), want)
    # second cycle is 200 long (mult=2), starting at 100
    want2 = 0.001 + 0.5 * (0.1 - 0.001) * (1 + math.cos(50 / 200 * math.pi))
    np.testing.assert_allclose(get_lr(net, 150), want2)


def test_random_policy_uses_rand():
    net = _net("policy=random\npower=2")
    np.testing.assert_allclose(get_lr(net, 5, rand01=0.5), 0.1 * 0.25)


def test_adam_training_path(rng):
    """adam=1 wires the Adam update (adam_update_gpu semantics): bias
    correction active, loss decreases."""
    import jax
    import jax.numpy as jnp

    from darknet_tpu.nn import params as paramlib
    from darknet_tpu.train.step import init_opt_state, make_train_step

    cfg = """[net]
width=32
height=32
channels=3
learning_rate=0.001
adam=1
B1=0.9
B2=0.999
eps=0.000001
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=16
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=3
anchors=8,8, 16,16
iou_loss=ciou
max_delta=5
"""
    g = build_graph(cfg, train=True)
    assert g.net.adam
    params = paramlib.init_params(g, seed=0)
    step = make_train_step(g, donate=False)
    opt = init_opt_state(g, params)
    assert "m" in opt and "t" in opt          # adam slots selected
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    truths = np.zeros((2, 4, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 1]
    truths = jnp.asarray(truths)
    costs = []
    for _ in range(20):
        params, opt, c, m = step(params, opt, x, truths,
                                 jax.random.PRNGKey(0), 0.001)
        costs.append(float(c))
    assert int(opt["t"]) == 20
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0]
