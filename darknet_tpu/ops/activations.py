"""The 21-activation zoo, numerically matched to the reference.

Reference: `activations.h:63-140` (scalar formulas), `activations.c:168-280`
(swish/mish/channel-normalize array variants).  Key numerics to preserve:

* leaky slope 0.1 (not 0.01), relie slope 0.01;
* mish uses softplus with threshold 20: softplus(x) = x for x>20,
  exp(x) for x<-20, log1p(exp(x)) otherwise (`activations.c:185-197`);
* gelu is the tanh approximation `0.5x(1+tanh(0.797885x + 0.035677x^3))`;
* NORM_CHAN* normalize across the channel dimension per spatial position
  (`activations.c:199-280`) with eps=1e-4 added to the denominator sum.

All functions take NHWC tensors (channels last); channel-normalizing
variants reduce over axis -1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(x):
    return x


def logistic(x):
    return jax.nn.sigmoid(x)


def loggy(x):
    return 2.0 * jax.nn.sigmoid(x) - 1.0


def relu(x):
    return jnp.maximum(x, 0)


def relu6(x):
    return jnp.clip(x, 0, 6)


def elu(x):
    return jnp.where(x >= 0, x, jnp.exp(jnp.minimum(x, 0)) - 1.0)


def selu(x):
    return jnp.where(x >= 0, 1.0507 * x,
                     1.0507 * 1.6732 * (jnp.exp(jnp.minimum(x, 0)) - 1.0))


def gelu(x):
    # reference uses the tanh approximation with truncated constants
    return 0.5 * x * (1.0 + jnp.tanh(0.797885 * x + 0.035677 * x ** 3))


def relie(x):
    return jnp.where(x > 0, x, 0.01 * x)


def ramp(x):
    return x * (x > 0) + 0.1 * x


def leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def tanh_act(x):
    return jnp.tanh(x)


def softplus(x, threshold: float = 20.0):
    return jnp.where(
        x > threshold, x,
        jnp.where(x < -threshold, jnp.exp(jnp.minimum(x, 0)),
                  jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(x, 0)))


def mish(x):
    """x * tanh(softplus(x)) via the closed form
    tanh(ln(1+e^x)) = ((1+e^x)^2 - 1) / ((1+e^x)^2 + 1):
    one exp instead of exp+log+tanh, exact in f32 for |x| <= 20 and matching
    the reference's threshold-20 linear/exp tails outside."""
    ex = jnp.exp(jnp.clip(x, -20.0, 20.0))
    q = (1.0 + ex) * (1.0 + ex)
    y = x * (q - 1.0) / (q + 1.0)
    return jnp.where(x > 20.0, x, jnp.where(x < -20.0, x * jnp.tanh(ex), y))


def swish(x):
    return x * jax.nn.sigmoid(x)


def plse(x):
    return jnp.where(
        x < -4.0, 0.01 * (x + 4.0),
        jnp.where(x > 4.0, 0.01 * (x - 4.0) + 1.0, 0.125 * x + 0.5))


def stair(x):
    n = jnp.floor(x)
    even = jnp.floor(x / 2.0)
    odd = (x - n) + jnp.floor(x / 2.0)
    return jnp.where(jnp.mod(n, 2) == 0, even, odd)


def hardtan(x):
    return jnp.clip(x, -1.0, 1.0)


def lhtan(x):
    return jnp.where(x < 0, 0.001 * x,
                     jnp.where(x > 1, 0.001 * (x - 1.0) + 1.0, x))


def norm_chan(x):
    """Per-position channel normalization of positive values (NORM_CHAN)."""
    pos = jnp.maximum(x, 0)
    s = jnp.sum(pos, axis=-1, keepdims=True) + 1e-4
    return pos / s


def norm_chan_softmax(x):
    """Channel softmax without max subtraction (use_max_val=0 -> max_val=0)."""
    e = jnp.exp(x)
    s = jnp.sum(e, axis=-1, keepdims=True) + 1e-4
    return e / s


def norm_chan_softmax_maxval(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True) + 1e-4
    return e / s


def zero(x):
    """The reference's generic ``activate()``/``activate_kernel()`` switch
    (activations.c:97-137, activation_kernels.cu:144-184) has NO case for
    MISH/SWISH/NORM_CHAN* and falls through to ``return 0.0f`` — so every
    layer that activates through the generic path ([activation], [local],
    [scale_channels], [connected]; conv and shortcut have dedicated mish/
    swish branches) silently ZEROES its output for those activations, on
    both the CPU and GPU builds.  ``gradient()`` (activations.c:351-434)
    likewise defaults to 0 for mish/swish, which autodiff of this constant
    reproduces exactly.  The graph builder rewrites those (kind, act)
    combos to this activation (caught by fuzz seed 907)."""
    return jnp.zeros_like(x)


ACTIVATION_FNS = {
    "linear": linear,
    "zero": zero,
    "logistic": logistic,
    "loggy": loggy,
    "relu": relu,
    "relu6": relu6,
    "elu": elu,
    "selu": selu,
    "gelu": gelu,
    "relie": relie,
    "ramp": ramp,
    "leaky": leaky,
    "tanh": tanh_act,
    "mish": mish,
    "swish": swish,
    "plse": plse,
    "stair": stair,
    "hardtan": hardtan,
    "lhtan": lhtan,
    "normalize_channels": norm_chan,
    "normalize_channels_softmax": norm_chan_softmax,
    "normalize_channels_softmax_maxval": norm_chan_softmax_maxval,
}


def apply_activation(x, name: str):
    return ACTIVATION_FNS[name](x)
