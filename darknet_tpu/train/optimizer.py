"""Darknet-semantics optimizers as pure JAX update functions.

SGD+momentum (UpdateConvolutionalLayer, convolutional_layer.cpp:1382-1400):

    u  += -decay * batch * w          # weight decay only on conv weights
    w  += (lr/batch) * u
    u  *= momentum

where `u` is the persistent "updates" buffer holding the gradient-ASCENT
accumulation (darknet deltas are target-minus-pred).  We keep the darknet
convention internally: `grads` passed here are ascent directions; use
`negate=True` when feeding standard descent gradients.

Adam (adam_update_gpu, blas_kernels.cu:99-134):

    d   = grad - decay * batch * w
    m   = B1*m + (1-B1)*d ;  v = B2*v + (1-B2)*d^2
    w  += rate * m_hat / (sqrt(v_hat) + eps)      # rate NOT divided by batch

Also ports the update-side NaN hygiene of the fp16 path
(reset_nan_and_inf on updates, fix_nan_and_inf on weights,
convolutional_kernels.cu:881-882) and per-layer ``learning_rate_scale``.

State layout mirrors the params PyTree: per layer, per array, a velocity (or
m/v pair) of the same shape.  These buffers are exactly what the reference
does NOT checkpoint (SURVEY.md §5) — our checkpoints do include them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _zeros_like_params(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def init_sgd_state(params):
    return {"u": _zeros_like_params(params)}


def init_adam_state(params):
    return {
        "m": _zeros_like_params(params),
        "v": _zeros_like_params(params),
        "t": jnp.zeros((), jnp.int32),
    }


def _scrub(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def sgd_update(graph, params, grads, state, *, lr, momentum, decay, batch,
               scrub_nan: bool = True):
    """One darknet SGD+momentum step over the whole params list.

    `grads` are ascent directions (darknet deltas summed into updates).
    decay applies only to "w" arrays of conv/connected/local layers
    (biases/scales have no decay, reference :1392-1398).
    """
    new_params = []
    new_u = []
    for l, p, g, u in zip(graph.layers, params, grads, state["u"]):
        lr_l = lr * getattr(l, "learning_rate_scale", 1.0)
        np_, nu_ = {}, {}
        for k in p:
            pk, gk, uk = p[k], g.get(k), u.get(k)
            if gk is None or (getattr(l, "dont_update", False)):
                np_[k], nu_[k] = pk, uk if uk is not None else jnp.zeros_like(pk)
                continue
            if scrub_nan:
                gk = _scrub(gk)
                pk = _scrub(pk)
            uk = uk + gk
            if k == "w":
                uk = uk - decay * batch * pk
            pk = pk + (lr_l / batch) * uk
            uk = uk * momentum
            np_[k], nu_[k] = pk, uk
        new_params.append(np_)
        new_u.append(nu_)
    return new_params, {"u": new_u}


def adam_update(graph, params, grads, state, *, lr, B1, B2, eps, decay, batch,
                scrub_nan: bool = True):
    t = state["t"] + 1
    new_params, new_m, new_v = [], [], []
    bias_corr_m = 1.0 - jnp.power(B1, t.astype(jnp.float32))
    bias_corr_v = 1.0 - jnp.power(B2, t.astype(jnp.float32))
    for l, p, g, m, v in zip(graph.layers, params, grads, state["m"],
                             state["v"]):
        lr_l = lr * getattr(l, "learning_rate_scale", 1.0)
        np_, nm_, nv_ = {}, {}, {}
        for k in p:
            pk, gk = p[k], g.get(k)
            mk = m.get(k, jnp.zeros_like(pk))
            vk = v.get(k, jnp.zeros_like(pk))
            if gk is None or (getattr(l, "dont_update", False)):
                np_[k], nm_[k], nv_[k] = pk, mk, vk
                continue
            if scrub_nan:
                gk = _scrub(gk)
                pk = _scrub(pk)
            d = gk - (decay * batch * pk if k == "w" else 0.0)
            mk = B1 * mk + (1 - B1) * d
            vk = B2 * vk + (1 - B2) * d * d
            mhat = mk / bias_corr_m
            vhat = vk / bias_corr_v
            pk = pk + lr_l * mhat / (jnp.sqrt(vhat) + eps)
            np_[k], nm_[k], nv_[k] = pk, mk, vk
        new_params.append(np_)
        new_m.append(nm_)
        new_v.append(nv_)
    return new_params, {"m": new_m, "v": new_v, "t": t}
