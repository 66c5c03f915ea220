"""Darknet-semantics optimizers as pure JAX update functions.

SGD+momentum (UpdateConvolutionalLayerGpu, convolutional_kernels.cu:900-918):

    u  += -decay * batch * w          # weight decay only on conv weights
    w  += (lr/batch) * u
    u  *= momentum

where `u` is the persistent "updates" buffer holding the gradient-ASCENT
accumulation (darknet deltas are target-minus-pred).  We keep the darknet
convention internally: `grads` passed here are ascent directions.

Adam (adam_update_gpu, blas_kernels.cu:120-134):

    d   = updates - decay * batch * w   # decay on EVERY array (bias too)
    m   = B1*m + (1-B1)*d ;  v = B2*v + (1-B2)*d^2
    w  += rate * m_hat / (sqrt(v_hat) + eps)    # rate NOT divided by batch
    updates = 0                                  # consumed

Update gates (UpdateNetworkGpu, network_kernels.cu:226-240) — the GPU
interpreter (production path) skips a layer's apply when:

  * ``l.burnin_update`` and ``burnin_update * net.burn_in > iter``
  * ``l.train_only_bn``  (always; weights frozen, BN rolling stats still
    update in the forward pass)
  * ``not (l.dont_update < iter)``  — an ITERATION THRESHOLD, not a bool
    (parser.cpp:1363)

While an update is gated off, the backward pass keeps ACCUMULATING into the
updates buffer (backward is never gated), so when the gate opens the whole
backlog applies at once — reproduced here by accumulating `u` every step
and gating only the apply.  `iter` is carried on-device as `state["t"]`,
incremented once per optimizer call; the reference increments `curr_iter`
BEFORE UpdateNetworkGpu (network.cpp:225-231), so the first step compares
against iter == 1.

NaN hygiene at apply time (convolutional_kernels.cu:881-882):
`reset_nan_and_inf` on the accumulated weight updates + `fix_nan_and_inf`
on the weights — conv WEIGHTS only, not biases/scales.

State layout mirrors the params PyTree: per layer, per array, a velocity
(or m/v pair) of the same shape, plus the scalar step counter.  These
buffers are exactly what the reference does NOT checkpoint (SURVEY.md §5)
— our checkpoints do include them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _zeros_like_params(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def _has_temporary_gate(l) -> bool:
    """Layers whose update gate OPENS later (burnin_update / dont_update
    thresholds) need a pending-updates buffer so the gated-off backlog can
    apply when the gate opens; train_only_bn never opens, and ungated
    layers consume gradients immediately — neither needs the buffer."""
    return bool(int(getattr(l, "burnin_update", 0) or 0)
                or int(getattr(l, "dont_update", 0) or 0))


def init_sgd_state(params, *, iter0: int = 0):
    """`iter0` seeds the on-device iteration counter used by the update
    gates; pass curr_iter (= seen / optimizer_batch) when resuming from
    weights so gate thresholds compare against the TRUE iteration like
    the reference's GetCurrIter (network.cpp:225-231)."""
    return {"u": _zeros_like_params(params),
            "t": jnp.asarray(iter0, jnp.int32)}


def init_adam_state(params, *, iter0: int = 0, graph=None):
    """Adam slots.  The pending-updates buffer `u` is allocated only for
    layers with a temporary update gate (when `graph` is given) — for
    everything else gradients are consumed the same step, so a
    params-sized zero buffer would cost HBM + zero-fill traffic for
    nothing."""
    if graph is not None:
        u = [_zeros_like_params([p])[0] if _has_temporary_gate(l) else {}
             for l, p in zip(graph.layers, params)]
    else:
        u = _zeros_like_params(params)
    return {
        "m": _zeros_like_params(params),
        "v": _zeros_like_params(params),
        "u": u,                            # pending (unapplied) updates
        "t": jnp.asarray(iter0, jnp.int32),
    }


def _scrub(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def _conv_clip(l):
    """clip= applies to conv weights only — the reference constrains them
    post-update in UpdateConvolutionalLayerGpu (convolutional_kernels.cu:
    919-921); other layer updates ignore l->clip."""
    return l.kind == "convolutional" and getattr(l, "clip", 0.0)


def _layer_gate(l, t, net):
    """Per-layer update gate for iteration `t` (traced int scalar).

    Returns None (always update), False (never — train_only_bn), or a
    traced bool.  Mirrors UpdateNetworkGpu, network_kernels.cu:226-240.
    """
    if getattr(l, "train_only_bn", False):
        return False
    conds = []
    bu = int(getattr(l, "burnin_update", 0) or 0)
    if bu:
        # skip while burnin_update * burn_in > iter
        conds.append(jnp.int32(bu * net.burn_in) <= t)
    du = int(getattr(l, "dont_update", 0) or 0)
    if du:
        # update only once dont_update < iter
        conds.append(jnp.int32(du) < t)
    if not conds:
        return None
    g = conds[0]
    for c in conds[1:]:
        g = g & c
    return g


def sgd_update(graph, params, grads, state, *, lr, momentum, decay, batch,
               scrub_nan: bool = True):
    """One darknet SGD+momentum step over the whole params list.

    `grads` are ascent directions (darknet deltas summed into updates).
    decay applies only to "w" arrays of conv/connected/local layers
    (biases/scales have no decay, convolutional_kernels.cu:902-918).
    """
    t = state["t"] + 1
    net = graph.net
    new_params = []
    new_u = []
    for l, p, g, u in zip(graph.layers, params, grads, state["u"]):
        gate = _layer_gate(l, t, net)
        lr_l = lr * getattr(l, "learning_rate_scale", 1.0)
        np_, nu_ = {}, {}
        for k in p:
            pk, gk, uk = p[k], g.get(k), u.get(k)
            if uk is None:
                uk = jnp.zeros_like(pk)
            if gk is None or gate is False:
                np_[k], nu_[k] = pk, uk
                continue
            # backward accumulation — never gated
            uk = uk + gk
            # apply (update_gpu) — gated
            uk_a, pk_a = uk, pk
            if k == "w" and scrub_nan:
                uk_a = _scrub(uk_a)
                pk_a = _scrub(pk_a)
            if k == "w":
                uk_a = uk_a - decay * batch * pk_a
            pk_new = pk_a + (lr_l / batch) * uk_a
            uk_new = uk_a * momentum
            if k == "w" and _conv_clip(l):
                # constrain_ongpu post-update (convolutional_kernels.cu:919-921)
                pk_new = jnp.clip(pk_new, -l.clip, l.clip)
            if gate is None:
                np_[k], nu_[k] = pk_new, uk_new
            else:
                np_[k] = jnp.where(gate, pk_new, pk)
                nu_[k] = jnp.where(gate, uk_new, uk)
        new_params.append(np_)
        new_u.append(nu_)
    return new_params, {"u": new_u, "t": t}


def adam_update(graph, params, grads, state, *, lr, B1, B2, eps, decay, batch,
                scrub_nan: bool = True):
    t = state["t"] + 1
    net = graph.net
    new_params, new_m, new_v, new_u = [], [], [], []
    bias_corr_m = 1.0 - jnp.power(B1, t.astype(jnp.float32))
    bias_corr_v = 1.0 - jnp.power(B2, t.astype(jnp.float32))
    u_state = state.get("u") or [{} for _ in params]
    for l, p, g, m, v, u in zip(graph.layers, params, grads, state["m"],
                                state["v"], u_state):
        gate = _layer_gate(l, t, net)
        lr_l = lr * getattr(l, "learning_rate_scale", 1.0)
        np_, nm_, nv_, nu_ = {}, {}, {}, {}
        for k in p:
            pk, gk = p[k], g.get(k)
            mk = m.get(k, jnp.zeros_like(pk))
            vk = v.get(k, jnp.zeros_like(pk))
            uk = u.get(k)        # None for layers without a temporary gate
            if gk is None or gate is False:
                np_[k], nm_[k], nv_[k] = pk, mk, vk
                if uk is not None:
                    nu_[k] = uk
                continue
            # pending + fresh gradient = the weight_updates buffer content
            acc = gk if uk is None else uk + gk
            d, pk_a = acc, pk
            if k == "w" and scrub_nan:
                d = _scrub(d)
                pk_a = _scrub(pk_a)
            # adam_update_gpu applies decay to every array it's called on
            # (weights, biases AND scales — convolutional_kernels.cu:885-897)
            d = d - decay * batch * pk_a
            mk_new = B1 * mk + (1 - B1) * d
            vk_new = B2 * vk + (1 - B2) * d * d
            mhat = mk_new / bias_corr_m
            vhat = vk_new / bias_corr_v
            pk_new = pk_a + lr_l * mhat / (jnp.sqrt(vhat) + eps)
            if k == "w" and _conv_clip(l):
                # constrain_ongpu post-update (convolutional_kernels.cu:919-921)
                pk_new = jnp.clip(pk_new, -l.clip, l.clip)
            if gate is None:
                np_[k], nm_[k], nv_[k] = pk_new, mk_new, vk_new
                if uk is not None:
                    nu_[k] = jnp.zeros_like(uk)  # consumed (fill_ongpu 0)
            else:
                np_[k] = jnp.where(gate, pk_new, pk)
                nm_[k] = jnp.where(gate, mk_new, mk)
                nv_[k] = jnp.where(gate, vk_new, vk)
                # a gated layer always has the pending buffer: zero when
                # applied, keep accumulating while the gate is closed
                nu_[k] = jnp.where(gate, jnp.zeros_like(acc), acc)
        new_params.append(np_)
        new_m.append(nm_)
        new_v.append(nv_)
        new_u.append(nu_)
    return new_params, {"m": new_m, "v": new_v, "u": new_u, "t": t}
