"""Periodic weight-averaging data parallelism — reference-compatibility mode.

The reference's multi-GPU training (`network_kernels.cu:295-484`) runs one
independent replica per device and every `sync_interval` (=4,
detector.cpp:196) iterations averages the WEIGHTS across replicas through
host memory; gradients are never exchanged and LR is pre-multiplied by the
replica count (detector.cpp:67).

The default darknet_tpu DP is per-step gradient psum (parallel/dp.py) —
strictly stronger.  This module reproduces the reference semantics for A/B
comparisons: replicas live in a stacked leading axis, step independently
under `vmap` (each with its own momentum state), and `sync()` averages the
parameters (momenta stay per-replica, exactly like SyncNetworks which only
touches weights/biases/scales).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from darknet_tpu.train.step import make_train_step


def replicate_params(params, n_replicas: int):
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (n_replicas,) +
                                   jnp.asarray(a).shape), params)


def make_weight_avg_train_step(graph, n_replicas: int, *,
                               compute_dtype=None):
    """Returns (step, sync):

    step(params_r, opt_r, x_r, truths_r, rng, lr) — x_r/truths_r carry a
    leading replica axis (each replica gets its own shard, the
    GetPartialData split); every replica steps independently.
    sync(params_r) — SyncNetworks: average weights across replicas and
    redistribute.
    """
    inner = make_train_step(graph, compute_dtype=compute_dtype, jit=False)

    def step(params_r, opt_r, x_r, truths_r, rng, lr):
        def one(params, opt, x, truths):
            return inner(params, opt, x, truths, rng, lr)

        return jax.vmap(one)(params_r, opt_r, x_r, truths_r)

    def sync(params_r):
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.mean(a, axis=0, keepdims=True),
                                       a.shape), params_r)

    return jax.jit(step), jax.jit(sync)
