"""Full training-state checkpointing.

The reference checkpoints ONLY weights + `seen` (`.weights` stream) —
momentum/Adam slots are lost on restart (SURVEY.md §5 flags this gap).  We
keep the byte-compatible `.weights` for interop (weights/io.py) and add a
native `.ckpt.npz` carrying the complete state: params, optimizer slots,
seen, and the RNG key — so resume is exact.

Two native formats:

- `.ckpt.npz` (save_checkpoint/load_checkpoint): single-file, host-
  gathered.  Right for single-process training — simple, greppable,
  no directory trees.
- sharded directory (save_checkpoint_sharded/load_checkpoint_sharded,
  orbax-backed): each process writes only the array shards it owns and
  restore places shards directly onto the target mesh — required when
  the training state is GSPMD-sharded across processes
  (parallel/tensor.py filter sharding, parallel/multihost.py DP), where
  a host gather would either OOM one host or simply fail on
  non-addressable arrays.
"""

from __future__ import annotations

import numpy as np



def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", out)
    elif tree is None:
        out[f"{prefix}/__none__"] = np.zeros(0, np.float32)
    else:
        out[prefix] = np.asarray(tree)


def save_checkpoint(path, params, opt_state, seen: int, rng_key=None,
                    extra: dict | None = None) -> None:
    out: dict = {}
    _flatten(params, "params", out)
    _flatten(opt_state, "opt", out)
    out["meta/seen"] = np.asarray(seen, np.int64)
    if rng_key is not None:
        out["meta/rng"] = np.asarray(rng_key)
    for k, v in (extra or {}).items():
        out[f"extra/{k}"] = np.asarray(v)
    np.savez_compressed(path, **out)


def load_checkpoint(path, params_template, opt_template):
    """Restore (params, opt_state, seen, rng_key) shaped like the
    templates (lists of dicts / optimizer-state dicts)."""
    data = np.load(path, allow_pickle=False)

    def rebuild(template, prefix):
        if isinstance(template, dict):
            return {k: rebuild(v, f"{prefix}/{k}")
                    for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            return [rebuild(v, f"{prefix}/{i}")
                    for i, v in enumerate(template)]
        if template is None:
            return None
        if prefix not in data:
            # older checkpoint lacking a newer optimizer slot (e.g. the
            # sgd step counter / adam pending-updates buffer): keep the
            # template's zero-init value
            return np.asarray(template)
        return data[prefix]

    params = rebuild(params_template, "params")
    opt_state = rebuild(opt_template, "opt")
    seen = int(data["meta/seen"])
    rng_key = data["meta/rng"] if "meta/rng" in data else None
    return params, opt_state, seen, rng_key


# ---------------------------------------------------------------------------
# Sharded (multi-host) checkpointing — orbax-backed.
# ---------------------------------------------------------------------------

def _abstract_like(leaf):
    """Restore template leaf: sharded jax.Arrays restore onto their own
    sharding; everything else restores as host numpy."""
    import jax

    if isinstance(leaf, jax.Array):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=leaf.sharding)
    return leaf


def save_checkpoint_sharded(path, params, opt_state, seen: int,
                            rng_key=None, extra: dict | None = None) -> None:
    """Write the full training state as a sharded checkpoint DIRECTORY.

    Unlike save_checkpoint (single .npz, host-gathered), every process
    persists only its locally-addressable shards, so this works when
    params/opt live distributed over a multi-host mesh.  `path` must be
    a directory path (created; existing contents replaced).
    """
    import os
    import shutil

    import jax
    import orbax.checkpoint as ocp

    tree = {"params": params, "opt": opt_state,
            "meta": {"seen": np.asarray(seen, np.int64)}}
    if rng_key is not None:
        tree["meta"]["rng"] = rng_key
    if extra:
        tree["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    path = str(path)
    # rolling overwrite: only process 0 clears the directory, then all
    # processes rendezvous before any shard is written
    if jax.process_index() == 0:
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("darknet_tpu:ckpt_dir_ready")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), tree)
    ckptr.wait_until_finished()


def load_checkpoint_sharded(path, params_template, opt_template):
    """Restore (params, opt_state, seen, rng_key) from a sharded
    checkpoint directory.  Template leaves that are sharded jax.Arrays
    (or ShapeDtypeStructs with shardings) come back placed on the same
    mesh/sharding; numpy template leaves come back as host numpy."""
    import os

    import jax
    import orbax.checkpoint as ocp

    abstract = {
        "params": jax.tree.map(_abstract_like, params_template),
        "opt": jax.tree.map(_abstract_like, opt_template),
        "meta": {"seen": np.asarray(0, np.int64)},
    }
    ckptr = ocp.StandardCheckpointer()
    state_dir = os.path.join(str(path), "state")
    # probe the saved tree for the optional keys before shaping the template
    meta = ckptr.metadata(state_dir)
    saved = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    tree_meta = getattr(saved, "tree", None) or {}
    if "rng" in tree_meta.get("meta", {}):
        abstract["meta"]["rng"] = np.zeros(
            tree_meta["meta"]["rng"].shape, tree_meta["meta"]["rng"].dtype)
    if "extra" in tree_meta:
        abstract["extra"] = {
            k: np.zeros(v.shape, v.dtype)
            for k, v in tree_meta["extra"].items()}
    restored = ckptr.restore(state_dir, abstract)
    return (restored["params"], restored["opt"],
            int(restored["meta"]["seen"]),
            restored["meta"].get("rng"))
