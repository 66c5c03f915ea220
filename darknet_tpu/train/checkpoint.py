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
    import os

    out: dict = {}
    _flatten(params, "params", out)
    _flatten(opt_state, "opt", out)
    out["meta/seen"] = np.asarray(seen, np.int64)
    if rng_key is not None:
        out["meta/rng"] = np.asarray(rng_key)
    for k, v in (extra or {}).items():
        out[f"extra/{k}"] = np.asarray(v)
    # atomic rolling overwrite: a kill mid-write must not destroy the
    # previous good checkpoint (this file IS the crash-recovery state)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **out)
    os.replace(tmp, str(path))


def load_checkpoint(path, params_template, opt_template):
    """Restore (params, opt_state, seen, rng_key, extra) shaped like the
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
    extra = {k[len("extra/"):]: data[k] for k in data.files
             if k.startswith("extra/")}
    return params, opt_state, seen, rng_key, extra


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
    path = os.path.abspath(str(path))      # orbax requires absolute paths
    # atomic rolling overwrite: write into a sibling tmp dir, then swap —
    # a crash mid-save must leave the previous good checkpoint intact.
    # Only process 0 touches directories; everyone rendezvouses around it.
    tmp = path + ".tmp"
    if jax.process_index() == 0:
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("darknet_tpu:ckpt_dir_ready")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(tmp, "state"), tree)
    ckptr.wait_until_finished()
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("darknet_tpu:ckpt_save_done")
    if jax.process_index() == 0:
        old = path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("darknet_tpu:ckpt_swapped")


def resolve_sharded_dir(path):
    """Find a loadable sharded checkpoint for `path`, surviving the
    directory-swap crash window in save_checkpoint_sharded: a kill
    between `rename(path, old)` and `rename(tmp, path)` leaves the new
    complete checkpoint at `path.tmp` and the previous one at
    `path.old`.  Preference order: path (normal), path.tmp (swap was in
    progress, so the tmp save had already finished — it is the NEWER
    state), path.old.  A directory only counts if its orbax `state`
    subdir exists — orbax finalizes that name atomically, so a crash
    mid-save never leaves a half-written candidate.  Returns None if no
    complete checkpoint exists."""
    import os

    p = os.path.abspath(str(path))
    for cand in (p, p + ".tmp", p + ".old"):
        if os.path.isdir(os.path.join(cand, "state")):
            return cand
    return None


def load_checkpoint_sharded(path, params_template, opt_template):
    """Restore (params, opt_state, seen, rng_key, extra) from a sharded
    checkpoint directory.  Template leaves that are sharded jax.Arrays
    (or ShapeDtypeStructs with shardings) come back placed on the same
    mesh/sharding; numpy template leaves come back as host numpy.
    Falls back to the `.tmp`/`.old` swap siblings if `path` itself is
    missing (see resolve_sharded_dir)."""
    import os

    import jax
    import orbax.checkpoint as ocp

    primary = os.path.abspath(str(path))
    resolved = resolve_sharded_dir(path)
    if resolved is not None and resolved != primary:
        # PROMOTE the recovered sibling to the primary name: the next
        # save unconditionally rmtree's `path.tmp` before its (slow)
        # orbax write, so a checkpoint left at `.tmp` by a crash would
        # be destroyed before its replacement exists — a second crash
        # would then silently roll training back past the state this
        # very load resumed from.
        if jax.process_index() == 0:
            os.rename(resolved, primary)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("darknet_tpu:ckpt_promote")
        path = primary
    elif resolved is not None:
        path = resolved

    abstract = {
        "params": jax.tree.map(_abstract_like, params_template),
        "opt": jax.tree.map(_abstract_like, opt_template),
        "meta": {"seen": np.asarray(0, np.int64)},
    }
    ckptr = ocp.StandardCheckpointer()
    state_dir = os.path.join(os.path.abspath(str(path)), "state")
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
            restored["meta"].get("rng"),
            restored.get("extra", {}))
