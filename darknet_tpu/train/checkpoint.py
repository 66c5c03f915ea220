"""Full training-state checkpointing.

The reference checkpoints ONLY weights + `seen` (`.weights` stream) —
momentum/Adam slots are lost on restart (SURVEY.md §5 flags this gap).  We
keep the byte-compatible `.weights` for interop (weights/io.py) and add a
native `.ckpt.npz` carrying the complete state: params, optimizer slots,
seen, and the RNG key — so resume is exact.
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
