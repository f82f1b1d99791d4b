"""Checkpoint save/restore (orbax) — parity with src/train.py:94-104,372-385.

Stores {params, opt_state_main, opt_state_aux, step, epoch, args, lr} so a
run can be resumed exactly (--checkpoint/--continue_training semantics).
Integer CDF tables are NOT stored: they are rebuilt from params via the
codec's update(), like the reference's update(force=True) on resume
(src/train.py:206-208).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(
    path: str,
    state,
    epoch: int = 0,
    args: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> None:
    import orbax.checkpoint as ocp

    p = Path(path).absolute()
    if p.exists():
        import shutil

        shutil.rmtree(p)
    ckpt = {
        "params": state.params,
        "opt_state_main": state.opt_state_main,
        "opt_state_aux": state.opt_state_aux,
        "step": state.step,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(p, ckpt)
    meta = {"epoch": epoch, "args": args or {}, "extra": extra or {}}
    (p / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(path: str, target=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    p = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            tree = ckptr.restore(
                p,
                args=ocp.args.PyTreeRestore(
                    item={
                        "params": target.params,
                        "opt_state_main": target.opt_state_main,
                        "opt_state_aux": target.opt_state_aux,
                        "step": target.step,
                    }
                ),
            )
        else:
            tree = ckptr.restore(p)
    meta_file = p / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    return {**tree, **meta}


def save_params_npz(params, path: str, full_precision: bool = False):
    """Single-file npz param artifact (the flagship training recipe's
    format — tools/train_flagship.py). full_precision=True keeps f32
    exactly (mid-train checkpoints must resume bit-identically); the
    default bf16 halves the final artifact."""
    import ml_dtypes

    # ONE bulk fetch + host-side casts: a per-leaf jnp cast would round-
    # trip every tensor through the accelerator (h2d + d2h each), which
    # queues 3x545 dispatches and has wedged the axon tunnel outright
    params = jax.device_get(params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for kp, v in flat:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        a = np.asarray(v)
        if a.dtype == np.float32 and not full_precision:
            # stored as a u16 view because np.savez cannot round-trip
            # the ml_dtypes bfloat16 dtype
            bf = a.astype(ml_dtypes.bfloat16)
            arrays[key + "::bf16"] = bf.view(np.uint16)
        else:
            arrays[key] = a
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    import os

    os.replace(tmp, path)


def load_params_npz(path: str, like, partial: bool = False):
    """Restore a tree saved by save_params_npz onto `like`'s structure.

    partial=True keeps `like`'s value for keys absent from the file —
    used to warm-start a scalable model's base branch from a trained
    WACNN artifact (the shared modules carry identical names); missing
    keys (the progressive branch) keep their fresh init."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    n_loaded = n_kept = 0
    for kp, v in flat:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        if key + "::bf16" in data:
            raw = data[key + "::bf16"].view(jnp.bfloat16)
            a = jnp.asarray(raw).astype(jnp.float32)
        elif key in data:
            a = jnp.asarray(data[key])
        elif partial:
            out.append(v)
            n_kept += 1
            continue
        else:
            raise KeyError(
                f"{path} is missing parameter '{key}' (pass partial=True "
                "to keep the initialization for absent keys)"
            )
        n_loaded += 1
        out.append(a.reshape(v.shape))
    if partial and n_kept:
        import sys

        print(
            f"load_params_npz: {n_loaded} tensors loaded, "
            f"{n_kept} kept from init (partial warm-start)",
            file=sys.stderr,
        )
    return jax.tree_util.tree_unflatten(treedef, out)
