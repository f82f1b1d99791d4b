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
