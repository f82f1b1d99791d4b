"""Convert a mid-train partial checkpoint into a final params artifact.

The chunked trainer (tools/train_flagship.py) checkpoints the FULL train
state (params + optimizer moments, f32) as `<stem>.partial.npz` with keys
flattened from the TrainState ("params/params/...", "opt_state_main/...",
"__step__"). The final artifact keeps only the params subtree in the
save_params_npz format ("<collection>/<module>/...::bf16" u16 views of
bf16) — what bench.py / tools/eval_trained.py load.

Pure numpy: no accelerator touched, so it works while the TPU is busy
and cannot wedge the tunnel.

Run: python tools/partial_to_artifact.py artifacts_ind/ind_trained_bf16.partial.npz
Writes the sibling `<stem>.npz`.
"""

from __future__ import annotations

import sys
from pathlib import Path

import ml_dtypes
import numpy as np

# TrainState attribute holding the flax variables: the trainer's inline
# flattener renders dataclass attributes as ".params" (GetAttrKey str),
# so partial keys look like ".params/params/g_a_0/conv/kernel"; stripping
# the attribute segment leaves the save_params_npz key space ("params/...")
PREFIX = ".params/"


def convert(partial_path: str, out_path: str | None = None) -> str:
    src = Path(partial_path)
    if out_path is None:
        name = src.name.replace(".partial.npz", ".npz")
        if name == src.name:
            raise ValueError("expected a *.partial.npz input")
        out_path = str(src.with_name(name))
    data = np.load(src, allow_pickle=False)
    step = int(data["__step__"]) if "__step__" in data else -1
    arrays = {}
    for key in data.files:
        if not key.startswith(PREFIX):
            continue
        a = data[key]
        key = key[len(PREFIX):]
        if a.dtype == np.float32:
            arrays[key + "::bf16"] = a.astype(ml_dtypes.bfloat16).view(
                np.uint16
            )
        else:
            arrays[key] = a
    if not arrays:
        raise ValueError(f"no '{PREFIX}*' keys in {src}")
    tmp = out_path + ".tmp.npz"
    np.savez(tmp, **arrays)
    import os

    os.replace(tmp, out_path)
    print(f"{out_path}: {len(arrays)} tensors (from step {step})")
    return out_path


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
