"""Reset a collapsed progressive branch to fresh init (VERDICT r5 #2).

Diagnosis (round 5, step-10400 partial of the joint two-λ run): the
progressive rate collapsed to bpp_prog ~ 0.002 with ZERO quality
separation — the rate term killed the prog pathway before the shared
decoder learned to use it, and a dead branch gets no reviving gradient.
This tool performs the surgery for the phased recipe: keep the trained
BASE branch + g_s from a checkpoint, re-initialize every progressive
module fresh, and write the result as a warm-start artifact for the
--freeze-base phase-A run.

Pure CPU. Run:
  python tools/prog_surgery.py <trained.npz> <out.npz>
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from resdsic_tpu.models import ResWACNNIndependentEntropy
    from resdsic_tpu.utils.checkpoint import load_params_npz, save_params_npz

    model = ResWACNNIndependentEntropy(
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels"
    )
    fresh = jax.jit(model.init)(
        {"params": jax.random.key(42), "noise": jax.random.key(43)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    loaded = load_params_npz(src, fresh)

    out = {"params": {}}
    kept, reset = [], []
    for top, sub in loaded["params"].items():
        if "prog" in top:  # *_prog + g_a_progressive
            out["params"][top] = fresh["params"][top]
            reset.append(top)
        else:
            out["params"][top] = sub
            kept.append(top)
    import re

    fmt = lambda names: sorted({re.sub(r"_\d+(_\d+)?$", "", n) for n in names})
    print(f"kept   : {fmt(kept)}")
    print(f"reset  : {fmt(reset)}")
    save_params_npz(out, dst)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
