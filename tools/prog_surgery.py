"""Reset a collapsed progressive branch to fresh init (VERDICT r5 #2).

Diagnosis (round 5): joint two-λ training from a warm-started base
collapses the progressive rate to ~0.002 bpp with zero separation, and a
phase-A freeze-base run with a SHARED decoder still showed no coupling
after 1.6k steps — y_hat_prog's contribution measured 130x smaller than
the base latent (std 0.008 vs 1.04), so the shared g_s, anchored by
level 0, has no incentive to leave its basin. The working recipe:

  1. this surgery: keep the trained BASE branch; re-init every
     progressive module fresh, SCALE the prog encoder's final conv so the
     quantizer actually activates (|y_prog - mu| crosses 0.5), and
     (--multiple-decoder) clone the trained g_s into BOTH entries of
     g_s_multi — the reference's own dual-decoder 'ind' configuration
     (ref parser --multiple_decoder, independent.py:130-143);
  2. train_flagship --freeze-base --multiple-decoder: only the prog
     modules + g_s_multi_1 train, so level 0 stays pinned at the base
     operating point and ALL gradient serves the enhancement level.

Pure CPU. Run:
  python tools/prog_surgery.py <trained.npz> <out.npz> \
      [--multiple-decoder] [--prog-scale 6.0]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--multiple-decoder", action="store_true")
    ap.add_argument("--prog-scale", type=float, default=6.0,
                    help="multiply the fresh prog encoder's last conv so "
                    "y_prog reaches quantizer-active amplitude")
    args = ap.parse_args()

    from resdsic_tpu.models import ResWACNNIndependentEntropy
    from resdsic_tpu.utils.checkpoint import load_params_npz, save_params_npz

    model = ResWACNNIndependentEntropy(
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
        multiple_decoder=args.multiple_decoder,
    )
    fresh = jax.jit(model.init)(
        {"params": jax.random.key(42), "noise": jax.random.key(43)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    # single-decoder donor model to host the source checkpoint
    donor_model = ResWACNNIndependentEntropy(
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    donor = jax.jit(donor_model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    donor = load_params_npz(args.src, donor)["params"]

    out = {"params": {}}
    kept, reset, cloned = [], [], []
    for top in fresh["params"]:
        if "prog" in top:
            sub = fresh["params"][top]
            if top.startswith("g_a_progressive"):
                # scale the LAST conv's kernel+bias (quantizer activation)
                idxs = [
                    int(t.rsplit("_", 1)[1]) for t in fresh["params"]
                    if t.startswith("g_a_progressive_")
                ]
                if int(top.rsplit("_", 1)[1]) == max(idxs):
                    sub = jax.tree_util.tree_map(
                        lambda a: a * args.prog_scale, sub
                    )
            out["params"][top] = sub
            reset.append(top)
        elif top.startswith("g_s_multi_"):
            layer = top.split("g_s_multi_")[1]  # "<dec>_<layer>"
            src_name = "g_s_" + layer.split("_", 1)[1]
            out["params"][top] = donor[src_name]
            cloned.append(top)
        elif top.startswith("g_s"):
            out["params"][top] = donor[top]
            kept.append(top)
        else:
            out["params"][top] = donor[top]
            kept.append(top)

    fmt = lambda names: sorted({re.sub(r"_\d+(_\d+)?$", "", n) for n in names})
    print(f"kept   : {fmt(kept)}")
    print(f"reset  : {fmt(reset)} (last g_a_progressive conv x{args.prog_scale})")
    if cloned:
        print(f"cloned : g_s -> {fmt(cloned)}")
    save_params_npz(out, args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
