"""How much PSNR can a perfect progressive layer add through the
warm-started decoder?

The scalable 'ind' flagship merges base+prog latents additively before a
shared g_s (shared.py _merge). The upper bound on what the progressive
layer can buy WITHOUT retraining g_s is PSNR(g_s(y)) with the
UNQUANTIZED latent — the prog branch can at best reconstruct y exactly.
If that bound is <1 dB above the quantized point, a frozen-decoder
warm-start can never hit VERDICT r4 #2's >=1 dB separation target and
the recipe must unfreeze g_s.

Run: PYTHONPATH=/root/.axon_site:.:tools python tools/exp_prog_headroom.py
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from eval_trained import eval_images, per_image_psnr  # noqa: E402

from resdsic_tpu.models import WACNN  # noqa: E402
from resdsic_tpu.utils.checkpoint import load_params_npz  # noqa: E402


def main():
    npz = sys.argv[1] if len(sys.argv) > 1 else (
        "artifacts_committed/cnn_q65_bf16.npz"
    )
    model = WACNN()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(npz, params)
    x = jnp.asarray(eval_images(8))

    fwd = jax.jit(lambda p, xx: model.apply(p, xx, training=False))
    out = fwd(params, x)
    psnr_q = per_image_psnr(out["x_hat"], x)

    def unq(p, xx):
        y, _ = model.apply(p, xx, method=WACNN.analyze)
        return model.apply(p, y, method=WACNN.synthesize)

    x_hat_u = jax.jit(unq)(params, x)
    psnr_u = per_image_psnr(x_hat_u, x)

    print(f"quantized   g_s(y_hat): {np.mean(psnr_q):.3f} dB")
    print(f"unquantized g_s(y)    : {np.mean(psnr_u):.3f} dB")
    print(f"headroom (frozen g_s) : {np.mean(psnr_u) - np.mean(psnr_q):.3f} dB")


if __name__ == "__main__":
    main()
