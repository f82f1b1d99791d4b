"""Head-to-head training A/B vs the reference (VERDICT r3 next #3b).

Trains the SAME WACNN (N=192, M=320 — the reference class is only valid
at full width: h_a's output is hardcoded to 192 channels, cnn.py:65,
while EntropyBottleneck(N) uses N, so any N!=192 crashes its forward;
the "small config" lever here is tiny crops/batches/steps, identical on
both sides) in BOTH frameworks from the SAME initial
weights (torch init converted through utils/torch_convert.py) on the SAME
deterministic batch sequence with the same optimizer settings (Adam 1e-4
main / 1e-3 on EB quantiles, grad-clip 1.0 — src/train.py:55-89), one run
per lambda, then evaluates both on a shared eval set and reports the
BD-rate between the two RD curves.

The torch side runs the reference's own modules from /root/reference/src
(read-only) through the parity-test stubs. Differences that remain are
framework numerics (conv algebra order, f32 on CPU vs TPU) and the noise
stream — exactly what an RD-level A/B should absorb.

Run: PYTHONPATH=/root/.axon_site:.:tests:tools python tools/ab_train.py
Writes artifacts/ab_train.json (docs/AB_r4.md quotes it).
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
for p in ("tools", "tests", "."):
    sys.path.insert(0, str(REPO / p) if p != "." else str(REPO))


def bd_rate(r1, d1, r2, d2):
    """Bjontegaard delta-rate (%) of curve 2 vs curve 1 (negative = curve
    2 needs fewer bits at equal quality). Polynomial fit in log-rate over
    the overlapping distortion range; degree = min(3, npoints-1)."""
    lr1, lr2 = np.log(np.asarray(r1)), np.log(np.asarray(r2))
    d1, d2 = np.asarray(d1), np.asarray(d2)
    deg = int(min(3, len(lr1) - 1, len(lr2) - 1))
    p1 = np.polyfit(d1, lr1, deg)
    p2 = np.polyfit(d2, lr2, deg)
    lo = max(d1.min(), d2.min())
    hi = min(d1.max(), d2.max())
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 64)
    int1 = np.trapezoid(np.polyval(p1, xs), xs)
    int2 = np.trapezoid(np.polyval(p2, xs), xs)
    return float((math.exp((int2 - int1) / (hi - lo)) - 1) * 100)


def torch_rd_loss(out, target, lmbda):
    import torch

    n, _, h, w = target.shape
    num_pixels = n * h * w
    bpp = sum(
        torch.log(l).sum() / (-math.log(2) * num_pixels)
        for l in out["likelihoods"].values()
    )
    mse = torch.mean((out["x_hat"] - target) ** 2)
    return lmbda * 255**2 * mse + bpp, bpp, mse


def train_torch(ref_cls, lmbda, batches, steps, seed, n_width):
    import torch

    torch.manual_seed(seed)
    tm = ref_cls(N=n_width, M=320)
    init_sd = {k: v.clone() for k, v in tm.state_dict().items()}
    quant_params = [p for n, p in tm.named_parameters()
                    if n.endswith("quantiles")]
    main_params = [p for n, p in tm.named_parameters()
                   if not n.endswith("quantiles")]
    opt = torch.optim.Adam(main_params, lr=1e-4)
    aux_opt = torch.optim.Adam(quant_params, lr=1e-3)
    tm.train()
    t0 = time.time()
    for it, b in enumerate(batches):
        x = torch.from_numpy(b.transpose(0, 3, 1, 2).copy())
        out = tm(x)
        loss, bpp, mse = torch_rd_loss(out, x, lmbda)
        aux = tm.aux_loss()
        opt.zero_grad(); aux_opt.zero_grad()
        loss.backward()
        aux.backward()
        torch.nn.utils.clip_grad_norm_(main_params, 1.0)
        opt.step(); aux_opt.step()
        if (it + 1) % 100 == 0:
            print(f"  torch λ={lmbda} step {it+1}: loss {loss.item():.3f} "
                  f"bpp {bpp.item():.3f} ({time.time()-t0:.0f}s)", flush=True)
    tm.eval()
    return tm, init_sd


def eval_torch(tm, eval_imgs):
    import torch

    bpps, psnrs = [], []
    with torch.no_grad():
        for im in eval_imgs:
            x = torch.from_numpy(im.transpose(2, 0, 1)[None].copy())
            out = tm(x)
            num_pixels = x.shape[-2] * x.shape[-1]
            bpp = sum(
                torch.log(l).sum() / (-math.log(2) * num_pixels)
                for l in out["likelihoods"].values()
            )
            mse = torch.mean((out["x_hat"].clamp(0, 1) - x) ** 2)
            bpps.append(float(bpp))
            psnrs.append(-10 * math.log10(float(mse)))
    return float(np.mean(bpps)), float(np.mean(psnrs))


def train_jax(init_sd, lmbda, batches, steps, seed, n_width):
    import jax
    import jax.numpy as jnp

    from resdsic_tpu.models import WACNN
    from resdsic_tpu.training.loss import RateDistortionLoss
    from resdsic_tpu.training.state import create_train_state
    from resdsic_tpu.training.step import make_train_step
    from resdsic_tpu.utils.torch_convert import convert_wacnn_state_dict

    model = WACNN(N=n_width)
    params = {"params": convert_wacnn_state_dict(init_sd)}
    state = create_train_state(params)
    step = make_train_step(model, RateDistortionLoss(lmbda=lmbda))
    t0 = time.time()
    for it, b in enumerate(batches):
        state, metrics = step(
            state, jnp.asarray(b), jax.random.key(seed * 1000 + it),
            1e-4, 1e-3,
        )
        if (it + 1) % 100 == 0:
            print(f"  jax   λ={lmbda} step {it+1}: "
                  f"loss {float(metrics['loss']):.3f} "
                  f"bpp {float(metrics['bpp_loss']):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return model, state.params


def eval_jax(model, params, eval_imgs):
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda p, xx: model.apply(p, xx, training=False))
    x = jnp.asarray(eval_imgs)
    out = fwd(params, x)
    n, h, w, _ = x.shape
    bpps = []
    for i in range(n):
        bits = sum(
            float(-jnp.sum(jnp.log2(l[i])))
            for l in out["likelihoods"].values()
        )
        bpps.append(bits / (h * w))
    mse = jnp.mean(
        (jnp.clip(out["x_hat"], 0, 1) - x) ** 2, axis=(1, 2, 3)
    )
    psnrs = [-10 * math.log10(float(v)) for v in mse]
    return float(np.mean(bpps)), float(np.mean(psnrs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument(
        "--n-width", type=int, default=192,
        help="must be 192: the reference hyper nets hardcode 192-channel "
        "z (cnn.py:65) while EntropyBottleneck(N) uses N",
    )
    ap.add_argument("--lmbdas", type=float, nargs="+",
                    default=[0.0035, 0.013, 0.05])
    ap.add_argument("--eval-n", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from test_torch_parity import REF, _install_stubs
    from train_flagship import _load_assets, make_batch

    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from compress.models import WACNN as RefWACNN

    # deterministic shared data: one pool, one batch order, both sides
    rng = np.random.default_rng(args.seed)
    assets = _load_assets()
    pool = [make_batch(rng, assets, args.batch, args.crop)
            for _ in range(12)]
    order = np.random.default_rng(args.seed + 1).integers(
        len(pool), size=args.steps
    )
    batches = [pool[i] for i in order]
    rng_eval = np.random.default_rng(77_000)
    eval_imgs = make_batch(rng_eval, assets, args.eval_n, 256)

    curves = {"torch": {"bpp": [], "psnr": []},
              "jax": {"bpp": [], "psnr": []}}
    for lm in args.lmbdas:
        print(f"λ={lm}: torch side...", flush=True)
        tm, init_sd = train_torch(
            RefWACNN, lm, batches, args.steps, args.seed, args.n_width
        )
        b_t, p_t = eval_torch(tm, eval_imgs)
        print(f"λ={lm}: jax side...", flush=True)
        jm, jparams = train_jax(
            init_sd, lm, batches, args.steps, args.seed, args.n_width
        )
        b_j, p_j = eval_jax(jm, jparams, eval_imgs)
        curves["torch"]["bpp"].append(round(b_t, 5))
        curves["torch"]["psnr"].append(round(p_t, 3))
        curves["jax"]["bpp"].append(round(b_j, 5))
        curves["jax"]["psnr"].append(round(p_j, 3))
        print(f"λ={lm}: torch bpp {b_t:.4f} psnr {p_t:.2f} | "
              f"jax bpp {b_j:.4f} psnr {p_j:.2f}", flush=True)

    bd = bd_rate(
        curves["torch"]["bpp"], curves["torch"]["psnr"],
        curves["jax"]["bpp"], curves["jax"]["psnr"],
    )
    result = {
        "config": vars(args),
        "identical": ["init weights (converted torch init)",
                      "batch sequence", "optimizers (Adam 1e-4/1e-3)",
                      "grad clip 1.0", "loss formula", "eval set"],
        "differs": ["framework numerics (CPU torch f32 vs TPU XLA f32)",
                    "uniform-noise stream in training"],
        "curves": curves,
        "bd_rate_ours_vs_reference_pct": round(bd, 3),
    }
    print(json.dumps(result, indent=2))
    (REPO / "artifacts").mkdir(exist_ok=True)
    (REPO / "artifacts" / "ab_train.json").write_text(
        json.dumps(result, indent=2)
    )


if __name__ == "__main__":
    main()
