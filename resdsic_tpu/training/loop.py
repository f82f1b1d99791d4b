"""Epoch-level loops (parity: src/compress/training/step.py).

train_one_epoch / valid_epoch / test_epoch / compress_with_ac — the same
operational surface as the reference, re-based on jitted steps and the
real-bitstream codec drivers.
"""

from __future__ import annotations

import math
import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import compute_padding, pad_image, unpad_image
from ..utils.functions import AverageMeter, compute_msssim, compute_psnr
from ..utils.logging import MetricsLogger


def train_one_epoch(
    state,
    train_step,
    dataloader,
    rng: jax.Array,
    lr: float,
    aux_lr: float,
    epoch: int,
    counter: int,
    logger: Optional[MetricsLogger] = None,
    shard_fn: Callable = lambda b: b,
    log_every: int = 100,
):
    meters = {k: AverageMeter() for k in ("loss", "bpp_loss", "mse_loss", "aux_loss")}
    for i, batch in enumerate(dataloader):
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(
            state, shard_fn(jnp.asarray(batch)), step_rng, lr, aux_lr
        )
        if i % log_every == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            for k, m in meters.items():
                if k in metrics:
                    m.update(metrics[k])
            if logger:
                logger.log({"train_batch": counter, **{
                    f"train_batch/{k}": v for k, v in metrics.items()
                }})
            print(
                f"Train epoch {epoch}: [{i}/{len(dataloader)}] "
                f"loss {metrics['loss']:.4f} | bpp {metrics['bpp_loss']:.4f} "
                f"| mse {metrics['mse_loss']*255**2:.2f} "
                f"| aux {metrics['aux_loss']:.1f}"
            )
        counter += 1
    if logger:
        logger.log({"train": epoch, **{
            f"train/{k}": m.avg for k, m in meters.items()
        }})
    return state, rng, counter


def valid_epoch(
    params, eval_step, dataloader, epoch: int,
    logger: Optional[MetricsLogger] = None,
    shard_fn: Callable = lambda b: b,
) -> float:
    meters = {k: AverageMeter() for k in ("loss", "bpp_loss", "mse_loss", "psnr")}
    for batch in dataloader:
        m = eval_step(params, shard_fn(jnp.asarray(batch)))
        for k, meter in meters.items():
            if k in m:
                meter.update(float(jnp.mean(m[k])))
    if logger:
        logger.log({"valid": epoch, **{
            f"valid/{k}": meter.avg for k, meter in meters.items()
        }})
    return meters["loss"].avg


def test_epoch(
    model, params, dataset, epoch: int,
    pr_list: Sequence[float],
    criterion,
    logger: Optional[MetricsLogger] = None,
) -> tuple:
    """Per-quality entropy-estimated bpp/PSNR on a test set
    (ref step.py:158-215)."""
    is_scalable = hasattr(model, "lmbda_list")
    nq = len(pr_list)
    bpp = [AverageMeter() for _ in range(nq)]
    psnr_m = [AverageMeter() for _ in range(nq)]

    fns = {}
    for j, p in enumerate(pr_list):
        if is_scalable:
            fns[j] = jax.jit(
                lambda pr, x, p=p: model.apply(pr, x, quality=p, training=False)
            )
        else:
            fns[j] = jax.jit(lambda pr, x: model.apply(pr, x, training=False))

    for idx in range(len(dataset)):
        x = jnp.asarray(dataset[idx])[None]
        for j, p in enumerate(pr_list):
            out = fns[j](params, x)
            crit = criterion(out, x)
            x_hat = out["x_hat"][0] if is_scalable else out["x_hat"]
            psnr_m[j].update(compute_psnr(np.asarray(x), np.clip(np.asarray(x_hat), 0, 1)))
            if is_scalable:
                q = model.normalize_quality(p)
                key = "bpp_base" if q == 0 else "bpp_scalable"
                b = float(crit[key])
                if q != 0:
                    b += float(crit["bpp_base"])
            else:
                b = float(crit["bpp_loss"])
            bpp[j].update(b)

    if logger:
        for j in range(nq):
            name = (
                "test_base" if j == 0
                else "test_complete" if j == nq - 1
                else f"test_quality_{j}"
            )
            logger.log({name: epoch, f"{name}/bpp": bpp[j].avg,
                        f"{name}/psnr": psnr_m[j].avg})
    return [m.avg for m in bpp], [m.avg for m in psnr_m]


def compress_with_ac(
    codec, filelist: Sequence[str], epoch: int,
    pr_list: Sequence[float],
    logger: Optional[MetricsLogger] = None,
    writing: Optional[str] = None,
) -> tuple:
    """REAL-codec evaluation over image files (ref step.py:218-330):
    pad to x64, compress/decompress at each quality, bpp from byte lengths."""
    from ..utils.functions import read_image

    is_scalable = hasattr(codec, "_normalize_quality")
    nq = len(pr_list)
    bpp_m = [AverageMeter() for _ in range(nq)]
    psnr_m = [AverageMeter() for _ in range(nq)]
    msssim_m = [AverageMeter() for _ in range(nq)]

    for path in filelist:
        x = read_image(path)
        h, w = x.shape[1:3]
        pad, unpad = compute_padding(h, w, min_div=64)
        x_padded = jnp.asarray(np.pad(
            x, ((0, 0), (pad[2], pad[3]), (pad[0], pad[1]), (0, 0))
        ))
        num_pixels = x.shape[0] * h * w

        for j, p in enumerate(pr_list):
            if is_scalable:
                data = codec.compress(x_padded, quality=p)
                rec = codec.decompress(data["strings"], data["shape"], quality=p)
                q = codec._normalize_quality(p)
            else:
                data = codec.compress(x_padded)
                rec = codec.decompress(data["strings"], data["shape"])
                q = 0

            x_hat = unpad_image(np.asarray(rec["x_hat"]), unpad)
            x_hat = np.clip(x_hat, 0, 1)

            psnr_v = compute_psnr(x, x_hat)
            ms_v = compute_msssim(jnp.asarray(x), jnp.asarray(x_hat))
            ms_db = -10 * math.log10(1 - ms_v) if ms_v < 1 else 99.0

            # bpp accounting from byte lengths (ref step.py:271-291)
            strings = data["strings"]
            nbytes = sum(len(s) for s in strings[0]) + sum(
                len(s) for s in strings[1]
            )
            if is_scalable and q != 0:
                nbytes += sum(len(s) for s in strings[2])
                nbytes += sum(len(s) for sl in strings[3] for s in sl)
            bpp = nbytes * 8.0 / num_pixels

            bpp_m[j].update(bpp)
            psnr_m[j].update(psnr_v)
            msssim_m[j].update(ms_db)

            if writing:
                name = path.split("/")[-1].split(".")[0]
                with open(f"{writing}/level_{j}_{epoch}.txt", "a") as f:
                    f.write(
                        f"SEQUENCE {name} BITS {bpp} PSNR {psnr_v} "
                        f"MSSIM {ms_db}\n"
                    )

    if logger and epoch > -1:
        for j in range(nq):
            name = (
                "compress_base" if j == 0
                else "compress_complete" if j == nq - 1
                else f"compress_quality_{j}"
            )
            logger.log({name: epoch, f"{name}/bpp": bpp_m[j].avg,
                        f"{name}/psnr": psnr_m[j].avg})
    return [m.avg for m in bpp_m], [m.avg for m in psnr_m]
