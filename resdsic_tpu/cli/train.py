"""Training driver (parity: src/train.py:112-403).

python -m resdsic_tpu.cli.train -m ind --lambda_list 0.0035 0.065 ...

Differences from the reference (all deliberate):
  * device parallelism is a jax mesh (all local devices) instead of
    nn.DataParallel; batch must divide the device count or runs replicated
  * wandb optional — metrics also go to JSONL (--metrics_file)
  * checkpoints are orbax trees (utils/checkpoint.py), resumable with
    --checkpoint/--continue_training exactly like the reference
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, ImageFolder, SyntheticImageDataset, TestKodakDataset
from ..models import ScalableCodec, WACNNCodec, configure_model
from ..parallel import (
    local_batch_slice,
    make_mesh,
    make_multihost_mesh,
    shard_batch,
)
from ..training import (
    RateDistortionLoss,
    ReduceLROnPlateau,
    ScalableRateDistortionLoss,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from ..training.loop import compress_with_ac, test_epoch, train_one_epoch, valid_epoch
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.functions import sec_to_hours, set_seed
from ..utils.logging import MetricsLogger
from .parser import parse_args


def checkpoint_name(args) -> str:
    """Run naming (ref train.py:344-367)."""
    lam = "_".join(str(l) for l in args.lambda_list)
    pret = "pret" if args.checkpoint else "zero"
    return (
        f"{pret}__multi_{lam}_{args.model}_{args.mask_policy}_"
        f"{args.independent_lrp}_{args.joiner_policy}"
    )


def _maybe_init_distributed() -> None:
    """Join a multi-host TPU slice (GKE indexed Job / Cloud TPU pod VM).

    jax.distributed.initialize() auto-discovers the coordinator and process
    ids from the TPU runtime env; only invoked when the env names more than
    one worker so single-host runs stay untouched (kube/train-v5e-multihost
    .yaml is the deployment that exercises this)."""
    import os

    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h]) > 1:
        jax.distributed.initialize()


def main(argv=None):
    _maybe_init_distributed()
    args = parse_args(argv)
    set_seed(args.seed)
    logger = MetricsLogger(
        wandb_name=args.wandb_name, metrics_file=args.metrics_file
    )

    # data
    try:
        train_ds = ImageFolder(
            args.dataset, split="train", num_images=args.num_images,
            crop_size=args.patch_size, train=True, seed=args.seed,
        )
        valid_ds = ImageFolder(
            args.dataset, split="test", num_images=args.num_images_val,
            crop_size=args.patch_size, train=False,
        )
    except RuntimeError:
        print("[train] dataset not found — using synthetic data")
        train_ds = SyntheticImageDataset(n=256, h=args.patch_size, w=args.patch_size)
        valid_ds = SyntheticImageDataset(n=32, h=args.patch_size, w=args.patch_size, seed=777)
    try:
        test_ds = TestKodakDataset(args.test_datapath)
    except RuntimeError:
        test_ds = None

    train_dl = DataLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed)
    valid_dl = DataLoader(valid_ds, args.batch_size, shuffle=False)

    # model + mesh
    model = configure_model(args)
    # "tcm" is single-layer like "cnn" (ref leaves TCM unregistered; our
    # registry adds it) — only the scalable ctor surface takes the
    # two-layer loss
    from ..models import SCALABLE_MODELS

    is_scalable = args.model in SCALABLE_MODELS
    x0 = jnp.zeros((1, args.patch_size, args.patch_size, 3))
    params = jax.jit(model.init)(
        {"params": jax.random.key(args.seed), "noise": jax.random.key(args.seed + 1)},
        x0,
    )
    n_dev = len(jax.devices())
    multihost = jax.process_count() > 1
    if args.batch_size % n_dev != 0:
        mesh = None
    elif multihost:
        mesh = make_multihost_mesh()  # ('data_dcn', 'data_ici')
    else:
        mesh = make_mesh(n_dev)
    if mesh and multihost:
        # each host loads the same seeded global batch and contributes its
        # own contiguous slice (shard_batch assembles the global array from
        # process-local shards)
        sl = local_batch_slice(args.batch_size)
        shard_fn = lambda b: shard_batch(
            jax.tree_util.tree_map(lambda x: x[sl], b), mesh
        )
    else:
        shard_fn = (lambda b: shard_batch(b, mesh)) if mesh else (lambda b: b)
    print(
        f"[train] devices={n_dev} processes={jax.process_count()} "
        f"mesh={'x'.join(str(s) for s in mesh.devices.shape) if mesh else 'off'}"
    )

    from ..training.freeze import print_information

    print_information(params["params"])
    state = create_train_state(params, clip_max_norm=args.clip_max_norm)
    start_epoch = 0
    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint, target=state)
        state = state.replace(params=ckpt["params"])
        if args.continue_training:
            state = state.replace(
                opt_state_main=ckpt["opt_state_main"],
                opt_state_aux=ckpt["opt_state_aux"],
                step=ckpt["step"],
            )
            start_epoch = int(ckpt.get("epoch", 0))
        print(f"[train] resumed from {args.checkpoint} at epoch {start_epoch}")

    if is_scalable:
        criterion = ScalableRateDistortionLoss(lmbda_list=args.lambda_list)
        pr_list = list(range(len(args.lambda_list)))
    else:
        criterion = RateDistortionLoss(lmbda=args.lambda_list[0])
        pr_list = [0]

    trainable_mask = None
    if args.frozen_base and is_scalable:
        from ..training.freeze import freezer_mask

        trainable_mask = freezer_mask(model, state.params["params"])
        print("[train] frozen base — training progressive branch only")
    train_step = make_train_step(
        model, criterion, mesh=mesh, clip_max_norm=args.clip_max_norm,
        donate=True, trainable_mask=trainable_mask,
    )
    eval_step = make_eval_step(model, criterion, mesh=mesh)

    scheduler = ReduceLROnPlateau(args.learning_rate, factor=0.3, patience=4)
    rng = jax.random.key(args.seed + 2)
    counter = 0
    best_loss = float("inf")
    save_dir = Path(args.save_path) / checkpoint_name(args)

    if args.tester:
        assert args.checkpoint, "--tester requires --checkpoint"
        _run_codec_eval(args, model, state, test_ds, pr_list, -1, logger)
        return

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        print(f"Epoch {epoch} | lr {scheduler.lr:.2e}")

        state, rng, counter = train_one_epoch(
            state, train_step, train_dl, rng, scheduler.lr,
            args.aux_learning_rate, epoch, counter, logger, shard_fn,
        )
        valid_loss = valid_epoch(
            state.params, eval_step, valid_dl, epoch, logger, shard_fn
        )
        lr = scheduler.step(valid_loss)

        if test_ds is not None:
            test_epoch(model, state.params, test_ds, epoch, pr_list, criterion, logger)

        is_best = valid_loss < best_loss
        best_loss = min(best_loss, valid_loss)

        if (epoch % args.codec_interval == 0 or is_best) and test_ds is not None:
            _run_codec_eval(args, model, state, test_ds, pr_list, epoch, logger)

        save_checkpoint(
            str(save_dir / "last"), state, epoch=epoch, args=vars(args)
        )
        if is_best:
            save_checkpoint(
                str(save_dir / "very_best"), state, epoch=epoch, args=vars(args)
            )
        print(f"Epoch {epoch} done in {sec_to_hours(time.time() - t0)}")

    logger.close()


def _run_codec_eval(args, model, state, test_ds, pr_list, epoch, logger):
    from ..models import SCALABLE_MODELS

    codec_cls = (
        ScalableCodec if args.model in SCALABLE_MODELS else WACNNCodec
    )
    codec = codec_cls(model, state.params)
    codec.update(force=True)
    files = getattr(test_ds, "image_path", None)
    if not files:
        return
    bpps, psnrs = compress_with_ac(codec, files, epoch, pr_list, logger)
    print(f"[codec eval] epoch {epoch}: bpp={bpps} psnr={psnrs}")
    from ..utils.plot import plot_rate_distorsion

    plot_rate_distorsion(
        {"ours": bpps}, {"ours": psnrs}, epoch=epoch,
        save_path=str(Path(args.save_path) / f"rd_epoch{epoch}.png"),
        logger=logger, entropy_estimation="compression",
    )


if __name__ == "__main__":
    main()
