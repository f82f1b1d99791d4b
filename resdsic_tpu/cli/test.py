"""Stand-alone eval driver (parity: src/test.py:32-103).

Loads a finished checkpoint, runs real-codec eval over Kodak at the
reference quality grid, and plots RD curves vs the hardcoded anchors.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..data import TestKodakDataset
from ..models import ScalableCodec, WACNNCodec, get_model
from ..training.loop import compress_with_ac
from ..utils.checkpoint import load_checkpoint
from ..utils.logging import MetricsLogger
from ..utils.plot import plot_rate_distorsion

# reference quality grid (src/test.py:36)
DEFAULT_PR_LIST = [0, 0.5, 0.4, 0.3, 0.2, 0.1, 1]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--checkpoint", required=True)
    parser.add_argument("-m", "--model", default="ind")
    parser.add_argument("--test_datapath", default="./data/kodak")
    parser.add_argument("--lambda_list", nargs="+", type=float,
                        default=[0.0035, 0.065])
    parser.add_argument("--mask_policy", default="two-levels")
    parser.add_argument("--pr_list", nargs="+", type=float, default=None)
    parser.add_argument("--plot_path", default="rd_curve.png")
    parser.add_argument("--wandb_name", default=None)
    args = parser.parse_args(argv)

    logger = MetricsLogger(wandb_name=args.wandb_name)
    model_cls = get_model(args.model)
    kwargs = {}
    if args.model != "cnn":
        kwargs = dict(
            lmbda_list=tuple(args.lambda_list), mask_policy=args.mask_policy
        )
    model = model_cls(**kwargs)

    if args.checkpoint.endswith((".pth.tar", ".pth", ".pt")):
        from ..utils.torch_convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.checkpoint)
    else:
        params = load_checkpoint(args.checkpoint)["params"]

    codec_cls = ScalableCodec if args.model != "cnn" else WACNNCodec
    codec = codec_cls(model, params)
    codec.update(force=True)

    test_ds = TestKodakDataset(args.test_datapath)
    pr_list = args.pr_list
    if pr_list is None:
        pr_list = DEFAULT_PR_LIST if args.model != "cnn" else [0]

    bpps, psnrs = compress_with_ac(
        codec, test_ds.image_path, epoch=-1, pr_list=pr_list, logger=logger
    )
    print("bpp:", bpps)
    print("psnr:", psnrs)
    plot_rate_distorsion(
        {"ours": bpps}, {"ours": psnrs}, epoch=-1,
        save_path=args.plot_path, logger=logger,
        entropy_estimation="compression",
    )


if __name__ == "__main__":
    main()
