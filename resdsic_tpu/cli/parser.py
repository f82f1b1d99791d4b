"""Flag system mirroring the reference argparse surface
(src/compress/utils/parser.py:6-74), minus hardcoded /scratch paths."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="resdsic_tpu training")

    parser.add_argument("-e", "--epochs", default=120, type=int)
    parser.add_argument("-lr", "--learning-rate", default=1e-4, type=float)
    parser.add_argument("--aux-learning-rate", default=1e-3, type=float)
    parser.add_argument("-n", "--num-workers", default=8, type=int)
    parser.add_argument("--batch-size", default=16, type=int)
    parser.add_argument("--test-batch-size", default=1, type=int)
    parser.add_argument("--patch-size", default=256, type=int)
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--clip_max_norm", default=1.0, type=float)

    parser.add_argument("-d", "--dataset", default="./data/openimages", type=str)
    parser.add_argument("--test_datapath", default="./data/kodak", type=str)
    parser.add_argument("--num_images", default=300000, type=int)
    parser.add_argument("--num_images_val", default=10000, type=int)
    parser.add_argument("--save_path", default="./checkpoints", type=str)

    from ..models import models as _registry

    parser.add_argument(
        "-m", "--model", default="ind", type=str,
        choices=sorted(_registry),  # incl. tcm/tcm_shared/tcm_ind
    )
    parser.add_argument(
        "--lambda_list", dest="lambda_list", nargs="+", type=float,
        default=[0.0035, 0.065],
    )
    # no choices restriction (ref parser.py:37 has none): the shared
    # family validates {two-levels, learnable-mask, point-based-std,
    # all-one, all-zero}; the icd family's Mask module adds
    # {learnable-mask-gamma, learnable-mask-nested, scalable_res} —
    # an unknown policy raises NotImplementedError at trace time
    parser.add_argument("--mask_policy", default="two-levels", type=str)
    parser.add_argument("--N", default=192, type=int,
                        help="WACNN-family width (TCM geometry is fixed "
                        "by its class defaults)")
    parser.add_argument("--M", default=320, type=int)
    parser.add_argument("--lrp_prog", action="store_true", default=True)
    parser.add_argument("--no-lrp_prog", dest="lrp_prog", action="store_false")
    parser.add_argument("--independent_lrp", action="store_true")
    parser.add_argument("--multiple_decoder", action="store_true")
    parser.add_argument(
        "--joiner_policy", default="conditional", type=str,
        choices=["conditional", "residual", "concatenation", "cac",
                 "block_concatenation"],
    )

    parser.add_argument("--checkpoint", default=None, type=str)
    parser.add_argument("--continue_training", action="store_true")
    parser.add_argument("--frozen_base", action="store_true")
    parser.add_argument("--tester", action="store_true")

    parser.add_argument("--valid_interval", default=1, type=int)
    parser.add_argument("--codec_interval", default=5, type=int,
                        help="real-codec eval every N epochs")
    parser.add_argument("--wandb_name", default=None, type=str,
                        help="optional wandb run name (wandb must be installed)")
    parser.add_argument("--metrics_file", default=None, type=str,
                        help="JSONL metrics sink (wandb replacement)")

    return parser.parse_args(argv)
