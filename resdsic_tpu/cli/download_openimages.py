"""OpenImages download driver (parity: src/downloader_openimages.py).

The reference pulls 300k train / 10k test classification images via the
fiftyone zoo. fiftyone is an optional dependency here; when absent we print
the exact recipe instead of failing silently.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", default="./data/openimages")
    parser.add_argument("--max_train", type=int, default=300000)
    parser.add_argument("--max_test", type=int, default=10000)
    args = parser.parse_args(argv)

    try:
        import fiftyone.zoo as foz
    except ImportError:
        print(
            "fiftyone is not installed. Install it (pip install fiftyone) "
            "and re-run, or place images under "
            f"{args.output_dir}/train/data and {args.output_dir}/test/data.",
            file=sys.stderr,
        )
        sys.exit(1)

    for split, cap in [("train", args.max_train), ("test", args.max_test)]:
        foz.load_zoo_dataset(
            "open-images-v6",
            split="train" if split == "train" else "test",
            label_types=["classifications"],
            max_samples=cap,
            dataset_dir=args.output_dir,
        )


if __name__ == "__main__":
    main()
