"""Observability: wandb-compatible metrics logging with a JSONL fallback.

The reference logs per-batch/per-epoch metrics and RD curves to wandb
(SURVEY.md §2.10). wandb is an optional dependency here: if installed and a
run name is given we log to it; otherwise metrics go to a JSONL file and/or
stdout with the same dict schema, so downstream tooling sees identical keys.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(
        self,
        wandb_name: Optional[str] = None,
        project: str = "ResDSIC-TPU",
        metrics_file: Optional[str] = None,
        echo: bool = True,
    ):
        self._wandb = None
        self.echo = echo
        self._fh = None
        if wandb_name:
            try:
                import wandb

                wandb.init(project=project, name=wandb_name)
                self._wandb = wandb
            except Exception as e:  # wandb absent or offline
                print(f"[logging] wandb unavailable ({e}); using JSONL", file=sys.stderr)
        if metrics_file:
            Path(metrics_file).parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(metrics_file, "a")

    def log(self, metrics: dict) -> None:
        metrics = {
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        }
        if self._wandb is not None:
            self._wandb.log(metrics)
        if self._fh is not None:
            self._fh.write(json.dumps({"t": time.time(), **metrics}) + "\n")
            self._fh.flush()
        if self.echo and self._wandb is None:
            compact = ", ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(f"[metrics] {compact}")

    def save_file(self, path: str) -> None:
        if self._wandb is not None:
            self._wandb.save(path)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
