"""RD-curve plotting (parity: src/compress/utils/plot.py, root plot.py).

Renders rate-distortion curves against the hardcoded reference anchors and
either logs the figure to wandb or writes a PNG.
"""

from __future__ import annotations

from typing import Optional, Sequence

# WACNN Kodak anchors hardcoded in the reference (train.py:321-322)
ANCHOR_BPP = [0.13, 0.199, 0.309, 0.449, 0.649, 0.895]
ANCHOR_PSNR = [29.20, 30.57, 32.26, 34.15, 35.91, 37.70]


def plot_rate_distorsion(
    bpp_res: dict,
    psnr_res: dict,
    epoch: int = 0,
    save_path: Optional[str] = None,
    logger=None,
    entropy_estimation: str = "model",
):
    """bpp_res/psnr_res: {curve_name: [values...]}; adds the anchor curve."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("[plot] matplotlib unavailable — skipping RD plot")
        return None

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.plot(ANCHOR_BPP, ANCHOR_PSNR, "k--o", label="WACNN anchor (reference)")
    for name in bpp_res:
        ax.plot(bpp_res[name], psnr_res[name], "-o", label=f"{name} ({entropy_estimation})")
    ax.set_xlabel("bpp")
    ax.set_ylabel("PSNR (dB)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    ax.set_title(f"Rate-distortion, epoch {epoch}")

    if save_path:
        from pathlib import Path

        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
    if logger is not None and getattr(logger, "_wandb", None) is not None:
        logger._wandb.log({"rd_curve": logger._wandb.Image(fig)})
    plt.close(fig)
    return save_path
