from .functions import AverageMeter, compute_msssim, compute_psnr, read_image, set_seed
from .metrics import ms_ssim, psnr

__all__ = [
    "AverageMeter",
    "compute_psnr",
    "compute_msssim",
    "read_image",
    "set_seed",
    "psnr",
    "ms_ssim",
]
