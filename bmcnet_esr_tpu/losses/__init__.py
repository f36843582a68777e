"""Loss & metric library (JAX)."""

from bmcnet_esr_tpu.losses.restore import mse_loss, psnr, psnr_metric, ssim, ssim_metric

__all__ = ["mse_loss", "psnr", "psnr_metric", "ssim", "ssim_metric"]
