"""Loss & metric library (JAX)."""

from bmcnet_esr_tpu.losses.restore import mse_loss, psnr, psnr_metric, ssim, ssim_metric
from bmcnet_esr_tpu.losses.lpips import (
    LPIPS,
    DistanceModel,
    dssim_distance,
    l2_distance,
    perceptual_loss,
    resnet_features,
)
from bmcnet_esr_tpu.losses.lpips_train import (
    LPIPSTrainer,
    bce_ranking_loss,
    compute_accuracy,
    dist2logit,
    init_dist2logit,
    score_2afc_dataset,
    score_jnd_dataset,
    voc_ap,
)
from bmcnet_esr_tpu.losses.iwe import (
    compute_pol_iwe,
    deblur_events,
    events_to_iwe_order,
    get_interpolation,
    interpolate,
    purge_unfeasible,
)
from bmcnet_esr_tpu.losses.flow import averaged_iwe, event_warping_loss
from bmcnet_esr_tpu.losses.gradients import sobel
from bmcnet_esr_tpu.losses.terms import LossContext
from bmcnet_esr_tpu.losses.reconstruction import (
    BrightnessConstancy,
    generative_model_loss,
    temporal_consistency_loss,
    total_variation_loss,
)

__all__ = [
    "LPIPS",
    "DistanceModel",
    "dssim_distance",
    "l2_distance",
    "perceptual_loss",
    "resnet_features",
    "LPIPSTrainer",
    "bce_ranking_loss",
    "compute_accuracy",
    "dist2logit",
    "init_dist2logit",
    "score_2afc_dataset",
    "score_jnd_dataset",
    "voc_ap",
    "mse_loss",
    "psnr",
    "psnr_metric",
    "ssim",
    "ssim_metric",
    "compute_pol_iwe",
    "deblur_events",
    "events_to_iwe_order",
    "get_interpolation",
    "interpolate",
    "purge_unfeasible",
    "averaged_iwe",
    "event_warping_loss",
    "sobel",
    "BrightnessConstancy",
    "generative_model_loss",
    "temporal_consistency_loss",
    "total_variation_loss",
    "LossContext",
]
