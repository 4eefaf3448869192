from .autoencoder_kl import AutoencoderKL, autoencoder_from_config
from .discriminator import PatchDiscriminator
from .lpips import (
    ensure_three_channels,
    init_lpips_params,
    load_lpips_params,
    lpips_distance,
    lpips_distance_per_sample,
)
from .regressor import LatentRegressor, VAELatentRegressor, flatten_latent, infer_flat_dim_from_patch
from .unet import (
    ConditionProjector,
    DiffusionUNet,
    diffusion_unet_from_config,
    project_latent_condition,
)

__all__ = [
    "AutoencoderKL",
    "ConditionProjector",
    "DiffusionUNet",
    "LatentRegressor",
    "PatchDiscriminator",
    "VAELatentRegressor",
    "autoencoder_from_config",
    "diffusion_unet_from_config",
    "ensure_three_channels",
    "flatten_latent",
    "infer_flat_dim_from_patch",
    "init_lpips_params",
    "load_lpips_params",
    "lpips_distance",
    "lpips_distance_per_sample",
    "project_latent_condition",
]
