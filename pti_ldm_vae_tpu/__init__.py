"""pti_ldm_vae_tpu — TPU-native medical-imaging VAE/LDM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
PTI-LDM-VAE reference (PyTorch + MONAI + NCCL), built TPU-first:

* models as pure-functional Flax modules in NHWC layout (XLA's native
  TPU conv layout), bf16 compute / f32 params by default,
* Pallas kernels for the fused hot ops (GroupNorm+SiLU, bottleneck
  attention),
* data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` with
  XLA collectives over ICI (the DDP/NCCL equivalent),
* orbax checkpointing, @ref-compatible JSON configs (the *same* config
  files drive both frameworks).

Subpackages
-----------
- ``config``     JSON config loading with MONAI-compatible ``@ref`` resolution
- ``ops``        conv/norm/resize/attention primitives + Pallas kernels
- ``models``     AutoencoderKL, PatchDiscriminator, DiffusionUNet, regressors, LPIPS
- ``losses``     KL, LSGAN, AR-VAE, perceptual, SSIM/PSNR, total-loss composition
- ``data``       image IO, transforms, splits, host->device pipeline
- ``parallel``   mesh construction and sharding helpers (DDP equivalent)
- ``train``      train state, jitted train/eval steps, training loop
- ``checkpoint`` orbax save/load + torch->jax weight conversion
- ``utils``      metrics, visualization, logging, CLI plumbing
- ``analysis``   latent cache, projections, distances, image comparison
- ``cli``        entry points mirroring the reference's vae_scripts/reg_scripts
"""

__version__ = "0.1.0"
