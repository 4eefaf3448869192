from .determinism import set_determinism
from .eval_metrics import compute_mae, compute_mse, compute_psnr, compute_ssim
from .logging import MetricLogger
from .losses import ensure_three_channels
from .metrics import compute_regression_metrics
from .profiling import StepTimer, start_profiler_server, trace_if
from .visualization import (
    normalize_batch_for_display,
    normalize_image_to_uint8,
    visualize_2d_image,
    visualize_one_slice_in_3d_image,
)

__all__ = [
    "MetricLogger",
    "StepTimer",
    "ensure_three_channels",
    "start_profiler_server",
    "trace_if",
    "compute_mae",
    "compute_mse",
    "compute_psnr",
    "compute_regression_metrics",
    "compute_ssim",
    "normalize_batch_for_display",
    "normalize_image_to_uint8",
    "set_determinism",
    "visualize_2d_image",
    "visualize_one_slice_in_3d_image",
]
