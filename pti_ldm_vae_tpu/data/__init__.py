from .datasets import (
    attributes_for_paths,
    list_tif_paths,
    load_attribute_json,
    normalize_attributes,
    select_attribute_sources,
    split_dataset,
)
from .factory import (
    RegressionLoader,
    create_regression_dataloaders,
    create_regression_eval_dataloader,
    create_vae_dataloaders,
    create_vae_inference_dataloader,
)
from .io import TifReader, read_image, write_png, write_tif
from .loader import ShardedDataLoader, shard_indices
from .transforms import (
    local_normalize_by_mask,
    local_normalize_by_mask_np,
    preprocess_batch_device,
    preprocess_image_np,
    resize_area_np,
)

__all__ = [
    "RegressionLoader",
    "ShardedDataLoader",
    "TifReader",
    "attributes_for_paths",
    "create_regression_dataloaders",
    "create_regression_eval_dataloader",
    "create_vae_dataloaders",
    "create_vae_inference_dataloader",
    "list_tif_paths",
    "load_attribute_json",
    "local_normalize_by_mask",
    "local_normalize_by_mask_np",
    "normalize_attributes",
    "preprocess_batch_device",
    "preprocess_image_np",
    "read_image",
    "resize_area_np",
    "select_attribute_sources",
    "shard_indices",
    "split_dataset",
    "write_png",
    "write_tif",
]
