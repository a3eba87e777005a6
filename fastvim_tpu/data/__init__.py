from fastvim_tpu.data.loader import (
    DataLoader,
    ImageFolderDataset,
    SyntheticDataset,
    create_imagenet_loader,
)

__all__ = [
    "DataLoader",
    "ImageFolderDataset",
    "SyntheticDataset",
    "create_imagenet_loader",
]
