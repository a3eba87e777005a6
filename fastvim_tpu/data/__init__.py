from fastvim_tpu.data.detection import (
    CocoDetectionDataset,
    DetectionLoader,
    SyntheticDetectionDataset,
    create_detection_loader,
)
from fastvim_tpu.data.segmentation import (
    ADE20KDataset,
    SegmentationLoader,
    create_segmentation_loader,
)
from fastvim_tpu.data.loader import (
    DataLoader,
    ImageFolderDataset,
    SyntheticDataset,
    create_imagenet_loader,
)

__all__ = [
    "ADE20KDataset",
    "CocoDetectionDataset",
    "DataLoader",
    "DetectionLoader",
    "SegmentationLoader",
    "SyntheticDetectionDataset",
    "create_detection_loader",
    "create_segmentation_loader",
    "ImageFolderDataset",
    "SyntheticDataset",
    "create_imagenet_loader",
]
