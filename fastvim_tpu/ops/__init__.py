from fastvim_tpu.ops.boxes import (
    box_iou,
    delta_decode,
    delta_encode,
    generate_anchors,
    max_iou_assign,
    multilevel_roi_align,
    nms,
    random_sample,
    roi_align,
)
from fastvim_tpu.ops.conv import (
    anticausal_conv1d,
    causal_conv1d,
    causal_conv1d_update,
)
from fastvim_tpu.ops.norms import add_norm, layer_norm, rms_norm
from fastvim_tpu.ops.scan import (
    broadcast_grid,
    broadcast_tokens,
    pool_grid,
    pool_tokens,
    selective_scan,
    selective_scan_assoc,
    selective_scan_ref,
)
from fastvim_tpu.ops.state_update import selective_state_update

__all__ = [
    "add_norm",
    "box_iou",
    "delta_decode",
    "delta_encode",
    "generate_anchors",
    "max_iou_assign",
    "multilevel_roi_align",
    "nms",
    "random_sample",
    "roi_align",
    "anticausal_conv1d",
    "broadcast_grid",
    "broadcast_tokens",
    "causal_conv1d",
    "causal_conv1d_update",
    "layer_norm",
    "pool_grid",
    "pool_tokens",
    "rms_norm",
    "selective_scan",
    "selective_scan_assoc",
    "selective_scan_ref",
    "selective_state_update",
]
