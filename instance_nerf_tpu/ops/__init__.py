from instance_nerf_tpu.ops import (  # noqa: F401
    boxes,
    coders,
    mask_paste,
    nms,
    poolers,
    projection,
    roi_align,
    rotated_iou,
    sampling,
)
