from instance_nerf_tpu.ops import boxes, coders, nms, rotated_iou, sampling  # noqa: F401
