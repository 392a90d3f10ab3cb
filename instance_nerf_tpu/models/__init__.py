from instance_nerf_tpu.models import backbones, fcos, fpn  # noqa: F401
