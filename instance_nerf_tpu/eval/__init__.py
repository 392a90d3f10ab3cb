from instance_nerf_tpu.eval import metrics  # noqa: F401
