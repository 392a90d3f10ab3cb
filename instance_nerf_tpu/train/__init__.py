from instance_nerf_tpu.train import checkpoints  # noqa: F401
