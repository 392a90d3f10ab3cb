from instance_nerf_tpu.data import augment, datasets, synthetic  # noqa: F401
