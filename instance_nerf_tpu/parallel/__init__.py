from instance_nerf_tpu.parallel import mesh, train_step  # noqa: F401
