from street_gaussians_tpu.parallel.dp import make_data_parallel_train_step, make_mesh  # noqa: F401
