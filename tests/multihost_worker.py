"""One jax.distributed process of the 2-process multi-host test
(tests/test_multihost.py). NOT a test file — launched as a subprocess:

    python tests/multihost_worker.py <pid> <nproc> <coord> <data> <out> <result>

Initializes the distributed runtime BEFORE any backend exists (the same
ordering train.py uses, train.py:12-24), runs `training()` with
train.multihost True / batch_size = nproc on the shared synthetic scene,
and writes the returned metrics (incl. the cross-process
`param_checksum`) + its own process_index to <result>.
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, data_root, out_root, result_path = sys.argv[3:7]

    # XLA:CPU's oneDNN matmuls reduce with thread-order-dependent
    # rounding (their own startup banner says so) — per-RUN
    # nondeterminism that would read as replica divergence here
    os.environ["TF_ENABLE_ONEDNN_OPTS"] = "0"

    # knobs for the test variants (env so the base argv stays stable):
    # MH_LOCAL_DEVICES: virtual CPU devices per process (the real host
    #   topology is hosts x local chips; default 1)
    # MH_GAUSS_SHARDS: train.gauss_shards (rows sharded across processes
    #   when batch == 1, in-host when batch > 1)
    # MH_BATCH: global camera batch (default nproc; 1 => gauss-only)
    local_devices = int(os.environ.get("MH_LOCAL_DEVICES", "1"))
    gauss_shards = int(os.environ.get("MH_GAUSS_SHARDS", "0"))
    batch = int(os.environ.get("MH_BATCH", str(nproc)))
    if local_devices > 1:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_devices}"
        )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # identical codegen on both processes: with the persistent cache on,
    # one process can load a cross-machine AOT entry while the other
    # compiles fresh — different vectorization => different rounding on
    # the two replicas => false divergence
    jax.config.update("jax_enable_compilation_cache", False)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * local_devices

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from street_gaussians_tpu.config import load_config
    from street_gaussians_tpu.data import waymo
    from street_gaussians_tpu.runner import training

    waymo.IMAGE_HEIGHTS = [64] * 5
    waymo.IMAGE_WIDTHS = [96] * 5

    # each process gets its OWN model_path so the test can verify the
    # single-writer discipline (only process 0 may write artifacts)
    cfg = load_config()
    cfg.source_path = data_root
    cfg.model_path = os.path.join(out_root, f"proc{pid}")
    cfg.trained_model_dir = os.path.join(cfg.model_path, "trained_model")
    cfg.point_cloud_dir = os.path.join(cfg.model_path, "point_cloud")
    cfg.record_dir = os.path.join(cfg.model_path, "record")
    cfg.mode = "train"
    cfg.data.type = "Waymo"
    cfg.data.split_train = 1
    cfg.data.split_test = -1
    cfg.data.cameras = [0]
    cfg.model.nsg.include_sky = False
    cfg.optim.densify_until_iter = 0
    cfg.optim.opacity_reset_interval = 10 ** 6
    cfg.train.iterations = 12
    cfg.train.batch_size = batch  # GLOBAL batch
    cfg.train.multihost = True
    if gauss_shards:
        cfg.train.gauss_shards = gauss_shards
    cfg.train.test_iterations = []
    cfg.train.save_iterations = []
    cfg.train.checkpoint_iterations = [12]
    cfg.render.tile_capacity = 128
    cfg.render.instance_capacity = 2048

    final = training(cfg, progress=False)
    final["process_index"] = jax.process_index()
    final["wrote_log"] = os.path.getsize(
        os.path.join(cfg.record_dir, "train_log.jsonl")
    ) > 0 if os.path.exists(
        os.path.join(cfg.record_dir, "train_log.jsonl")
    ) else False
    final["wrote_checkpoint"] = os.path.isdir(
        os.path.join(cfg.trained_model_dir, "iteration_12")
    )
    with open(result_path, "w") as f:
        json.dump(final, f)


if __name__ == "__main__":
    main()
