"""REAL two-process multi-host training (VERDICT r2 item 5): two
`jax.distributed` CPU processes (localhost coordinator, Gloo
collectives) run `training()` with train.multihost True / global
batch_size 2 on a shared synthetic scene. This exercises everything the
single-process suite cannot reach: `jax.distributed.initialize`
ordering, `make_array_from_process_local_data` globalization
(runner.globalize), the lockstep epoch shuffle with per-host disjoint
slices, cross-process gradient pmean over the global mesh, and the
single-writer artifact discipline (runner.training is_writer gates).

No reference analog — the reference is strictly single-process
(lib/utils/cfg_utils.py:9-11); this is BASELINE.md's 2-host scaling
target made testable without hardware.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from street_gaussians_tpu.data.synthetic_waymo import write_synthetic_waymo


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_training(tmp_path):
    root = str(tmp_path / "seq")
    # the workers patch the sensor sizes themselves (they cannot see
    # this process's monkeypatching)
    import street_gaussians_tpu.data.waymo as waymo

    old = waymo.IMAGE_HEIGHTS, waymo.IMAGE_WIDTHS
    waymo.IMAGE_HEIGHTS, waymo.IMAGE_WIDTHS = [64] * 5, [96] * 5
    try:
        write_synthetic_waymo(root, num_frames=4, cameras=(0,))
    finally:
        waymo.IMAGE_HEIGHTS, waymo.IMAGE_WIDTHS = old

    out_root = str(tmp_path / "out")
    os.makedirs(out_root, exist_ok=True)
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    results = [os.path.join(out_root, f"result_{p}.json") for p in (0, 1)]

    env = dict(os.environ)
    # workers must see ONE local CPU device each (the parent conftest's
    # 8-device XLA_FLAGS would give 16 global devices and change the
    # mesh shape)
    env["XLA_FLAGS"] = ""
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), "2", coord, root, out_root,
             results[p]],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.join(os.path.dirname(__file__), ".."),
        )
        for p in (0, 1)
    ]
    outs = [p.communicate(timeout=850)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    res = [json.load(open(r)) for r in results]
    assert res[0]["process_index"] == 0 and res[1]["process_index"] == 1

    # identical final parameters on both hosts — the DP collectives tied
    # them together (replicated params, pmean'd grads, lockstep shuffle)
    assert res[0]["param_checksum"] == res[1]["param_checksum"], (
        f"hosts diverged: {res[0]['param_checksum']} vs "
        f"{res[1]['param_checksum']}"
    )
    import numpy as np

    assert np.isfinite(res[0]["ema_loss"])

    # single-writer discipline: only process 0 wrote artifacts
    assert res[0]["wrote_log"] and res[0]["wrote_checkpoint"]
    assert not res[1]["wrote_log"] and not res[1]["wrote_checkpoint"]
