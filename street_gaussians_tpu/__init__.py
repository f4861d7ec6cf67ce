"""street_gaussians_tpu — a TPU-native (JAX/XLA/Pallas) framework for
dynamic urban scene reconstruction with composite 3D Gaussian splatting.

Built from scratch with the capabilities of zju3dv/street_gaussians
(reference layout documented in SURVEY.md): a static background Gaussian
cloud + per-actor Gaussian clouds rigidly posed by optimizable tracklets
with 4D Fourier spherical-harmonic appearance + a learned sky cubemap,
all rendered by a tile-based differentiable rasterizer.

TPU-first design decisions (vs. the CUDA reference):
  * fixed-capacity Gaussian buffers + alive masks (static shapes for XLA)
  * tile rasterization as Pallas kernels with a custom VJP; gradient
    accumulation via matmuls + segment-sums instead of atomics
  * the scene graph is one packed array-of-structs with per-Gaussian
    object ids; actor transforms are a single vectorized gather
  * scaling via jax.sharding.Mesh (camera data-parallel, tile-sharded
    rendering) rather than any host-side multiprocessing
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: axon/TPU compiles of the train step
# run minutes; caching makes every CLI/bench rerun start hot. Opt out
# with SGTPU_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("SGTPU_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "sgtpu_xla"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
