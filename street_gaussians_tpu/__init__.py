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
