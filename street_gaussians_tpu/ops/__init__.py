from street_gaussians_tpu.ops.preprocess import (  # noqa: F401
    GaussianScreenData,
    compute_cov3d,
    preprocess_gaussians,
)
from street_gaussians_tpu.ops.rasterize import RasterizeConfig, rasterize  # noqa: F401
