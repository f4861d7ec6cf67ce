from street_gaussians_tpu.models.gaussians import (  # noqa: F401
    GaussianAux,
    GaussianParams,
    SceneTable,
    pack_scene,
)
