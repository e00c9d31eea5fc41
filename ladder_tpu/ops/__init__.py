from ladder_tpu.ops.distributions import (
    diag_gaussian_entropy,
    diag_gaussian_logpdf,
    diag_mixture_logpdf,
    gmm_cholesky,
    gmm_logpdf,
    gmm_logpdf_from_cov,
    mvn_full_logpdf,
    sample_diag_gaussian,
    sample_gmm,
)
from ladder_tpu.ops.image import (
    depth_to_space,
    instance_norm,
    pad_symmetric,
    resize_bilinear_tf1,
    space_to_depth,
)

__all__ = [
    "diag_gaussian_entropy",
    "diag_gaussian_logpdf",
    "diag_mixture_logpdf",
    "gmm_cholesky",
    "gmm_logpdf",
    "gmm_logpdf_from_cov",
    "mvn_full_logpdf",
    "sample_diag_gaussian",
    "sample_gmm",
    "depth_to_space",
    "instance_norm",
    "pad_symmetric",
    "resize_bilinear_tf1",
    "space_to_depth",
]
