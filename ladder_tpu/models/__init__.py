from ladder_tpu.models.builder import (
    PRIORS_WITH_GM,
    PRIORS_WITH_INNER_VAE,
    PRIORS_WITH_PRIOR_MODEL,
    LadderModel,
    make_model,
)
from ladder_tpu.models.celeba import CelebADecoder, CelebAEncoder
from ladder_tpu.models.inner_vae import InnerDecoder, InnerEncoder, VampPseudoInputs
from ladder_tpu.models.mnist import (
    DigitDecoder,
    DigitEncoder,
    FashionDecoder,
    FashionEncoder,
)

__all__ = [
    "PRIORS_WITH_GM",
    "PRIORS_WITH_INNER_VAE",
    "PRIORS_WITH_PRIOR_MODEL",
    "LadderModel",
    "make_model",
    "CelebADecoder",
    "CelebAEncoder",
    "InnerDecoder",
    "InnerEncoder",
    "VampPseudoInputs",
    "DigitDecoder",
    "DigitEncoder",
    "FashionDecoder",
    "FashionEncoder",
]
