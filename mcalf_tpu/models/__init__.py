from mcalf_tpu.models.forward import AbsorptionModel, CCGS, CLIGHT_KMS, TAU_CONST
from mcalf_tpu.models.jax_model import JaxForward, make_jax_forward

__all__ = [
    "AbsorptionModel",
    "JaxForward",
    "make_jax_forward",
    "CCGS",
    "CLIGHT_KMS",
    "TAU_CONST",
]
