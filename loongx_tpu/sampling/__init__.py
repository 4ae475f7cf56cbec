from loongx_tpu.sampling.condition import Condition, CONDITION_TYPE_IDS  # noqa: F401
from loongx_tpu.sampling.generate import (  # noqa: F401
    fused_edit_program, generate, neural_edit,
)
