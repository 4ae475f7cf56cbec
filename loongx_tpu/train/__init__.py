from loongx_tpu.train.lora import (  # noqa: F401
    add_lora,
    lora_mask,
    merge_lora,
    DEFAULT_TARGETS,
)
from loongx_tpu.train.optim import prodigy, build_optimizer  # noqa: F401
