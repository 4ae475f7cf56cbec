from loongx_tpu.models.text.t5 import T5Config, init_t5_params, t5_encode  # noqa: F401
from loongx_tpu.models.text.clip import (  # noqa: F401
    CLIPTextConfig,
    init_clip_params,
    clip_encode,
)
