from loongx_tpu.models.text.t5 import T5Config, init_t5_params, t5_encode  # noqa: F401
from loongx_tpu.models.text.clip import (  # noqa: F401
    CLIPTextConfig,
    init_clip_params,
    clip_encode,
)
from loongx_tpu.models.text.whisper import (  # noqa: F401
    WhisperASR,
    WhisperConfig,
    init_whisper_params,
    whisper_encode,
    whisper_greedy_decode,
)
from loongx_tpu.models.text.marian import (  # noqa: F401
    MarianConfig,
    MarianTranslator,
    init_marian_params,
    marian_encode,
    marian_greedy_decode,
)
