from loongx_tpu.ops.rope import rope_embed, apply_rope  # noqa: F401
from loongx_tpu.ops.latents import (  # noqa: F401
    pack_latents,
    unpack_latents,
    latent_image_ids,
)
from loongx_tpu.ops.schedule import (  # noqa: F401
    flux_sigmas,
    calculate_shift,
    time_shift,
    euler_step,
)
