from loongx_tpu.models.flux.model import (  # noqa: F401
    FluxConfig,
    init_flux_params,
    flux_forward,
)
