"""loongx_tpu — a TPU-native framework for neural-driven image editing.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of LanceZPF/loongx
(NeurIPS 2025, "Neural-Driven Image Editing"): a FLUX.1-style diffusion
transformer conditioned on OminiControl-style condition-image tokens and on
multimodal neurophysiological signals (EEG / fNIRS / PPG / head motion)
encoded by CS3 (cross-scale state-space) encoders and fused with text
embeddings through DGF (dynamic gated fusion / DUAN).

Everything on the compute path is pure-functional JAX: parameters are pytrees,
models are `apply(params, ...)` functions, the sampler is a jitted `lax.scan`,
and multi-chip execution is expressed with `jax.sharding.Mesh` + NamedSharding
rather than process-group collectives.
"""

__version__ = "0.1.0"

from loongx_tpu.config import Config, load_config  # noqa: F401


def __getattr__(name):
    # Lazy top-level API (keeps `import loongx_tpu` light).
    if name == "LoongXPipeline":
        from loongx_tpu.models.pipeline import LoongXPipeline

        return LoongXPipeline
    if name == "generate":
        from loongx_tpu.sampling import generate

        return generate
    if name == "Condition":
        from loongx_tpu.sampling import Condition

        return Condition
    raise AttributeError(f"module 'loongx_tpu' has no attribute {name!r}")
