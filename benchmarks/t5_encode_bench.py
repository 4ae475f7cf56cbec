"""Int8 T5-XXL prompt encode: stacked Pallas scan vs per-slice XLA dequant.

The reference's deployed edit encodes the prompt through T5-XXL every time
(/root/reference/src/flux/pipeline_tools.py:36-49); at 512 tokens the
encoder is weight-HBM-bound, and the XLA dequant path (read int8 slice ->
write transient bf16 copy -> read it back) pays ~3x the weight traffic of
the in-kernel tile dequant.  This times both paths at the serving point
(B=1, S=512, bf16 activations, int8 weights) via the device trace.

Usage: PYTHONPATH=. python benchmarks/t5_encode_bench.py
"""

import jax
import jax.numpy as jnp

from loongx_tpu.models.text.t5 import T5Config, init_t5_params, t5_encode
from loongx_tpu.ops.quant import random_quantized_like
from loongx_tpu.utils.device_bench import device_op_times


def total_ms(ops: dict, n: int) -> float:
    # `while.*` scan wrapper rows CONTAIN their nested fusions (PERF_NOTES
    # methodology) — exclude them so nothing is double-counted
    return sum(v for k, v in ops.items() if not k.startswith("while")) / n


def main() -> None:
    cfg = T5Config.xxl()
    key = jax.random.key(0)
    params = random_quantized_like(
        key, lambda: init_t5_params(key, cfg, dtype=jnp.bfloat16)
    )
    ids = jnp.ones((1, 512), jnp.int32)

    for stacked in (False, True):
        fn = jax.jit(
            lambda p, i, stacked=stacked: t5_encode(
                p, cfg, i, stacked_kernels=stacked
            )
        )
        ops = device_op_times(lambda: fn(params, ids), n=5, warmup=2)
        label = "stacked-pallas" if stacked else "xla-dequant"
        print(f"{label:>15}: {total_ms(ops, 5):8.2f} ms/encode")


if __name__ == "__main__":
    main()
