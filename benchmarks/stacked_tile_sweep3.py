"""block_m probe at (3072,3072) tiles incl. full-M (grid collapses to one
row of N-tiles; needs the raised scoped-VMEM cap)."""
import os

os.environ.setdefault("LOONGX_W8A8", "1")

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.ops.quant_matmul import quant_matmul_stacked
from loongx_tpu.utils.device_bench import device_op_times

SHAPES = [
    ("sgl mlp-in", 2560, 3072, 12288, 38),
    ("sgl proj-out", 2560, 15360, 3072, 38),
    ("dbl qkv-fused", 2048, 3072, 9216, 19),
]
rng = np.random.default_rng(0)
for label, m, k, n, nb in SHAPES:
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wq3 = jnp.asarray(rng.integers(-127, 128, (nb, k, n)), np.int8)
    sc3 = jnp.full((nb, 1, n), 1e-3, jnp.float32)
    blk = jnp.int32(nb // 2)
    fl = 2 * m * k * n / 1e12
    for bm in (512, 640, 1280, m):
        if m % bm:
            continue
        try:
            fn = jax.jit(lambda x, w, sc: quant_matmul_stacked(
                x, w, sc, blk, block_m=bm, block_n=3072, block_k=3072))
            ops = device_op_times(lambda: fn(x, wq3, sc3), n=3, warmup=1)
            ms = sum(t for nm, t in ops.items()
                     if "stacked" in nm or "qmm" in nm or "quant" in nm) / 3
            tf = fl / (ms / 1e3) if ms else float("nan")
            print(f"{label:14s} m{bm:5d}: {ms:7.3f} ms  {tf:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:14s} m{bm:5d}: FAILED {str(e)[:70]}", flush=True)
    print(flush=True)
