"""Tile sweep for the STACKED scalar-prefetch W8A8 kernels at the hot
full-dev shapes (device-trace timed).  The production policy lives in
`ops/quant_matmul._stacked_blocks`; this finds/validates it."""
import os

os.environ.setdefault("LOONGX_W8A8", "1")

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.ops.quant_matmul import quant_matmul_stacked
from loongx_tpu.utils.device_bench import device_op_times

# (label, M, K, N, NB) — the per-block linears of full-dev at 512px
SHAPES = [
    ("dbl qkv-fused", 2048, 3072, 9216, 19),
    ("dbl ff-in", 2048, 3072, 12288, 19),
    ("dbl ff-out", 2048, 12288, 3072, 19),
    ("sgl qkv-fused", 2560, 3072, 9216, 38),
    ("sgl mlp-in", 2560, 3072, 12288, 38),
    ("sgl proj-out", 2560, 15360, 3072, 38),
]
TILES = [
    (None, None),          # production policy
    (1024, 1024), (2048, 1536), (1024, 3072), (2048, 3072),
]

rng = np.random.default_rng(0)
for label, m, k, n, nb in SHAPES:
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wq3 = jnp.asarray(rng.integers(-127, 128, (nb, k, n)), np.int8)
    sc3 = jnp.full((nb, 1, n), 1e-3, jnp.float32)
    blk = jnp.int32(nb // 2)
    fl = 2 * m * k * n / 1e12
    best = None
    for bn, bk in TILES:
        if bn is not None and (n % bn or k % bk):
            continue
        try:
            fn = jax.jit(
                lambda x, w, sc: quant_matmul_stacked(
                    x, w, sc, blk, block_n=bn, block_k=bk
                )
            )
            ops = device_op_times(lambda: fn(x, wq3, sc3), n=3, warmup=1)
            ms = sum(t for nm, t in ops.items()
                     if "stacked" in nm or "qmm" in nm or "quant" in nm) / 3
            tf = fl / (ms / 1e3) if ms else float("nan")
            tag = "auto" if bn is None else f"({bn},{bk})"
            print(f"{label:14s} {tag:12s}: {ms:7.3f} ms  {tf:6.1f} TF/s", flush=True)
            if ms and (best is None or ms < best[0]):
                best = (ms, tag)
        except Exception as e:  # noqa: BLE001
            print(f"{label:14s} ({bn},{bk}): FAILED {str(e)[:60]}")
    if best:
        print(f"{label:14s} BEST {best[1]} {best[0]:.3f} ms")
    print()
