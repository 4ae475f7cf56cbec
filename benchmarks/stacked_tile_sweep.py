"""Tile sweep for the STACKED scalar-prefetch W8A8 kernels at the hot
full-dev shapes (device-trace timed).  The production policy lives in
`ops/quant_matmul._stacked_blocks`; this found/validates it:
(block_m, block_n, block_k) = (512, 3072, 3072) measures 344-354 TF/s per
shape (one k-iteration on K=3072 linears, full-width N chunks) vs 259-302
under the flat-path tiles; m1280/full-M lose ~15% (worse pipelining).

Pass combos as CLI args "bm,bn,bk" (or "auto") to sweep a custom set.
NOTE: pass the weight stacks as jit ARGUMENTS (as done below) — closing
over them serializes ~0.5 GB constants into the remote-compile payload.
"""
import os
import sys

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
DEFAULT_COMBOS = [
    (512, None, None),     # production policy
    (512, 3072, 3072), (512, 2048, 3072), (512, 1024, 3072),
    (512, 1024, 1536),
]
N_ITERS = 3


def parse(arg):
    if arg == "auto":
        return (512, None, None)
    bm, bn, bk = (int(x) for x in arg.split(","))
    return bm, bn, bk


def main():
    combos = (
        [parse(a) for a in sys.argv[1:]] if len(sys.argv) > 1
        else DEFAULT_COMBOS
    )
    rng = np.random.default_rng(0)
    for label, m, k, n, nb in SHAPES:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wq3 = jnp.asarray(rng.integers(-127, 128, (nb, k, n)), np.int8)
        sc3 = jnp.full((nb, 1, n), 1e-3, jnp.float32)
        blk = jnp.int32(nb // 2)
        fl = 2 * m * k * n / 1e12
        best = None
        for bm, bn, bk in combos:
            if bn is not None and (n % bn or k % bk) or m % bm:
                continue
            try:
                fn = jax.jit(
                    lambda x, w, sc: quant_matmul_stacked(
                        x, w, sc, blk, block_m=bm, block_n=bn, block_k=bk
                    )
                )
                ops = device_op_times(
                    lambda: fn(x, wq3, sc3), n=N_ITERS, warmup=1
                )
                ms = sum(
                    t for nm, t in ops.items()
                    if "stacked" in nm or "qmm" in nm or "quant" in nm
                ) / N_ITERS
                tf = fl / (ms / 1e3) if ms else float("nan")
                tag = "auto" if bn is None else f"({bm},{bn},{bk})"
                print(f"{label:14s} {tag:16s}: {ms:7.3f} ms  {tf:6.1f} TF/s",
                      flush=True)
                if ms and (best is None or ms < best[0]):
                    best = (ms, tag)
            except Exception as e:  # noqa: BLE001
                print(f"{label:14s} ({bm},{bn},{bk}): FAILED {str(e)[:60]}",
                      flush=True)
        if best:
            print(f"{label:14s} BEST {best[1]} {best[0]:.3f} ms", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
