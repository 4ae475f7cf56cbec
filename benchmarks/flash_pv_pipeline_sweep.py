"""Software-pipelined softmax+PV sweep (flash forward, single-(S,S)-tile
path) at the FLUX 512px operating point (B=1, H=24, S=2560, D=128, fused
RoPE, bshd layout — exactly what serving runs).

The kernel's dependency chain QK (MXU) -> softmax (VPU) -> PV (MXU)
serialises the units; `pv_chunks > 1` splits the key axis so chunk i's exp
(VPU) is independent of chunk i-1's PV matmul (MXU), letting Mosaic overlap
them (ops/flash_attention._fwd_kernel).  This sweep measures whether the
overlap is real on hardware, for bf16 and int8-QK scores.

Run on a TPU host:  python benchmarks/flash_pv_pipeline_sweep.py
Optional: SWEEP_S=8704 for the 1024px point (multi-tile, full-row kv).
"""
import os

import jax
import jax.numpy as jnp

from loongx_tpu.ops.flash_attention import _flash_fwd, auto_blocks
from loongx_tpu.ops.rope import rope_embed
from loongx_tpu.utils.device_bench import device_op_times

S = int(os.environ.get("SWEEP_S", "2560"))
B, H, D = 1, 24, 128
TXT = 512

ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
n_img = (S - TXT) * 2 // 4  # img:cond = 2:2 like serving (img + equal cond)
side = max(int(n_img ** 0.5), 1)
ids = jnp.concatenate(
    [
        jnp.zeros((TXT, 3)),
        jnp.stack(
            [jnp.zeros(S - TXT), jnp.arange(float(S - TXT)) // side,
             jnp.arange(float(S - TXT)) % side], 1
        ),
    ]
)
cos, sin = rope_embed(ids)
cb = jnp.zeros((1, 1), jnp.float32)
bq, bk = auto_blocks(S)
FL = 4 * B * H * S * S * D / 1e12
print(f"S={S} blocks=({bq},{bk})")

for int8 in (False, True):
    for nc in (1, 2, 4, 8, 16):
        if bk % nc or (bk // nc) % 128:
            continue
        fn = jax.jit(
            lambda qq, kk, vv, nc=nc, int8=int8: _flash_fwd(
                qq, kk, vv, cb, cos, sin, S - (S - TXT) // 2, "union",
                bq, bk, True, False, bshd=True, int8_qk=int8, pv_chunks=nc,
            )
        )
        try:
            ops = device_op_times(lambda: fn(q, k, v), n=10, warmup=2)
            ms = sum(t for n_, t in ops.items() if "flash" in n_.lower()) / 10
            print(f"int8={int(int8)} pv_chunks={nc:2d}: {ms:7.3f} ms "
                  f"({FL / (ms / 1e3):6.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            print(f"int8={int(int8)} pv_chunks={nc:2d}: FAILED {str(e)[:90]}")
