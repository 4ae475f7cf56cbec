"""Long-S (1024 px point, S=8704) flash forward tile sweep, int8-QK serving
mode — justifies the full-row-kv auto_blocks policy.

Valid tiles must divide S (the kernel raises otherwise — a non-dividing
block_q used to silently truncate the q grid, making its timing look
fast).  Measured (v5e, rel-band ±2%):

  (512, 4352) online-softmax (old policy): 138.0 TF/s
  (512, 8704) FULL-ROW kv    (new policy): 144.9 TF/s   <- auto_blocks
  (256, 8704):                             139.3 TF/s
  (2176, 8704):                            127.2 TF/s
  (4352, 4352):                            120.5 TF/s

Run:  python -m benchmarks.flash_long_s_sweep
"""
import os

os.environ.setdefault("LOONGX_INT8_ATTN", "1")
import jax
import jax.numpy as jnp

from loongx_tpu.ops.flash_attention import auto_blocks, flash_attention
from loongx_tpu.ops.rope import rope_embed
from loongx_tpu.utils.device_bench import device_op_times

B, H, S, D = 1, 24, 8704, 128  # 512 txt + 4096 img + 4096 cond
ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
ids = jnp.concatenate(
    [jnp.zeros((512, 3)),
     jnp.stack([jnp.zeros(4096), jnp.arange(4096.0) // 64,
                jnp.arange(4096.0) % 64], 1),
     jnp.stack([jnp.zeros(4096), jnp.arange(4096.0) // 64,
                jnp.arange(4096.0) % 64], 1)]
)
rope = rope_embed(ids)
FLOPS = 4 * B * H * S * S * D / 1e12

print("auto_blocks(8704) ->", auto_blocks(S))
for bq, bk in ((512, 4352), (512, 8704), (256, 8704), (2176, 8704),
               (4352, 4352)):
    try:
        fn = jax.jit(lambda a, b, c, bq=bq, bk=bk: flash_attention(
            a, b, c, cond_start=4608, mode="union", rope=rope,
            block_q=bq, block_k=bk, layout="bshd",
        ))
        ops = device_op_times(lambda: fn(q, k, v), n=3, warmup=1)
        ms = sum(t for n_, t in ops.items() if "flash" in n_.lower()) / 3
        print(f"bq={bq:5d} bk={bk:5d}: {ms:8.3f} ms "
              f"({FLOPS / (ms / 1e3):6.1f} TF/s)")
    except Exception as e:  # noqa: BLE001
        print(f"bq={bq:5d} bk={bk:5d}: FAILED {str(e)[:100]}")
