"""Long-S flash forward tile sweep, int8-QK serving mode — justifies the
full-row-kv auto_blocks policy.

Valid tiles must divide S (the kernel raises otherwise — a non-dividing
block_q used to silently truncate the q grid, making its timing look
fast).  Measured at S=8704, the 1024 px point (v5e, rel-band ±2%):

  (512, 4352) online-softmax (old policy): 138.0 TF/s
  (512, 8704) FULL-ROW kv    (new policy): 144.9 TF/s   <- auto_blocks
  (256, 8704):                             139.3 TF/s
  (2176, 8704):                            127.2 TF/s
  (4352, 4352):                            120.5 TF/s

``SWEEP_S`` picks the operating point: 8704 (1024 px, default) or 5120
(768 px: 512 txt + 2304 img + 2304 cond) — the 5120 case checks whether
the s % MAX_BLOCK_K == 0 early-exit in auto_blocks (square 2560 tiles)
should instead prefer full-row kv there too.

Run:  python -m benchmarks.flash_long_s_sweep
      SWEEP_S=5120 python -m benchmarks.flash_long_s_sweep
"""
import os

os.environ.setdefault("LOONGX_INT8_ATTN", "1")
import jax
import jax.numpy as jnp

from loongx_tpu.ops.flash_attention import auto_blocks, flash_attention
from loongx_tpu.ops.rope import rope_embed
from loongx_tpu.utils.device_bench import device_op_times

S = int(os.environ.get("SWEEP_S", "8704"))
B, H, D = 1, 24, 128
n_img = (S - 512) // 2          # [txt=512 | img | cond] unified stream
side = int(round(n_img ** 0.5))
TILES = {
    8704: ((512, 4352), (512, 8704), (256, 8704), (2176, 8704),
           (4352, 4352)),
    5120: ((2560, 2560), (1280, 2560), (512, 5120), (1024, 5120),
           (2560, 5120)),
}[S]

ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
img_ids = jnp.stack(
    [jnp.zeros(n_img), jnp.arange(float(n_img)) // side,
     jnp.arange(float(n_img)) % side], 1
)
ids = jnp.concatenate([jnp.zeros((512, 3)), img_ids, img_ids])
rope = rope_embed(ids)
FLOPS = 4 * B * H * S * S * D / 1e12

print(f"auto_blocks({S}) ->", auto_blocks(S))
for bq, bk in TILES:
    try:
        fn = jax.jit(lambda a, b, c, bq=bq, bk=bk: flash_attention(
            a, b, c, cond_start=512 + n_img, mode="union", rope=rope,
            block_q=bq, block_k=bk, layout="bshd",
        ))
        ops = device_op_times(lambda: fn(q, k, v), n=3, warmup=1)
        ms = sum(t for n_, t in ops.items() if "flash" in n_.lower()) / 3
        print(f"bq={bq:5d} bk={bk:5d}: {ms:8.3f} ms "
              f"({FLOPS / (ms / 1e3):6.1f} TF/s)")
    except Exception as e:  # noqa: BLE001
        print(f"bq={bq:5d} bk={bk:5d}: FAILED {str(e)[:100]}")
