"""Flash-attention forward tile sweep at the FLUX 512px operating point
(B=1, H=24, S=2560, D=128) in both layouts — device-trace timed."""
import jax
import jax.numpy as jnp

from loongx_tpu.ops.flash_attention import flash_attention
from loongx_tpu.ops.rope import rope_embed
from loongx_tpu.utils.device_bench import device_op_times

B, H, S, D = 1, 24, 2560, 128
ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
qs = jnp.swapaxes(q, 1, 2)
ks_ = jnp.swapaxes(k, 1, 2)
vs = jnp.swapaxes(v, 1, 2)
ids = jnp.concatenate(
    [jnp.zeros((512, 3)),
     jnp.stack([jnp.zeros(2048), jnp.arange(2048.0) // 32,
                jnp.arange(2048.0) % 32], 1)]
)
rope = rope_embed(ids)
FLOPS = 4 * B * H * S * S * D / 1e12

for bq, bk in ((1280, 2560), (2560, 2560), (640, 2560), (512, 2560),
               (1280, 1280), (320, 2560)):
    for layout, (qq, kk, vv) in (("bhsd", (q, k, v)), ("bshd", (qs, ks_, vs))):
        try:
            fn = jax.jit(lambda a, b, c: flash_attention(
                a, b, c, cond_start=1536, mode="union", rope=rope,
                block_q=bq, block_k=bk, layout=layout,
            ))
            ops = device_op_times(lambda: fn(qq, kk, vv), n=5, warmup=1)
            ms = sum(t for n_, t in ops.items() if "flash" in n_.lower()) / 5
            print(f"bq={bq:5d} bk={bk:5d} {layout}: {ms:7.3f} ms "
                  f"({FLOPS / (ms / 1e3):6.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d} {layout}: FAILED {str(e)[:90]}")
