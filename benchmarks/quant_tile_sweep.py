"""Tile sweep for the int8-weight Pallas matmul on representative FLUX
shapes, vs the XLA bf16 dot baseline."""
import itertools, time
import jax, jax.numpy as jnp
from loongx_tpu.ops.quant_matmul import quant_matmul
from loongx_tpu.utils.device_bench import device_op_times

key = jax.random.key(0)
# (M, K, N) hot shapes at 512px: latent qkv, ff-in, single proj_out
SHAPES = [(2560, 3072, 3072), (2560, 3072, 12288), (2560, 15360, 3072)]


def bench(fn, n=8):
    ops = device_op_times(fn, n=n, warmup=2)
    return sum(ops.values()) / n


for (m, k, n) in SHAPES:
    ks = jax.random.split(jax.random.fold_in(key, m * n), 3)
    x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    wq = jax.lax.bitcast_convert_type(
        jax.random.bits(ks[1], (k, n), jnp.uint8), jnp.int8
    )
    scale = jnp.full((1, n), 1e-4, jnp.float32)
    w_bf = (wq.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    xla_dot = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    t_xla = bench(lambda: xla_dot(x, w_bf))
    tf = 2 * m * k * n / 1e12
    print(f"[{m}x{k}x{n}] xla-bf16: {t_xla:.3f} ms = {tf/(t_xla/1e3):.0f} TF/s")

    best = None
    for bm, bn, bk in itertools.product((256, 512), (512, 1024), (512, 1024, 1536)):
        if bm * bk + bk * bn * 3 + bm * bn * 6 > 110 * 2**20:  # rough VMEM guard
            continue
        try:
            f = lambda: quant_matmul(x, wq, scale, block_m=bm, block_n=bn, block_k=bk)
            jax.device_get(jnp.ravel(f())[0])
            t = bench(f)
            mark = ""
            if best is None or t < best[0]:
                best = (t, bm, bn, bk); mark = " <-- best"
            print(f"    qmm {bm=} {bn=} {bk=}: {t:.3f} ms = {tf/(t/1e3):.0f} TF/s{mark}", flush=True)
        except Exception as e:
            print(f"    qmm {bm=} {bn=} {bk=}: FAIL {str(e)[:80]}", flush=True)
    t, bm, bn, bk = best
    print(f"  BEST {bm}/{bn}/{bk}: {t:.3f} ms ({tf/(t/1e3):.0f} TF/s) vs xla {t_xla:.3f} ms")
