"""W8A8 validation on TPU: kernel speed on FLUX shapes + end-to-end latent
agreement vs weight-only int8 on a flux-lite denoise."""
import time
import numpy as np
import jax, jax.numpy as jnp

from loongx_tpu.ops.quant_matmul import quant_matmul, quant_matmul_w8a8
from loongx_tpu.utils.device_bench import device_op_times

key = jax.random.key(0)
SHAPES = [(2560, 3072, 3072), (2560, 3072, 12288), (2560, 15360, 3072)]

for (m, k, n) in SHAPES:
    ks = jax.random.split(jax.random.fold_in(key, m * n), 3)
    x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    wq = jax.lax.bitcast_convert_type(
        jax.random.bits(ks[1], (k, n), jnp.uint8), jnp.int8
    )
    scale = jnp.full((1, n), 1e-4, jnp.float32)
    tf = 2 * m * k * n / 1e12

    def bench(fn, n_it=8):
        ops = device_op_times(fn, n=n_it, warmup=2)
        return sum(ops.values()) / n_it

    t_w8 = bench(lambda: quant_matmul(x, wq, scale))
    try:
        t_a8 = bench(lambda: quant_matmul_w8a8(x, wq, scale))
        print(f"[{m}x{k}x{n}] w-only {t_w8:.3f} ms ({tf/(t_w8/1e3):.0f} TF/s)"
              f" | w8a8 {t_a8:.3f} ms ({tf/(t_a8/1e3):.0f} TF/s)", flush=True)
    except Exception as e:
        print(f"[{m}x{k}x{n}] w8a8 FAILED: {str(e)[:200]}", flush=True)
        break
else:
    # end-to-end agreement on a small full-width model (2+4 blocks, 512px)
    import os
    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params, flux_forward
    from loongx_tpu.ops.quant import quantize_tree
    from loongx_tpu.ops.latents import latent_image_ids
    import functools

    cfg = FluxConfig(num_double_blocks=2, num_single_blocks=4)
    params_bf = init_flux_params(jax.random.key(1), cfg, jnp.bfloat16)
    params_q = quantize_tree(params_bf)
    ks = jax.random.split(jax.random.key(2), 6)
    b, s_txt, size = 1, 512, 512
    s_img = (size // 16) ** 2
    args = dict(
        img=jax.random.normal(ks[0], (b, s_img, cfg.in_channels), jnp.bfloat16),
        txt=jax.random.normal(ks[1], (b, s_txt, cfg.joint_dim), jnp.bfloat16),
        pooled=jax.random.normal(ks[2], (b, cfg.pooled_dim), jnp.bfloat16),
        timestep=jnp.full((b,), 0.5), guidance=jnp.full((b,), 3.5),
        img_ids=latent_image_ids(size // 8, size // 8),
        txt_ids=jnp.zeros((s_txt, 3)),
        cond=jax.random.normal(ks[3], (b, s_img, cfg.in_channels), jnp.bfloat16),
    )
    args["cond_ids"] = args["img_ids"]

    def run(tag):
        @functools.partial(jax.jit, static_argnames=("cfg",))
        def fwd(p, cfg, **kw):
            return flux_forward(p, cfg, **kw)
        out = np.asarray(fwd(params_q, cfg, **args), np.float32)
        return out

    os.environ["LOONGX_W8A8"] = "0"
    out_w = run("w-only")
    os.environ["LOONGX_W8A8"] = "1"
    jax.clear_caches()  # knob is trace-time; force retrace
    out_a = run("w8a8")
    ref = np.asarray(
        jax.jit(lambda p, **kw: flux_forward(p, cfg, **kw),
                static_argnames=())(params_bf, **args), np.float32)
    cos = lambda a, b: float(
        (a.ravel() @ b.ravel())
        / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    )
    print(f"cos(w-only, bf16 ref) = {cos(out_w, ref):.6f}")
    print(f"cos(w8a8,  bf16 ref) = {cos(out_a, ref):.6f}")
    print(f"cos(w8a8,  w-only)   = {cos(out_a, out_w):.6f}")
