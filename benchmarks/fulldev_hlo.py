"""Dump the compiled-HLO ops of one full-dev W8A8 flux_forward and print
the fusions matching the hot names from benchmarks/fulldev_trace.py, so
trace entries can be attributed to source ops."""
import functools
import os
import re
import sys

os.environ.setdefault("LOONGX_W8A8", "1")
os.environ.setdefault("LOONGX_INT8_ATTN", "1")

import jax
import jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params, flux_forward
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.ops.quant import (
    fuse_qkv_projections, random_quantized_like, split_single_proj_out,
)

cfg = FluxConfig.flux_dev()
key = jax.random.key(0)
ks = jax.random.split(key, 8)
params = random_quantized_like(
    ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
)
# Same serving prep as fulldev_trace.py / bench.py so HLO op names line
# up with the trace entries being attributed.
params = fuse_qkv_projections(params, consume=True)
params = split_single_proj_out(params, cfg.hidden, consume=True)

S_TXT = 512
size = int(os.environ.get("BENCH_SIZE", "512"))
s_img = (size // 16) * (size // 16)
ids = latent_image_ids(size // 8, size // 8)
txt_ids = jnp.zeros((S_TXT, 3))
b = 1
lat = jax.random.normal(ks[2], (b, s_img, cfg.in_channels), jnp.bfloat16)
txt = jax.random.normal(ks[3], (b, S_TXT, cfg.joint_dim), jnp.bfloat16)
pooled = jax.random.normal(ks[4], (b, cfg.pooled_dim), jnp.bfloat16)
cond = jax.random.normal(ks[5], (b, s_img, cfg.in_channels), jnp.bfloat16)
t05, g35 = jnp.full((b,), 0.5), jnp.full((b,), 3.5)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fwd(params, cfg, lat, txt, pooled, t, g, ids, txt_ids, cond):
    return flux_forward(
        params, cfg, img=lat, txt=txt, pooled=pooled, timestep=t,
        guidance=g, img_ids=ids, txt_ids=txt_ids, cond=cond, cond_ids=ids,
    )


lowered = fwd.lower(params, cfg, lat, txt, pooled, t05, g35, ids, txt_ids, cond)
compiled = lowered.compile()
text = compiled.as_text()
out_path = os.environ.get("HLO_OUT", "/tmp/fulldev_hlo.txt")
with open(out_path, "w") as fh:
    fh.write(text)
print(f"wrote {len(text)} chars to {out_path}")
pats = [p for p in sys.argv[1:]] or [
    "maximum_bitcast_fusion", "dynamic-slice_bitcast_fusion", "fusion.267",
]
for pat in pats:
    print(f"==== {pat} ====")
    # print the whole fusion computation bodies whose name matches
    for m in re.finditer(
        rf"^.*{re.escape(pat)}[^\w].*$", text, flags=re.M
    ):
        print(m.group(0)[:400])
    print()
