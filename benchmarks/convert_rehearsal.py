"""Real-geometry conversion rehearsal (VERDICT r2 next-round #6).

Synthesizes a diffusers-layout FLUX.1-dev checkpoint ON DISK — REAL keys
and REAL shapes for all four components (12B DiT, T5-XXL, CLIP-L,
AutoencoderKL), random fp16 values — then drives the real production
loading path end to end:

  1. ``cli/convert.py --quantize`` (host-side conversion + int8
     quantization; the bf16 12B tree never touches the chip)
  2. ``LoongXPipeline.from_pretrained(components=("flux", "vae"))``
     (staged per-component orbax restore)
  3. one short denoise scan + decode on the chip.

Until round 3, only tiny geometries had ever crossed utils/convert.py;
this proves the 12B convert+quantize+serve path memory-stages correctly.
~34 GB of disk and ~70 GB of host RAM are used transiently; set
REHEARSAL_DIR to control placement (default /tmp/flux_rehearsal).

Run on the TPU host:  python -m benchmarks.convert_rehearsal
Fast key-layout check (tiny geometry, CI-able):
  REHEARSAL_TINY=1 python -m benchmarks.convert_rehearsal
"""

import json
import os
import shutil
import time

import numpy as np

ROOT = os.environ.get("REHEARSAL_DIR", "/tmp/flux_rehearsal")
TINY = os.environ.get("REHEARSAL_TINY") == "1"

rng = np.random.default_rng(0)


def _writer(dirname, shard_bytes=4 << 30):
    """Accumulate tensors and flush fp16 safetensors shards."""
    os.makedirs(dirname, exist_ok=True)
    buf, size, idx = {}, [0], [0]

    def flush():
        if not buf:
            return
        from safetensors.numpy import save_file

        save_file(dict(buf), os.path.join(
            dirname, f"model-{idx[0]:03d}.safetensors"
        ))
        buf.clear()
        size[0] = 0
        idx[0] += 1

    def add(key, shape, scale=0.02):
        t = (rng.standard_normal(shape, dtype=np.float32) * scale).astype(
            np.float16
        )
        buf[key] = t
        size[0] += t.nbytes
        if size[0] >= shard_bytes:
            flush()

    return add, flush


def flux_key_manifest(nd=19, ns=38, h=3072, mlp=12288, joint=4096,
                      pooled=768, tc=256, in_ch=64, hd=128):
    """The exact (key, shape) manifest of a diffusers-layout
    FluxTransformer2DModel checkpoint at the given geometry (defaults =
    FLUX.1-dev, the published
    ``diffusion_pytorch_model.safetensors.index.json`` weight map).
    ``tests/test_diffusers_anchor.py`` asserts this against an
    independently embedded copy of the published index, so the rehearsal
    can't drift from the real checkpoint layout."""
    out = []
    add = lambda k, shape: out.append((k, shape))
    lin = lambda p, o, i: (add(f"{p}.weight", (o, i)), add(f"{p}.bias", (o,)))
    add("x_embedder.weight", (h, in_ch)); add("x_embedder.bias", (h,))
    lin("context_embedder", h, joint)
    lin("time_text_embed.timestep_embedder.linear_1", h, tc)
    lin("time_text_embed.timestep_embedder.linear_2", h, h)
    lin("time_text_embed.text_embedder.linear_1", h, pooled)
    lin("time_text_embed.text_embedder.linear_2", h, h)
    lin("time_text_embed.guidance_embedder.linear_1", h, tc)
    lin("time_text_embed.guidance_embedder.linear_2", h, h)
    for i in range(nd):
        p = f"transformer_blocks.{i}"
        lin(f"{p}.norm1.linear", 6 * h, h)
        lin(f"{p}.norm1_context.linear", 6 * h, h)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            lin(f"{p}.attn.{n}", h, h)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            add(f"{p}.attn.{n}.weight", (hd,))
        lin(f"{p}.attn.to_out.0", h, h)
        lin(f"{p}.attn.to_add_out", h, h)
        lin(f"{p}.ff.net.0.proj", mlp, h)
        lin(f"{p}.ff.net.2", h, mlp)
        lin(f"{p}.ff_context.net.0.proj", mlp, h)
        lin(f"{p}.ff_context.net.2", h, mlp)
    for i in range(ns):
        p = f"single_transformer_blocks.{i}"
        lin(f"{p}.norm.linear", 3 * h, h)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{p}.attn.{n}", h, h)
        for n in ("norm_q", "norm_k"):
            add(f"{p}.attn.{n}.weight", (hd,))
        lin(f"{p}.proj_mlp", mlp, h)
        lin(f"{p}.proj_out", h, h + mlp)
    lin("norm_out.linear", 2 * h, h)
    lin("proj_out", in_ch, h)
    return out


def synth_flux(dirname, nd, ns, h=3072, mlp=12288, joint=4096, pooled=768,
               tc=256, in_ch=64, hd=128):
    add, flush = _writer(dirname)
    last_block = None
    for key, shape in flux_key_manifest(nd, ns, h, mlp, joint, pooled, tc,
                                        in_ch, hd):
        # per-head RMS norm weights init at 1.0, everything else N(0, 0.02)
        scale = 1.0 if ".attn.norm" in key else 0.02
        add(key, shape, scale)
        # flush per block (the writer also flushes at the shard-size bound):
        # the block id is the first two key segments ("transformer_blocks.3"),
        # so ff/proj_mlp/proj_out tensors stay in their block's shard instead
        # of forcing a flush per tensor
        block = ".".join(key.split(".")[:2]) if (
            "transformer_blocks" in key
        ) else None
        if block != last_block:
            flush()
            last_block = block
    flush()


def synth_t5(dirname, layers, d=4096, inner=4096, ff=10240, vocab=32128,
             heads=64):
    add, flush = _writer(dirname)
    add("shared.weight", (vocab, d))
    add("encoder.block.0.layer.0.SelfAttention"
        ".relative_attention_bias.weight", (32, heads))
    for i in range(layers):
        p = f"encoder.block.{i}"
        add(f"{p}.layer.0.layer_norm.weight", (d,), 1.0)
        for n in ("q", "k", "v"):
            add(f"{p}.layer.0.SelfAttention.{n}.weight", (inner, d))
        add(f"{p}.layer.0.SelfAttention.o.weight", (d, inner))
        add(f"{p}.layer.1.layer_norm.weight", (d,), 1.0)
        add(f"{p}.layer.1.DenseReluDense.wi_0.weight", (ff, d))
        add(f"{p}.layer.1.DenseReluDense.wi_1.weight", (ff, d))
        add(f"{p}.layer.1.DenseReluDense.wo.weight", (d, ff))
        flush()
    add("encoder.final_layer_norm.weight", (d,), 1.0)
    flush()


def synth_clip(dirname, layers=12, h=768, ff=3072, vocab=49408, pos=77):
    add, flush = _writer(dirname)
    lin = lambda p, o, i: (add(f"{p}.weight", (o, i)), add(f"{p}.bias", (o,)))
    norm = lambda p, c: (add(f"{p}.weight", (c,), 1.0), add(f"{p}.bias", (c,)))
    add("text_model.embeddings.token_embedding.weight", (vocab, h))
    add("text_model.embeddings.position_embedding.weight", (pos, h))
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        norm(f"{p}.layer_norm1", h)
        norm(f"{p}.layer_norm2", h)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{p}.self_attn.{n}", h, h)
        lin(f"{p}.mlp.fc1", ff, h)
        lin(f"{p}.mlp.fc2", h, ff)
    norm("text_model.final_layer_norm", h)
    flush()


def synth_vae(dirname, chans=(128, 256, 512, 512), lpb=2, latent=16):
    add, flush = _writer(dirname)
    conv = lambda p, o, i, k=3: (
        add(f"{p}.weight", (o, i, k, k)), add(f"{p}.bias", (o,))
    )
    norm = lambda p, c: (add(f"{p}.weight", (c,), 1.0), add(f"{p}.bias", (c,)))

    def resnet(p, cin, cout):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, 1)

    def attn(p, c):
        norm(f"{p}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            add(f"{p}.{n}.weight", (c, c)); add(f"{p}.{n}.bias", (c,))
        add(f"{p}.to_out.0.weight", (c, c)); add(f"{p}.to_out.0.bias", (c,))

    n = len(chans)
    conv("encoder.conv_in", chans[0], 3)
    cin = chans[0]
    for i, c in enumerate(chans):
        for j in range(lpb):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   cin if j == 0 else c, c)
        cin = c
        if i < n - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
    resnet("encoder.mid_block.resnets.0", chans[-1], chans[-1])
    attn("encoder.mid_block.attentions.0", chans[-1])
    resnet("encoder.mid_block.resnets.1", chans[-1], chans[-1])
    norm("encoder.conv_norm_out", chans[-1])
    conv("encoder.conv_out", 2 * latent, chans[-1])

    conv("decoder.conv_in", chans[-1], latent)
    resnet("decoder.mid_block.resnets.0", chans[-1], chans[-1])
    attn("decoder.mid_block.attentions.0", chans[-1])
    resnet("decoder.mid_block.resnets.1", chans[-1], chans[-1])
    rev = list(reversed(chans))
    cin = chans[-1]
    for i, c in enumerate(rev):
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   cin if j == 0 else c, c)
        cin = c
        if i < n - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
    norm("decoder.conv_norm_out", chans[-1 - (n - 1)])
    conv("decoder.conv_out", 3, chans[0])
    flush()


def main():
    report = {}
    nd, ns = (2, 4) if TINY else (19, 38)
    t5_layers = 2 if TINY else 24
    out = os.path.join(ROOT, "converted")

    t0 = time.time()
    synthed = []
    for name, fn in (
        ("flux", lambda d: synth_flux(d, nd, ns)),
        ("t5", lambda d: synth_t5(d, t5_layers)),
        ("clip", synth_clip),
        ("vae", synth_vae),
    ):
        d = os.path.join(ROOT, name)
        marker = os.path.join(d, ".complete")
        if os.path.exists(marker):
            continue
        # a dir without the marker is a partial synth from an interrupted run
        shutil.rmtree(d, ignore_errors=True)
        print(f"[rehearsal] synthesizing diffusers-layout {name} ...",
              flush=True)
        fn(d)
        open(marker, "w").close()
        synthed.append(name)
    if synthed:
        report["synth_s"] = round(time.time() - t0, 1)
        print(f"[rehearsal] synthesized {synthed} in {report['synth_s']}s",
              flush=True)

    from loongx_tpu.cli import convert as convert_cli

    if TINY:
        # patch geometry so the tiny layout matches the converter loops
        import loongx_tpu.models.flux.model as fm
        import loongx_tpu.models.text.t5 as t5m

        orig_dev = fm.FluxConfig.flux_dev
        fm.FluxConfig.flux_dev = staticmethod(
            lambda: orig_dev().__class__(
                num_double_blocks=nd, num_single_blocks=ns
            )
        )
        orig_xxl = t5m.T5Config.xxl
        t5m.T5Config.xxl = staticmethod(
            lambda: orig_xxl().__class__(num_layers=t5_layers)
        )

    t0 = time.time()
    shutil.rmtree(out, ignore_errors=True)
    convert_cli.main([
        "--flux", os.path.join(ROOT, "flux"),
        "--t5", os.path.join(ROOT, "t5"),
        "--clip", os.path.join(ROOT, "clip"),
        "--vae", os.path.join(ROOT, "vae"),
        "--out", out,
        "--quantize",
        # REHEARSAL_SERVING=1 additionally bakes the single-chip serving
        # transforms (fused qkv + proj_out K-split) at convert time — the
        # production recipe: without it, infer --int8 reshuffles the 12B
        # tree through the device tunnel on every serve start (~19 min
        # measured; PARITY.md "Deployed-CLI wall-clock truth")
        *(["--serving"] if os.environ.get("REHEARSAL_SERVING") == "1"
          else []),
    ])
    report["convert_s"] = round(time.time() - t0, 1)
    print(f"[rehearsal] converted+quantized in {report['convert_s']}s",
          flush=True)

    if os.environ.get("REHEARSAL_CONVERT_ONLY") == "1":
        # host-side stages only (synth + convert + quantize); lets the
        # checkpoint be produced while the chip is busy with another run
        print(json.dumps(report))
        return

    # staged serve: DiT + VAE only (text encoders stay on disk — the
    # deployed recipe encodes prompts first, frees, then loads the DiT)
    import jax
    import jax.numpy as jnp

    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.schedule import flux_sigmas
    from loongx_tpu.sampling.generate import denoise_scan

    os.environ.setdefault("LOONGX_W8A8", "1")
    t0 = time.time()
    pipe = LoongXPipeline.from_pretrained(out, components=("flux", "vae"))
    assert "t5" not in pipe.params and "flux" in pipe.params
    # quantized at convert time: kernel_q leaves restored directly
    assert any(
        "kernel_q" in str(path)
        for path, _ in jax.tree_util.tree_leaves_with_path(
            pipe.params["flux"]
        )
    )
    report["load_s"] = round(time.time() - t0, 1)
    report["flux_gb"] = round(sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(pipe.params["flux"])
    ) / 2**30, 2)
    print(f"[rehearsal] staged load (flux+vae) in {report['load_s']}s, "
          f"flux tree {report['flux_gb']} GiB", flush=True)

    cfg = pipe.flux_cfg
    size = 256 if TINY else 512
    s_img = (size // 16) ** 2
    ks = jax.random.split(jax.random.key(0), 4)
    lat = jax.random.normal(ks[0], (1, s_img, cfg.in_channels), jnp.bfloat16)
    txt = jax.random.normal(ks[1], (1, 512, cfg.joint_dim), jnp.bfloat16)
    pooled = jax.random.normal(ks[2], (1, cfg.pooled_dim), jnp.bfloat16)
    cond = jax.random.normal(ks[3], (1, s_img, cfg.in_channels), jnp.bfloat16)
    ids = latent_image_ids(size // 8, size // 8)
    t0 = time.time()
    out_lat = denoise_scan(
        pipe.params["flux"], cfg, (), lat, txt, pooled, ids,
        jnp.zeros((512, 3)), cond, ids,
        jnp.asarray(flux_sigmas(2, s_img)), jnp.full((1,), 3.5), None,
    )
    ok = bool(jnp.all(jnp.isfinite(out_lat.astype(jnp.float32))))
    report["denoise2_s"] = round(time.time() - t0, 1)
    report["finite"] = ok
    stats = jax.local_devices()[0].memory_stats() or {}
    if "peak_bytes_in_use" in stats:
        report["peak_hbm_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    assert ok
    print(json.dumps(report))


if __name__ == "__main__":
    main()
