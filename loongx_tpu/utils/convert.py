"""Checkpoint conversion: HF/diffusers safetensors -> loongx_tpu pytrees.

The reference consumes FLUX.1 weights through diffusers/transformers
(reference model.py:398-399); our models are plain pytrees, so this module
maps the published safetensors key layout onto them (SURVEY §7 hard-part 4).
Torch linears are [out, in] -> transposed to [in, out]; convs [O, I, kh, kw]
-> HWIO; per-block tensors are stacked onto a leading scan axis.

All functions take a flat {key: np.ndarray} state dict, so they work with
any loader (safetensors, torch.load, npz) and are unit-testable with
synthetic state dicts.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

import jax.numpy as jnp


def load_safetensors_dir(path: str, pattern: str = "") -> Dict[str, np.ndarray]:
    """Read all *.safetensors files under ``path`` into one flat dict."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path)
        if f.endswith(".safetensors") and pattern in f
    )
    if not files:
        raise FileNotFoundError(f"no safetensors files in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return state


def _lin(state, prefix, dtype, bias=True):
    p = {"kernel": jnp.asarray(state[f"{prefix}.weight"].T, dtype)}
    if bias and f"{prefix}.bias" in state:
        p["bias"] = jnp.asarray(state[f"{prefix}.bias"], dtype)
    return p


def _stack(trees):
    import jax

    if not trees:  # zero-depth family (e.g. a single-block test model)
        return {}
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


# ---------------------------------------------------------------------------
# FLUX transformer
# ---------------------------------------------------------------------------


def convert_flux_state(state: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16):
    """diffusers FluxTransformer2DModel state dict -> flux param tree."""
    L = _lin

    def double_block(i):
        p = f"transformer_blocks.{i}"
        return {
            "norm1": {"linear": L(state, f"{p}.norm1.linear", dtype)},
            "norm1_context": {"linear": L(state, f"{p}.norm1_context.linear", dtype)},
            "attn": {
                "to_q": L(state, f"{p}.attn.to_q", dtype),
                "to_k": L(state, f"{p}.attn.to_k", dtype),
                "to_v": L(state, f"{p}.attn.to_v", dtype),
                "norm_q": {"weight": jnp.asarray(state[f"{p}.attn.norm_q.weight"], dtype)},
                "norm_k": {"weight": jnp.asarray(state[f"{p}.attn.norm_k.weight"], dtype)},
                "add_q_proj": L(state, f"{p}.attn.add_q_proj", dtype),
                "add_k_proj": L(state, f"{p}.attn.add_k_proj", dtype),
                "add_v_proj": L(state, f"{p}.attn.add_v_proj", dtype),
                "norm_added_q": {"weight": jnp.asarray(state[f"{p}.attn.norm_added_q.weight"], dtype)},
                "norm_added_k": {"weight": jnp.asarray(state[f"{p}.attn.norm_added_k.weight"], dtype)},
                "to_out": L(state, f"{p}.attn.to_out.0", dtype),
                "to_add_out": L(state, f"{p}.attn.to_add_out", dtype),
            },
            "ff": {
                "in": L(state, f"{p}.ff.net.0.proj", dtype),
                "out": L(state, f"{p}.ff.net.2", dtype),
            },
            "ff_context": {
                "in": L(state, f"{p}.ff_context.net.0.proj", dtype),
                "out": L(state, f"{p}.ff_context.net.2", dtype),
            },
        }

    def single_block(i):
        p = f"single_transformer_blocks.{i}"
        return {
            "norm": {"linear": L(state, f"{p}.norm.linear", dtype)},
            "attn": {
                "to_q": L(state, f"{p}.attn.to_q", dtype),
                "to_k": L(state, f"{p}.attn.to_k", dtype),
                "to_v": L(state, f"{p}.attn.to_v", dtype),
                "norm_q": {"weight": jnp.asarray(state[f"{p}.attn.norm_q.weight"], dtype)},
                "norm_k": {"weight": jnp.asarray(state[f"{p}.attn.norm_k.weight"], dtype)},
            },
            "proj_mlp": L(state, f"{p}.proj_mlp", dtype),
            "proj_out": L(state, f"{p}.proj_out", dtype),
        }

    params = {
        "x_embedder": L(state, "x_embedder", dtype),
        "context_embedder": L(state, "context_embedder", dtype),
        "time_in": {
            "in_layer": L(state, "time_text_embed.timestep_embedder.linear_1", dtype),
            "out_layer": L(state, "time_text_embed.timestep_embedder.linear_2", dtype),
        },
        "vector_in": {
            "in_layer": L(state, "time_text_embed.text_embedder.linear_1", dtype),
            "out_layer": L(state, "time_text_embed.text_embedder.linear_2", dtype),
        },
        "double_blocks": _stack(
            [double_block(i) for i in range(cfg.num_double_blocks)]
        ),
        "single_blocks": _stack(
            [single_block(i) for i in range(cfg.num_single_blocks)]
        ),
        "norm_out": {"linear": L(state, "norm_out.linear", dtype)},
        "proj_out": L(state, "proj_out", dtype),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = {
            "in_layer": L(state, "time_text_embed.guidance_embedder.linear_1", dtype),
            "out_layer": L(state, "time_text_embed.guidance_embedder.linear_2", dtype),
        }
    return params


# ---------------------------------------------------------------------------
# Reference LoRA checkpoints (peft / FluxPipeline.save_lora_weights layout)
# ---------------------------------------------------------------------------

def _our_lora_path(module: str):
    """'transformer_blocks.3.attn.to_q' -> ('double_blocks/attn/to_q', 3)."""
    module = module.removeprefix("transformer.")
    if module == "x_embedder":
        return "x_embedder", None
    for hf_prefix, ours in (
        ("single_transformer_blocks", "single_blocks"),
        ("transformer_blocks", "double_blocks"),
    ):
        if module.startswith(hf_prefix + "."):
            rest = module[len(hf_prefix) + 1 :]
            idx_str, sub = rest.split(".", 1)
            sub = {
                "attn.to_q": "attn/to_q",
                "attn.to_k": "attn/to_k",
                "attn.to_v": "attn/to_v",
                "attn.to_out.0": "attn/to_out",
                "norm1.linear": "norm1/linear",
                "norm.linear": "norm/linear",
                "ff.net.2": "ff/out",
                "proj_mlp": "proj_mlp",
                "proj_out": "proj_out",
            }.get(sub)
            if sub is None:
                return None, None
            return f"{ours}/{sub}", int(idx_str)
    return None, None


def convert_reference_lora(
    state: Dict[str, np.ndarray],
    flux_params,
    cfg,
    scale: float = 1.0,
    dtype=jnp.bfloat16,
):
    """Load a reference-trained LoRA (peft safetensors via
    FluxPipeline.save_lora_weights, reference model.py:526-531) into our flux
    param tree: per-block lora_A [r, in] / lora_B [out, r] tensors are
    transposed and stacked onto the scan axis.  Missing blocks get zero
    factors (delta 0).  Returns a new tree with lora leaves set."""
    import re as _re

    # collect (tree_path, idx) -> (a, b).  Key layouts accepted:
    # 'transformer.<module>.lora_A.weight' (FluxPipeline.save_lora_weights),
    # raw peft 'base_model.model.<module>.lora_A.weight', and adapter-named
    # 'lora_A.<adapter>.weight' forms.
    grouped: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    lora_like = 0
    for key, val in state.items():
        m = _re.match(r"(.*)\.lora_([AB])(?:\.[^.]+)?\.weight$", key)
        if not m:
            continue
        lora_like += 1
        module = m.group(1).removeprefix("base_model.model.")
        path, idx = _our_lora_path(module)
        if path is None:
            continue
        grouped.setdefault(path, {}).setdefault(
            -1 if idx is None else idx, {}
        )[m.group(2)] = val
    if lora_like and not grouped:
        sample = [k for k in state if ".lora_" in k][:3]
        raise ValueError(
            f"checkpoint contains {lora_like} LoRA tensors but none map onto "
            f"a known flux module layout (sample keys: {sample}) — returning "
            "the base weights silently would serve an un-adapted model"
        )

    import jax as _jax

    from loongx_tpu.train.lora import load_lora_state_dict

    params = _jax.tree.map(lambda x: x, flux_params)  # rebuild containers

    def find(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return node

    # Assemble stacked factors per path and delegate the rest (the serving
    # proj_out K-split routing, kernel-dim validation, scale defaulting) to
    # train.lora.load_lora_state_dict — ONE implementation of that logic.
    flat: Dict[str, Any] = {}
    for path, by_idx in grouped.items():
        sample = next(iter(by_idx.values()))
        r = sample["A"].shape[0]
        a_rows = sample["A"].shape[1]
        b_cols = sample["B"].shape[0]
        kernel = find(params, path)
        kernel = kernel.get("kernel", kernel.get("kernel_q"))
        if kernel.ndim == 3:  # scan-stacked block family
            n_blocks = kernel.shape[0]
            a = np.zeros((n_blocks, a_rows, r), np.float32)
            b = np.zeros((n_blocks, r, b_cols), np.float32)
            for idx, ab in by_idx.items():
                a[idx] = ab["A"].T
                b[idx] = ab["B"].T
            flat[f"{path}/lora_scale"] = jnp.full(
                (n_blocks,), scale, jnp.float32
            )
        else:
            ab = by_idx.get(-1) or next(iter(by_idx.values()))
            a, b = ab["A"].T, ab["B"].T
            flat[f"{path}/lora_scale"] = jnp.asarray(scale, jnp.float32)
        flat[f"{path}/lora_a"] = jnp.asarray(a, dtype)
        flat[f"{path}/lora_b"] = jnp.asarray(b, dtype)
    return load_lora_state_dict(params, flat, strict_shapes=False)


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL)
# ---------------------------------------------------------------------------


def _conv(state, prefix, dtype):
    w = state[f"{prefix}.weight"]
    if w.ndim == 2:  # attention projections stored as Linear in new diffusers
        w = w[:, :, None, None]
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
        "bias": jnp.asarray(state[f"{prefix}.bias"], dtype),
    }


def _gn(state, prefix, dtype):
    return {
        "weight": jnp.asarray(state[f"{prefix}.weight"], dtype),
        "bias": jnp.asarray(state[f"{prefix}.bias"], dtype),
    }


def _resnet(state, prefix, dtype):
    p = {
        "norm1": _gn(state, f"{prefix}.norm1", dtype),
        "conv1": _conv(state, f"{prefix}.conv1", dtype),
        "norm2": _gn(state, f"{prefix}.norm2", dtype),
        "conv2": _conv(state, f"{prefix}.conv2", dtype),
    }
    if f"{prefix}.conv_shortcut.weight" in state:
        p["shortcut"] = _conv(state, f"{prefix}.conv_shortcut", dtype)
    return p


def _vae_attn(state, prefix, dtype):
    return {
        "norm": _gn(state, f"{prefix}.group_norm", dtype),
        "to_q": _conv(state, f"{prefix}.to_q", dtype),
        "to_k": _conv(state, f"{prefix}.to_k", dtype),
        "to_v": _conv(state, f"{prefix}.to_v", dtype),
        "to_out": _conv(state, f"{prefix}.to_out.0", dtype),
    }


def convert_vae_state(state: Dict[str, np.ndarray], cfg, dtype=jnp.float32):
    """diffusers AutoencoderKL state dict -> vae param tree."""
    n = len(cfg.block_channels)
    enc: Dict[str, Any] = {"conv_in": _conv(state, "encoder.conv_in", dtype)}
    for i in range(n):
        block = {}
        for j in range(cfg.layers_per_block):
            block[f"resnet_{j}"] = _resnet(
                state, f"encoder.down_blocks.{i}.resnets.{j}", dtype
            )
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in state:
            block["downsample"] = _conv(
                state, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype
            )
        enc[f"down_{i}"] = block
    enc["mid"] = {
        "resnet_0": _resnet(state, "encoder.mid_block.resnets.0", dtype),
        "attn": _vae_attn(state, "encoder.mid_block.attentions.0", dtype),
        "resnet_1": _resnet(state, "encoder.mid_block.resnets.1", dtype),
    }
    enc["norm_out"] = _gn(state, "encoder.conv_norm_out", dtype)
    enc["conv_out"] = _conv(state, "encoder.conv_out", dtype)

    dec: Dict[str, Any] = {"conv_in": _conv(state, "decoder.conv_in", dtype)}
    dec["mid"] = {
        "resnet_0": _resnet(state, "decoder.mid_block.resnets.0", dtype),
        "attn": _vae_attn(state, "decoder.mid_block.attentions.0", dtype),
        "resnet_1": _resnet(state, "decoder.mid_block.resnets.1", dtype),
    }
    for i in range(n):
        block = {}
        for j in range(cfg.layers_per_block + 1):
            block[f"resnet_{j}"] = _resnet(
                state, f"decoder.up_blocks.{i}.resnets.{j}", dtype
            )
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in state:
            block["upsample"] = _conv(
                state, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype
            )
        dec[f"up_{i}"] = block
    dec["norm_out"] = _gn(state, "decoder.conv_norm_out", dtype)
    dec["conv_out"] = _conv(state, "decoder.conv_out", dtype)
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# DINO / generic ViT (HF ViTModel layout, e.g. facebook/dino-vits16)
# ---------------------------------------------------------------------------


def convert_vit_state(state: Dict[str, np.ndarray], cfg, dtype=jnp.float32):
    """HF ViTModel state dict -> models/vision param tree (the DINO-I
    feature extractor the reference pulls from torch.hub, test.py:46-82)."""
    def block(i):
        p = f"encoder.layer.{i}"
        return {
            "ln1": _gn(state, f"{p}.layernorm_before", dtype),
            "q": _lin(state, f"{p}.attention.attention.query", dtype),
            "k": _lin(state, f"{p}.attention.attention.key", dtype),
            "v": _lin(state, f"{p}.attention.attention.value", dtype),
            "o": _lin(state, f"{p}.attention.output.dense", dtype),
            "ln2": _gn(state, f"{p}.layernorm_after", dtype),
            "fc1": _lin(state, f"{p}.intermediate.dense", dtype),
            "fc2": _lin(state, f"{p}.output.dense", dtype),
        }

    state = {k.removeprefix("vit."): v for k, v in state.items()}
    patch_w = state["embeddings.patch_embeddings.projection.weight"]
    hidden = patch_w.shape[0]
    kernel = np.transpose(patch_w, (2, 3, 1, 0)).reshape(-1, hidden)
    return {
        "patch_embed": {
            "kernel": jnp.asarray(kernel, dtype),
            "bias": jnp.asarray(
                state["embeddings.patch_embeddings.projection.bias"], dtype
            ),
        },
        "cls_token": jnp.asarray(
            state["embeddings.cls_token"].reshape(-1), dtype
        ),
        "pos_embed": jnp.asarray(
            state["embeddings.position_embeddings"].reshape(
                -1, hidden
            ), dtype
        ),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "final_ln": _gn(state, "layernorm", dtype),
    }


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------


def convert_t5_state(state: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16):
    def block(i):
        p = f"encoder.block.{i}"
        return {
            "ln_attn": {
                "weight": jnp.asarray(state[f"{p}.layer.0.layer_norm.weight"], dtype)
            },
            "q": _lin(state, f"{p}.layer.0.SelfAttention.q", dtype, bias=False),
            "k": _lin(state, f"{p}.layer.0.SelfAttention.k", dtype, bias=False),
            "v": _lin(state, f"{p}.layer.0.SelfAttention.v", dtype, bias=False),
            "o": _lin(state, f"{p}.layer.0.SelfAttention.o", dtype, bias=False),
            "ln_ff": {
                "weight": jnp.asarray(state[f"{p}.layer.1.layer_norm.weight"], dtype)
            },
            "wi_0": _lin(state, f"{p}.layer.1.DenseReluDense.wi_0", dtype, bias=False),
            "wi_1": _lin(state, f"{p}.layer.1.DenseReluDense.wi_1", dtype, bias=False),
            "wo": _lin(state, f"{p}.layer.1.DenseReluDense.wo", dtype, bias=False),
        }

    return {
        "embed": jnp.asarray(state["shared.weight"], dtype),
        "rel_pos_bias": jnp.asarray(
            state["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
            dtype,
        ),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "final_ln": {
            "weight": jnp.asarray(state["encoder.final_layer_norm.weight"], dtype)
        },
    }


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


def convert_clip_vision_state(
    state: Dict[str, np.ndarray], cfg, dtype=jnp.float32
):
    """HF CLIPVisionModel(+visual_projection) -> clip_vision param tree.

    The patch conv [out, 3, p, p] becomes a flattened-patch linear with
    (y, x, c)-major input ordering (see models/text/clip_vision._patches)."""
    def block(i):
        p = f"vision_model.encoder.layers.{i}"
        return {
            "ln1": _gn(state, f"{p}.layer_norm1", dtype),
            "q": _lin(state, f"{p}.self_attn.q_proj", dtype),
            "k": _lin(state, f"{p}.self_attn.k_proj", dtype),
            "v": _lin(state, f"{p}.self_attn.v_proj", dtype),
            "o": _lin(state, f"{p}.self_attn.out_proj", dtype),
            "ln2": _gn(state, f"{p}.layer_norm2", dtype),
            "fc1": _lin(state, f"{p}.mlp.fc1", dtype),
            "fc2": _lin(state, f"{p}.mlp.fc2", dtype),
        }

    patch_w = state["vision_model.embeddings.patch_embedding.weight"]
    hidden = patch_w.shape[0]
    kernel = np.transpose(patch_w, (2, 3, 1, 0)).reshape(-1, hidden)
    return {
        "patch_embed": {"kernel": jnp.asarray(kernel, dtype)},
        "class_embed": jnp.asarray(
            state["vision_model.embeddings.class_embedding"].reshape(-1), dtype
        ),
        "pos_embed": jnp.asarray(
            state["vision_model.embeddings.position_embedding.weight"], dtype
        ),
        "pre_ln": _gn(state, "vision_model.pre_layrnorm", dtype),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "post_ln": _gn(state, "vision_model.post_layernorm", dtype),
        "projection": _lin(state, "visual_projection", dtype, bias=False),
    }


def convert_clip_state(state: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16):
    def block(i):
        p = f"text_model.encoder.layers.{i}"
        return {
            "ln1": _gn(state, f"{p}.layer_norm1", dtype),
            "q": _lin(state, f"{p}.self_attn.q_proj", dtype),
            "k": _lin(state, f"{p}.self_attn.k_proj", dtype),
            "v": _lin(state, f"{p}.self_attn.v_proj", dtype),
            "o": _lin(state, f"{p}.self_attn.out_proj", dtype),
            "ln2": _gn(state, f"{p}.layer_norm2", dtype),
            "fc1": _lin(state, f"{p}.mlp.fc1", dtype),
            "fc2": _lin(state, f"{p}.mlp.fc2", dtype),
        }

    return {
        "token_embed": jnp.asarray(
            state["text_model.embeddings.token_embedding.weight"], dtype
        ),
        "pos_embed": jnp.asarray(
            state["text_model.embeddings.position_embedding.weight"], dtype
        ),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "final_ln": _gn(state, "text_model.final_layer_norm", dtype),
    }


# ---------------------------------------------------------------------------
# Whisper + Marian (speech-instruction path, reference inference-demo.py)
# ---------------------------------------------------------------------------


def _strip_model_prefix(state):
    """WhisperForConditionalGeneration/MarianMTModel checkpoints prefix the
    backbone with "model."; bare WhisperModel/MarianModel ones don't."""
    if any(k.startswith("model.") for k in state):
        return {
            k[len("model."):]: v for k, v in state.items()
            if k.startswith("model.")
        }, state
    return state, state


def convert_whisper_state(state, cfg, dtype=jnp.bfloat16):
    state, _ = _strip_model_prefix(state)

    def attn(p):
        return {
            "q": _lin(state, f"{p}.q_proj", dtype),
            "k": _lin(state, f"{p}.k_proj", dtype, bias=False),
            "v": _lin(state, f"{p}.v_proj", dtype),
            "o": _lin(state, f"{p}.out_proj", dtype),
        }

    def enc_block(i):
        p = f"encoder.layers.{i}"
        return {
            "ln_attn": _gn(state, f"{p}.self_attn_layer_norm", dtype),
            "attn": attn(f"{p}.self_attn"),
            "ln_ff": _gn(state, f"{p}.final_layer_norm", dtype),
            "fc1": _lin(state, f"{p}.fc1", dtype),
            "fc2": _lin(state, f"{p}.fc2", dtype),
        }

    def dec_block(i):
        p = f"decoder.layers.{i}"
        return {
            "ln_self": _gn(state, f"{p}.self_attn_layer_norm", dtype),
            "self_attn": attn(f"{p}.self_attn"),
            "ln_cross": _gn(state, f"{p}.encoder_attn_layer_norm", dtype),
            "cross_attn": attn(f"{p}.encoder_attn"),
            "ln_ff": _gn(state, f"{p}.final_layer_norm", dtype),
            "fc1": _lin(state, f"{p}.fc1", dtype),
            "fc2": _lin(state, f"{p}.fc2", dtype),
        }

    def conv(p):
        # torch Conv1d [out, in, width] -> HIO [width, in, out]
        return {
            "kernel": jnp.asarray(
                np.transpose(state[f"{p}.weight"], (2, 1, 0)), dtype
            ),
            "bias": jnp.asarray(state[f"{p}.bias"], dtype),
        }

    return {
        "conv1": conv("encoder.conv1"),
        "conv2": conv("encoder.conv2"),
        "enc_pos": jnp.asarray(state["encoder.embed_positions.weight"], dtype),
        "enc_blocks": _stack([enc_block(i) for i in range(cfg.encoder_layers)]),
        "enc_ln": _gn(state, "encoder.layer_norm", dtype),
        "embed": jnp.asarray(state["decoder.embed_tokens.weight"], dtype),
        "dec_pos": jnp.asarray(state["decoder.embed_positions.weight"], dtype),
        "dec_blocks": _stack([dec_block(i) for i in range(cfg.decoder_layers)]),
        "dec_ln": _gn(state, "decoder.layer_norm", dtype),
    }


def convert_marian_state(state, cfg, dtype=jnp.bfloat16):
    state, full = _strip_model_prefix(state)

    def attn(p):
        return {
            "q": _lin(state, f"{p}.q_proj", dtype),
            "k": _lin(state, f"{p}.k_proj", dtype),
            "v": _lin(state, f"{p}.v_proj", dtype),
            "o": _lin(state, f"{p}.out_proj", dtype),
        }

    def enc_block(i):
        p = f"encoder.layers.{i}"
        return {
            "attn": attn(f"{p}.self_attn"),
            "ln_attn": _gn(state, f"{p}.self_attn_layer_norm", dtype),
            "fc1": _lin(state, f"{p}.fc1", dtype),
            "fc2": _lin(state, f"{p}.fc2", dtype),
            "ln_ff": _gn(state, f"{p}.final_layer_norm", dtype),
        }

    def dec_block(i):
        p = f"decoder.layers.{i}"
        return {
            "self_attn": attn(f"{p}.self_attn"),
            "ln_self": _gn(state, f"{p}.self_attn_layer_norm", dtype),
            "cross_attn": attn(f"{p}.encoder_attn"),
            "ln_cross": _gn(state, f"{p}.encoder_attn_layer_norm", dtype),
            "fc1": _lin(state, f"{p}.fc1", dtype),
            "fc2": _lin(state, f"{p}.fc2", dtype),
            "ln_ff": _gn(state, f"{p}.final_layer_norm", dtype),
        }

    bias = full.get("final_logits_bias", np.zeros((cfg.vocab_size,)))
    return {
        "embed": jnp.asarray(state["shared.weight"], dtype),
        # enc/dec embed_positions are the same deterministic sinusoids
        "pos": jnp.asarray(state["encoder.embed_positions.weight"], dtype),
        "enc_blocks": _stack([enc_block(i) for i in range(cfg.encoder_layers)]),
        "dec_blocks": _stack([dec_block(i) for i in range(cfg.decoder_layers)]),
        "logits_bias": jnp.asarray(np.reshape(bias, (-1,)), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Depth Anything (DINOv2 backbone + DPT neck/head)
# ---------------------------------------------------------------------------


def load_torch_or_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Flat numpy state dict from an HF checkout: prefers *.safetensors,
    falls back to pytorch_model.bin (needs torch installed)."""
    if any(f.endswith(".safetensors") for f in os.listdir(path)):
        return load_safetensors_dir(path)
    bin_path = os.path.join(path, "pytorch_model.bin")
    if not os.path.exists(bin_path):
        raise FileNotFoundError(f"no safetensors or pytorch_model.bin in {path}")
    import torch

    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def convert_depth_anything_state(state, cfg, dtype=jnp.float32):
    """HF DepthAnythingForDepthEstimation state dict -> models/depth.py tree.

    Key layout per transformers' modeling_depth_anything / modeling_dinov2:
    ``backbone.embeddings.*``, ``backbone.encoder.layer.{i}.*`` (separate
    q/k/v linears, layer_scale lambdas), ``backbone.layernorm``,
    ``neck.reassemble_stage.layers.{i}.{projection,resize}``,
    ``neck.convs.{i}``, ``neck.fusion_stage.layers.{i}.*``, ``head.conv{1,2,3}``.
    Convs go OIHW -> HWIO; the reassemble transposed convs go
    [in, out, kh, kw] -> [in, kh, kw, out] (see _conv_transpose_block)."""

    def conv(prefix, bias=True):
        p = {
            "kernel": jnp.asarray(
                np.transpose(state[f"{prefix}.weight"], (2, 3, 1, 0)), dtype
            )
        }
        if bias:
            p["bias"] = jnp.asarray(state[f"{prefix}.bias"], dtype)
        return p

    def block(i):
        p = f"backbone.encoder.layer.{i}"
        a = f"{p}.attention"
        return {
            "ln1": _gn(state, f"{p}.norm1", dtype),
            "q": _lin(state, f"{a}.attention.query", dtype),
            "k": _lin(state, f"{a}.attention.key", dtype),
            "v": _lin(state, f"{a}.attention.value", dtype),
            "o": _lin(state, f"{a}.output.dense", dtype),
            "ls1": jnp.asarray(state[f"{p}.layer_scale1.lambda1"], dtype),
            "ln2": _gn(state, f"{p}.norm2", dtype),
            "fc1": _lin(state, f"{p}.mlp.fc1", dtype),
            "fc2": _lin(state, f"{p}.mlp.fc2", dtype),
            "ls2": jnp.asarray(state[f"{p}.layer_scale2.lambda1"], dtype),
        }

    reassemble, convs, fusion = [], [], []
    for i, factor in enumerate(cfg.reassemble_factors):
        rp = f"neck.reassemble_stage.layers.{i}"
        layer = {"proj": conv(f"{rp}.projection")}
        if factor > 1:
            layer["resize"] = {
                "kernel": jnp.asarray(
                    np.transpose(state[f"{rp}.resize.weight"], (0, 2, 3, 1)),
                    dtype,
                ),
                "bias": jnp.asarray(state[f"{rp}.resize.bias"], dtype),
            }
        elif factor < 1:
            layer["resize"] = conv(f"{rp}.resize")
        reassemble.append(layer)
        convs.append(conv(f"neck.convs.{i}", bias=False))
        fp = f"neck.fusion_stage.layers.{i}"
        fusion.append(
            {
                "proj": conv(f"{fp}.projection"),
                "res1": {
                    "conv1": conv(f"{fp}.residual_layer1.convolution1"),
                    "conv2": conv(f"{fp}.residual_layer1.convolution2"),
                },
                "res2": {
                    "conv1": conv(f"{fp}.residual_layer2.convolution1"),
                    "conv2": conv(f"{fp}.residual_layer2.convolution2"),
                },
            }
        )

    return {
        "cls": jnp.asarray(state["backbone.embeddings.cls_token"], dtype),
        "pos": jnp.asarray(state["backbone.embeddings.position_embeddings"], dtype),
        "patch": conv("backbone.embeddings.patch_embeddings.projection"),
        "blocks": [block(i) for i in range(cfg.num_layers)],
        "ln": _gn(state, "backbone.layernorm", dtype),
        "reassemble": reassemble,
        "convs": convs,
        "fusion": fusion,
        "head": {
            "conv1": conv("head.conv1"),
            "conv2": conv("head.conv2"),
            "conv3": conv("head.conv3"),
        },
    }
