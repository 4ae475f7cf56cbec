"""FLUX.1-style diffusion transformer, TPU-native.

A from-scratch JAX implementation of the architecture the reference drives
through diffusers' ``FluxTransformer2DModel`` (wrapped by
/root/reference/src/flux/transformer.py and /root/reference/src/flux/block.py),
extended with the OminiControl condition-token stream:

  * dual-stream ("double") blocks: separate txt/img/cond adaLN + QKV with a
    single unified attention over [txt | img | cond];
  * single-stream blocks over the concatenated [txt+img] sequence (+ cond);
  * per-head RMS q/k norms, 3-axis RoPE, adaLN-zero modulation;
  * condition tokens get their own RoPE ids and a separate ``cond_temb``
    evaluated at the fixed condition timestep c_t (reference:
    transformer.py:108-114);
  * attention-mask modes ``union_cond_attn`` / ``independent_condition`` /
    ``c_factor`` (reference: block.py:106-128).

Design differences from the reference (deliberate, TPU-first):
  * blocks are *stacked* pytrees iterated with ``jax.lax.scan`` — one compiled
    block body instead of 57 unrolled ones; remat is a scan-level policy;
  * no in-place module mutation (``c_factor`` is an argument, not an
    attribute);
  * LoRA lives inside the param tree as optional (lora_a, lora_b) leaves per
    linear; the reference's ``enable_lora``/latent_lora gating maps to the
    static ``use_lora`` flag threaded to each call site (lora_controller.py).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from loongx_tpu.ops import rope as rope_ops
from loongx_tpu.ops.attention import unified_attention
from loongx_tpu.ops.nn import (
    Params,
    init_layer_norm,
    init_linear,
    init_rms_norm,
    layer_norm,
    rms_norm,
    silu,
    gelu_tanh,
)


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    num_heads: int = 24
    head_dim: int = 128
    num_double_blocks: int = 19
    num_single_blocks: int = 38
    joint_dim: int = 4096  # T5 hidden size (encoder_hidden_states)
    pooled_dim: int = 768  # CLIP pooled projection size
    guidance_embeds: bool = True
    axes_dims: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    mlp_ratio: int = 4
    time_embed_channels: int = 256

    @property
    def hidden(self) -> int:
        return self.num_heads * self.head_dim

    @staticmethod
    def flux_dev() -> "FluxConfig":
        return FluxConfig()

    @staticmethod
    def flux_schnell() -> "FluxConfig":
        return FluxConfig(guidance_embeds=False)

    @staticmethod
    def tiny(guidance: bool = True) -> "FluxConfig":
        """A miniature config for tests: same topology, tiny dims."""
        return FluxConfig(
            in_channels=16,
            num_heads=2,
            head_dim=32,
            num_double_blocks=2,
            num_single_blocks=2,
            joint_dim=32,
            pooled_dim=16,
            guidance_embeds=guidance,
            axes_dims=(8, 12, 12),
        )


# ---------------------------------------------------------------------------
# Param init
# ---------------------------------------------------------------------------


def _init_attn(key, cfg: FluxConfig, dual: bool, dtype) -> Params:
    h = cfg.hidden
    keys = jax.random.split(key, 8)
    p: Params = {
        "to_q": init_linear(keys[0], h, h, dtype=dtype),
        "to_k": init_linear(keys[1], h, h, dtype=dtype),
        "to_v": init_linear(keys[2], h, h, dtype=dtype),
        "norm_q": init_rms_norm(cfg.head_dim, dtype),
        "norm_k": init_rms_norm(cfg.head_dim, dtype),
    }
    if dual:
        p.update(
            {
                "add_q_proj": init_linear(keys[3], h, h, dtype=dtype),
                "add_k_proj": init_linear(keys[4], h, h, dtype=dtype),
                "add_v_proj": init_linear(keys[5], h, h, dtype=dtype),
                "norm_added_q": init_rms_norm(cfg.head_dim, dtype),
                "norm_added_k": init_rms_norm(cfg.head_dim, dtype),
                "to_out": init_linear(keys[6], h, h, dtype=dtype),
                "to_add_out": init_linear(keys[7], h, h, dtype=dtype),
            }
        )
    return p


def _init_double_block(key, cfg: FluxConfig, dtype) -> Params:
    h = cfg.hidden
    mlp = cfg.mlp_ratio * h
    keys = jax.random.split(key, 7)
    return {
        "norm1": {"linear": init_linear(keys[0], h, 6 * h, dtype=dtype)},
        "norm1_context": {"linear": init_linear(keys[1], h, 6 * h, dtype=dtype)},
        "attn": _init_attn(keys[2], cfg, dual=True, dtype=dtype),
        "ff": {
            "in": init_linear(keys[3], h, mlp, dtype=dtype),
            "out": init_linear(keys[4], mlp, h, dtype=dtype),
        },
        "ff_context": {
            "in": init_linear(keys[5], h, mlp, dtype=dtype),
            "out": init_linear(keys[6], mlp, h, dtype=dtype),
        },
    }


def _init_single_block(key, cfg: FluxConfig, dtype) -> Params:
    h = cfg.hidden
    mlp = cfg.mlp_ratio * h
    keys = jax.random.split(key, 4)
    return {
        "norm": {"linear": init_linear(keys[0], h, 3 * h, dtype=dtype)},
        "attn": _init_attn(keys[1], cfg, dual=False, dtype=dtype),
        "proj_mlp": init_linear(keys[2], h, mlp, dtype=dtype),
        "proj_out": init_linear(keys[3], h + mlp, h, dtype=dtype),
    }


def _stack_blocks(init_fn, key, n: int) -> Params:
    """Init n blocks and stack their leaves on a leading axis (for lax.scan)."""
    keys = jax.random.split(key, n)
    blocks = [init_fn(k) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def init_flux_params(
    key: jax.Array, cfg: FluxConfig, dtype=jnp.bfloat16
) -> Params:
    h = cfg.hidden
    tc = cfg.time_embed_channels
    keys = jax.random.split(key, 10)
    params: Params = {
        "x_embedder": init_linear(keys[0], cfg.in_channels, h, dtype=dtype),
        "context_embedder": init_linear(keys[1], cfg.joint_dim, h, dtype=dtype),
        "time_in": {
            "in_layer": init_linear(keys[2], tc, h, dtype=dtype),
            "out_layer": init_linear(keys[3], h, h, dtype=dtype),
        },
        "vector_in": {
            "in_layer": init_linear(keys[4], cfg.pooled_dim, h, dtype=dtype),
            "out_layer": init_linear(keys[5], h, h, dtype=dtype),
        },
        "double_blocks": _stack_blocks(
            lambda k: _init_double_block(k, cfg, dtype), keys[6], cfg.num_double_blocks
        ),
        "single_blocks": _stack_blocks(
            lambda k: _init_single_block(k, cfg, dtype), keys[7], cfg.num_single_blocks
        ),
        "norm_out": {"linear": init_linear(keys[8], h, 2 * h, dtype=dtype)},
        "proj_out": init_linear(keys[9], h, cfg.in_channels, dtype=dtype),
    }
    if cfg.guidance_embeds:
        gk1, gk2 = jax.random.split(jax.random.fold_in(key, 77))
        params["guidance_in"] = {
            "in_layer": init_linear(gk1, tc, h, dtype=dtype),
            "out_layer": init_linear(gk2, h, h, dtype=dtype),
        }
    return params


# ---------------------------------------------------------------------------
# LoRA-aware linear
# ---------------------------------------------------------------------------


def _env_knob(name: str, default: str = "0") -> str:
    """Read a serving/test env knob (LOONGX_STACKED_QMM, LOONGX_FUSE_LN,
    LOONGX_FUSE_GATE).  Call sites inside the model forward capture the value
    at TRACE time: it is baked into the compiled executable and is NOT part
    of the jit cache key, so flip these knobs only at process start (the
    bench/CLI entry points set them before building any jit) or clear the
    jax caches after changing them — a mid-process flip is silently ignored
    for already-compiled shapes."""
    return os.environ.get(name, default)


def _use_pallas_qmm(p: Params) -> bool:
    """Route an int8-quantized linear through the Pallas quant-matmul kernel?
    Requires TPU, an unstacked [K, N] weight, and no tensor parallelism:
    under TP, SPMD cannot partition a pallas_call over the sharded N axis —
    the XLA dequant path shards cleanly (per-shard bf16 transients are
    N/tp-sized).  Single source of truth for `linear` and `linear_gelu`."""
    from loongx_tpu.parallel.mesh import current_tp

    return (
        jax.default_backend() == "tpu"
        and p["kernel_q"].ndim == 2
        and current_tp() is None
    )


def _is_stacked_q(p: Params) -> bool:
    """Is this linear a *stacked* quantized view ([NB, K, N] int8 kernel +
    `_blk` scan index) produced by `_stacked_view`?"""
    return "_blk" in p and p["kernel_q"].ndim == 3


def _use_stacked_qmm(block_tree: Params) -> bool:
    """Scan FLUX blocks by index with quantized weight stacks closed over
    (Pallas scalar-prefetch kernels DMA tiles straight out of the [NB, K, N]
    stack) instead of letting lax.scan dynamic-slice each block's int8
    kernels into standalone buffers every iteration (~210 MB of pure copy
    per transformer call at full-dev).  Same gating as `_use_pallas_qmm`;
    LOONGX_STACKED_QMM=0/1 overrides (1 exercises the interpret-mode kernels
    in CPU tests; trace-time capture — see `_env_knob`)."""
    from loongx_tpu.parallel.mesh import current_tp

    mode = _env_knob("LOONGX_STACKED_QMM", "auto")
    if mode == "0":
        return False

    def has_q(t):
        if isinstance(t, dict):
            if "kernel_q" in t:
                # 3D = stacked linear; 4D = TP-layout fused qkv stack
                return t["kernel_q"].ndim in (3, 4)
            return any(has_q(v) for v in t.values())
        return False

    if not has_q(block_tree):
        return False
    if mode == "1":
        return True
    # under TP the stacked kernels run per-shard via shard_map wrappers
    # (parallel/tp_quant.py) — no XLA fallback needed since round 3
    return jax.default_backend() == "tpu"


def _stacked_view(tree: Params, blk: jnp.ndarray) -> Params:
    """Index block ``blk`` out of a stacked block tree, keeping int8 linear
    weight stacks whole (tagged with `_blk`) so `linear`/`linear_gelu` route
    them through the stacked Pallas kernels; every other leaf (norms, LoRA
    factors, bf16 kernels) is dynamic-indexed — those are small."""
    if isinstance(tree, dict):
        if "kernel_q" in tree:
            out = {
                k: (v if k in ("kernel_q", "kernel_scale", "bias")
                    else jax.lax.dynamic_index_in_dim(v, blk, 0, keepdims=False))
                for k, v in tree.items()
            }
            out["_blk"] = blk
            return out
        return {k: _stacked_view(v, blk) for k, v in tree.items()}
    return jax.lax.dynamic_index_in_dim(tree, blk, 0, keepdims=False)


def linear(
    p: Params,
    x: jnp.ndarray,
    use_lora: bool = True,
    lora_mask: Optional[jnp.ndarray] = None,
    tp_kind: Optional[str] = None,
) -> jnp.ndarray:
    """Linear with optional fused LoRA delta: y = xW + b [+ (xA)B * scale].

    The (lora_a, lora_b, lora_scale) leaves are added by train/lora.py; the
    ``use_lora`` flag reproduces the reference's enable_lora gating
    (src/flux/lora_controller.py:5-42).  ``lora_mask`` ([S, 1] of 0/1)
    restricts the delta to a token segment — used by the stream-fused blocks
    where img (LoRA off unless latent_lora) and cond (LoRA on) tokens ride
    one matmul.

    ``tp_kind`` ("col" / "row" / None->"repl") names this layer's Megatron
    split under an active tensor-parallel context so the stacked quant
    kernel can run per-shard via shard_map (parallel/tp_quant.py); it is a
    performance hint only — any value is correct (GSPMD reshards).
    """
    stacked = "kernel_q" in p and _is_stacked_q(p)
    if stacked:
        from loongx_tpu.parallel.mesh import current_tp

        tp = current_tp()
        lead = x.shape[:-1]
        nb = p["kernel_q"].shape[0]
        if tp is not None and not (use_lora and "lora_a" in p):
            # per-shard stacked kernel over the tensor axis (serving path;
            # bias applied inside the wrapper)
            from loongx_tpu.parallel.tp_quant import tp_quant_matmul_stacked

            y = tp_quant_matmul_stacked(
                tp_kind or "repl", x.reshape(-1, x.shape[-1]),
                p["kernel_q"], p["kernel_scale"].reshape(nb, 1, -1),
                p["_blk"], bias2=p.get("bias"),
            ).reshape(*lead, -1)
            return y.astype(x.dtype)
        if tp is not None:
            # TP + active LoRA: SPMD cannot partition a raw pallas_call over
            # the N-sharded stack (`_use_pallas_qmm` docstring) and the
            # shard_map wrapper above skips LoRA-carrying layers — dequant
            # the sliced block in XLA, which shards cleanly, and fall
            # through to the common LoRA/bias tail.
            wq = jax.lax.dynamic_index_in_dim(
                p["kernel_q"], p["_blk"], 0, keepdims=False
            )
            sc = jax.lax.dynamic_index_in_dim(
                p["kernel_scale"], p["_blk"], 0, keepdims=False
            )
            w = (wq.astype(jnp.float32) * sc.astype(jnp.float32)).astype(
                x.dtype
            )
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        else:
            # stacked scan view: scalar-prefetch kernel reads tiles straight
            # out of the whole [NB, K, N] stack — no per-iteration slice copy.
            # Under a data-axis mesh (DP training / batch-sharded serving)
            # the kernel runs per shard via shard_map — fwd AND custom_vjp
            # bwd stay Pallas (round-4 kernel-grade multi-device training)
            from loongx_tpu.ops.quant_matmul import quant_matmul_stacked_vjp
            from loongx_tpu.parallel.tp_quant import maybe_dp_rowshard

            qargs = (
                x.reshape(-1, x.shape[-1]), p["kernel_q"],
                p["kernel_scale"].reshape(nb, 1, -1), p["_blk"],
            )
            y = maybe_dp_rowshard(quant_matmul_stacked_vjp, 1, 1, *qargs)
            y = y.reshape(*lead, -1).astype(jnp.float32)
    elif "kernel_q" in p:  # int8 weight-only quantized (ops/quant.py)
        if _use_pallas_qmm(p):
            # tile-dequant Pallas matmul: int8 HBM reads, no bf16 weight
            # copy; differentiable wrt activations (custom_vjp transposed
            # kernel) so LoRA trains against a frozen int8 base (QLoRA);
            # LOONGX_W8A8=1 upgrades serving to the native int8-MXU kernel
            from loongx_tpu.ops.quant_matmul import (
                quant_matmul_vjp, quant_matmul_w8a8_vjp, use_w8a8,
            )

            qmm = quant_matmul_w8a8_vjp if use_w8a8() else quant_matmul_vjp
            lead = x.shape[:-1]
            from loongx_tpu.parallel.tp_quant import maybe_dp_rowshard

            qargs = (
                x.reshape(-1, x.shape[-1]), p["kernel_q"],
                p["kernel_scale"].reshape(1, -1),
            )
            y = maybe_dp_rowshard(qmm, 1, 1, *qargs)
            y = y.reshape(*lead, -1).astype(jnp.float32)
        else:
            w = (
                p["kernel_q"].astype(jnp.float32) * p["kernel_scale"]
            ).astype(x.dtype)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    else:
        y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if use_lora and "lora_a" in p:
        delta = jnp.dot(
            jnp.dot(x, p["lora_a"], preferred_element_type=jnp.float32).astype(
                x.dtype
            ),
            p["lora_b"],
            preferred_element_type=jnp.float32,
        ) * p["lora_scale"]
        if lora_mask is not None:
            delta = delta * lora_mask
        y = y + delta
    if "bias" in p:
        b = p["bias"]
        if stacked:  # bias kept stacked [NB, N] alongside the kernel stack
            b = jax.lax.dynamic_index_in_dim(b, p["_blk"], 0, keepdims=False)
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def linear_gelu(
    p: Params,
    x: jnp.ndarray,
    use_lora: bool = True,
    lora_mask: Optional[jnp.ndarray] = None,
    tp_kind: Optional[str] = None,
) -> jnp.ndarray:
    """gelu_tanh(linear(p, x)) with the bias + activation fused into the
    quant-matmul store epilogue on the int8 serving path (ops/quant_matmul
    `quant_linear_gelu`) — saves a full HBM round-trip over the 4x-wide ff
    hidden per block.  Falls back to the composed form whenever the fused
    kernel can't represent the computation (bf16 weights, an active LoRA
    delta that must be added pre-activation, non-TPU)."""
    if "kernel_q" in p:
        if _is_stacked_q(p) and not (use_lora and "lora_a" in p):
            from loongx_tpu.parallel.mesh import current_tp

            lead = x.shape[:-1]
            nb, _, n = p["kernel_q"].shape
            if current_tp() is not None:
                from loongx_tpu.parallel.tp_quant import tp_quant_matmul_stacked

                return tp_quant_matmul_stacked(
                    tp_kind or "repl",
                    x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
                    p["kernel_q"], p["kernel_scale"].reshape(nb, 1, n),
                    p["_blk"], bias2=p.get("bias"), activation="gelu_tanh",
                ).reshape(*lead, -1).astype(x.dtype)
            from loongx_tpu.ops.quant_matmul import quant_linear_gelu_stacked
            from loongx_tpu.parallel.tp_quant import maybe_dp_rowshard

            qargs = (
                x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
                p["kernel_q"], p["kernel_scale"].reshape(nb, 1, n),
                _bias3(p), p["_blk"],
            )
            y = maybe_dp_rowshard(quant_linear_gelu_stacked, 1, 1, *qargs)
            return y.reshape(*lead, -1).astype(x.dtype)
        if _use_pallas_qmm(p) and not (use_lora and "lora_a" in p):
            from loongx_tpu.ops.quant_matmul import quant_linear_gelu
            from loongx_tpu.parallel.tp_quant import maybe_dp_rowshard

            lead = x.shape[:-1]
            n = p["kernel_q"].shape[-1]
            bias = (
                p["bias"].astype(jnp.float32).reshape(1, -1)
                if "bias" in p else jnp.zeros((1, n), jnp.float32)
            )
            qargs = (
                x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
                p["kernel_q"], p["kernel_scale"].reshape(1, -1), bias,
            )
            y = maybe_dp_rowshard(quant_linear_gelu, 1, 1, *qargs)
            return y.reshape(*lead, -1).astype(x.dtype)
    return gelu_tanh(linear(p, x, use_lora, lora_mask, tp_kind=tp_kind))


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, flip_sin_to_cos=True, shift=0 (matches
    diffusers ``Timesteps`` as configured for FLUX).  t: [B] (already scaled
    by 1000)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _time_mlp(p: Params, emb: jnp.ndarray, dtype) -> jnp.ndarray:
    h = linear(p["in_layer"], emb.astype(dtype), use_lora=False)
    return linear(p["out_layer"], silu(h), use_lora=False)


def combined_timestep_embed(
    params: Params,
    cfg: FluxConfig,
    timestep: jnp.ndarray,
    pooled: jnp.ndarray,
    guidance: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """temb = MLP(sin(t*1000)) [+ MLP(sin(g*1000))] + MLP(pooled).  Matches
    diffusers CombinedTimestepGuidanceTextProjEmbeddings."""
    dtype = pooled.dtype
    t_emb = _time_mlp(
        params["time_in"], timestep_embedding(timestep, cfg.time_embed_channels), dtype
    )
    if cfg.guidance_embeds:
        assert guidance is not None, "guidance_embeds=True requires guidance"
        g_emb = _time_mlp(
            params["guidance_in"],
            timestep_embedding(guidance, cfg.time_embed_channels),
            dtype,
        )
        t_emb = t_emb + g_emb
    pool_h = linear(params["vector_in"]["in_layer"], pooled, use_lora=False)
    pool_emb = linear(params["vector_in"]["out_layer"], silu(pool_h), use_lora=False)
    return t_emb + pool_emb


# ---------------------------------------------------------------------------
# Block primitives
# ---------------------------------------------------------------------------


def _qkv(
    attn: Params,
    x: jnp.ndarray,
    num_heads: int,
    prefix: str = "to",
    use_lora: bool = True,
    lora_mask: Optional[jnp.ndarray] = None,
    ln_mod=None,
):
    """Project + split heads + per-head RMS q/k norm.  Returns [B,S,H,Dh]x3
    — heads-last ("bshd"), the projection's natural output layout: the
    flash-attention kernel head-slices its tiles via BlockSpec index maps, so
    no HBM transpose to head-major is ever materialised (the reference pays
    torch's .view().transpose() relayouts around every SDPA call,
    block.py:84-95)."""
    if prefix == "to":
        fused = attn.get("to_qkv")  # serving-fused (ops/quant.fuse_qkv_projections)
        nq, nk = attn["norm_q"], attn["norm_k"]
    else:  # context ("added") projections — never LoRA-targeted
        fused = attn.get("add_qkv_proj")
        nq, nk = attn["norm_added_q"], attn["norm_added_k"]
    fused_ok = fused is not None and (
        _is_stacked_q(fused)
        or ("_blk" in fused and fused["kernel_q"].ndim == 4)
    )
    ln_in_kernel = (
        fused_ok and x.shape[0] == 1
        and _env_knob("LOONGX_FUSE_LN") == "1"
    )
    if ln_mod is not None and not ln_in_kernel:
        # prologue can't ride into the kernel here — apply it in XLA and
        # proceed with the normed stream (identical math)
        x = _ln_mod_xla(x, ln_mod)
        ln_mod = None
    if fused is not None:
        if fused_ok:
            # one kernel: matmul + in-BlockSpec q/k/v split + fused RMS
            # (+ optional LN+adaLN prologue in the x load)
            return _fused_qkv_stacked(fused, nq, nk, x, num_heads, ln_mod)
        kq = fused.get("kernel_q", fused.get("kernel"))
        if kq is not None and kq.ndim == 3:
            # a scan-sliced TP-layout fused qkv (kernel [K, 3, H], the
            # stacked scan disabled): flatten the trailing (3, H) axes to
            # the flat [K, 3H] layout `linear` expects — pure reshapes,
            # and jnp.split below recovers q/k/v
            fused = {
                k: (
                    v.reshape(*v.shape[:-2], -1)
                    if v.shape[-2:] == kq.shape[-2:] else v
                )
                for k, v in fused.items()
            }
        q, k, v = jnp.split(linear(fused, x, use_lora=False), 3, -1)
    elif prefix == "to":
        q = linear(attn["to_q"], x, use_lora, lora_mask, tp_kind="col")
        k = linear(attn["to_k"], x, use_lora, lora_mask, tp_kind="col")
        v = linear(attn["to_v"], x, use_lora, lora_mask, tp_kind="col")
    else:
        q = linear(attn["add_q_proj"], x, use_lora=False, tp_kind="col")
        k = linear(attn["add_k_proj"], x, use_lora=False, tp_kind="col")
        v = linear(attn["add_v_proj"], x, use_lora=False, tp_kind="col")
    b, s, _ = q.shape

    def split(t):
        return t.reshape(b, s, num_heads, -1)

    q, k, v = split(q), split(k), split(v)
    q = rms_norm(q, nq["weight"])
    k = rms_norm(k, nk["weight"])
    return q, k, v


def _fused_qkv_stacked(p, nq, nk, x, num_heads: int, ln_mod=None):
    """Stacked fused-qkv projection via the single Pallas kernel
    (ops/quant_matmul.quant_qkv_stacked): the q/k/v split happens in the
    output BlockSpec and the per-head RMS q/k norms run in the store
    epilogue — no [M, 3H] intermediate, no separate norm pass.  ``ln_mod``
    additionally fuses the block's layernorm + per-segment adaLN affine
    into the x load (x is then the RAW stream)."""
    from loongx_tpu.ops.quant_matmul import quant_qkv_stacked

    b, s, kdim = x.shape
    tp4 = p["kernel_q"].ndim == 4  # [NB, K, 3, H] TP head-sharded layout
    nb = p["kernel_q"].shape[0]
    h = p["kernel_q"].shape[-1] if tp4 else p["kernel_q"].shape[-1] // 3
    hd = h // num_heads
    norm_w = jnp.stack(
        [
            jnp.tile(nq["weight"].astype(jnp.float32), num_heads),
            jnp.tile(nk["weight"].astype(jnp.float32), num_heads),
            jnp.ones((h,), jnp.float32),
        ]
    )
    ab, boundary = None, 0
    if ln_mod is not None:
        a_m, b_m, a_c, b_c, boundary = ln_mod
        ab = _mk_ab(a_m, b_m, a_c, b_c, kdim)
    if tp4:
        from loongx_tpu.parallel.tp_quant import tp_quant_qkv_stacked

        bias4 = _bias3(p, (nb, 1, 3, h))
        q, k, v = tp_quant_qkv_stacked(
            x.reshape(-1, kdim), p["kernel_q"],
            p["kernel_scale"].reshape(nb, 1, 3, h), bias4, norm_w,
            p["_blk"], hd, ab=ab, seg_boundary=boundary,
        )
    else:
        qkv_args = (
            x.reshape(-1, x.shape[-1]), p["kernel_q"],
            p["kernel_scale"].reshape(nb, 1, 3 * h), _bias3(p, (nb, 1, 3 * h)),
            norm_w, p["_blk"],
        )
        if ab is None:
            # batch-sharded serving: rows shard over the data axis
            from loongx_tpu.parallel.tp_quant import maybe_dp_rowshard

            q, k, v = maybe_dp_rowshard(
                lambda x2, wq, sc, b3, nw, blk: quant_qkv_stacked(
                    x2, wq, sc, b3, nw, blk, hd
                ),
                1, 3, *qkv_args,
            )
        else:
            # ab segments rows against the GLOBAL seg_boundary — never
            # row-shard it (see tp_quant._data_axis_for rationale)
            q, k, v = quant_qkv_stacked(
                *qkv_args[:6], hd, ab=ab, seg_boundary=boundary,
            )
    shape = (b, s, num_heads, hd)
    return (
        q.reshape(shape).astype(x.dtype),
        k.reshape(shape).astype(x.dtype),
        v.reshape(shape).astype(x.dtype),
    )


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, d = x.shape  # bshd: merging heads is a free reshape
    return x.reshape(b, s, h * d)


def _seg_lora(
    s_img: int, s_cond: int, latent_lora: bool, dtype
) -> Tuple[bool, Optional[jnp.ndarray]]:
    """(use_lora, lora_mask) for a fused [img | cond] latent stream.

    Reproduces the reference's enable_lora gating (lora_controller.py): LoRA
    always applies to condition tokens, and to base-latent tokens only when
    latent_lora is set."""
    if s_cond == 0:
        return latent_lora, None
    if latent_lora:
        return True, None
    mask = jnp.concatenate(
        [jnp.zeros((s_img, 1), dtype), jnp.ones((s_cond, 1), dtype)]
    )
    return True, mask


def _mod6(p: Params, temb: jnp.ndarray, use_lora: bool):
    """adaLN-zero modulation: 6 chunks [B, H] each (shift/scale/gate msa,
    shift/scale/gate mlp — diffusers order)."""
    return jnp.split(linear(p["linear"], silu(temb), use_lora=use_lora), 6, -1)


def _mod_pair(
    p: Params,
    temb: jnp.ndarray,
    cond_temb: Optional[jnp.ndarray],
    latent_lora: bool,
    n_chunks: int,
):
    """Both modulation matvecs (img@temb, cond@cond_temb) through the shared
    adaLN linear in ONE matmul — halves the per-block modulation weight
    traffic.  Per-row LoRA mask preserves the reference gating (img mod LoRA
    only under latent_lora; cond mod LoRA always)."""
    b = temb.shape[0]
    if cond_temb is None:
        mi = jnp.split(
            linear(p["linear"], silu(temb), use_lora=latent_lora), n_chunks, -1
        )
        return mi, [None] * n_chunks
    both = jnp.concatenate([silu(temb), silu(cond_temb)], axis=0)
    mask = jnp.concatenate(
        [jnp.full((b, 1), 1.0 if latent_lora else 0.0, both.dtype),
         jnp.ones((b, 1), both.dtype)]
    )
    mod = linear(p["linear"], both, use_lora=True, lora_mask=mask)
    return jnp.split(mod[:b], n_chunks, -1), jnp.split(mod[b:], n_chunks, -1)


def _seg_affine(x, boundary, a_main, b_main, a_cond, b_cond):
    """Per-segment affine y = x * a + b over a fused stream split at row
    ``boundary``.  Two measured-equivalent formulations, chosen by the
    (static) batch size: at batch 1 the branch-free row select avoids a
    lingering maximum/bitcast loop XLA emits for the slice form (-1.7
    ms/fwd at full-dev); at batch > 1 the select's broadcasts cost more
    than the slices, while the slice+concat form stays on fast fusions
    (-11.7 ms/edit at batch 4).  Same math either way; jit re-traces per
    batch shape so the branch is free."""
    if a_cond is None:
        return x * a_main[:, None, :] + b_main[:, None, :]
    if x.shape[0] == 1:
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (x.shape[1], 1), 0) < boundary
        )
        a = jnp.where(rows, a_main[:, None, :], a_cond[:, None, :])
        b = jnp.where(rows, b_main[:, None, :], b_cond[:, None, :])
        return x * a + b
    y = x[:, :boundary] * a_main[:, None, :] + b_main[:, None, :]
    yc = x[:, boundary:] * a_cond[:, None, :] + b_cond[:, None, :]
    return jnp.concatenate([y, yc], axis=1)


# ---------------------------------------------------------------------------
# Fused elementwise helpers: route the block's LN + adaLN affine prologue and
# gate + residual epilogue INTO the stacked quant matmuls (serving; B=1).
# Both fall back to the identical XLA composition whenever the kernel can't
# represent the computation (bf16 weights, LoRA delta, batch > 1, unstacked)
# so every call site has ONE math definition.
#
# MEASURED OFF BY DEFAULT: at full-dev the stacked quant kernels already run
# at 88-90% of the int8 MXU peak, and putting the elementwise work on the
# kernel's critical path STALLS the MXU for more than the saved HBM
# round-trip — LN prologue +5 ms/fwd, gate epilogue +3 ms/fwd even with
# host-precomputed LN stats (benchmarks/fused_ew_ab.py; the round-2
# "headroom #1/#2" hypothesis is refuted).  XLA's own elementwise fusions
# overlap with the kernels instead.  LOONGX_FUSE_LN=1 / LOONGX_FUSE_GATE=1
# re-enable for future hardware where the trade flips.
# ---------------------------------------------------------------------------


def _elementwise_fusable(
    p: Params, x: jnp.ndarray, use_lora: bool, knob: str = "LOONGX_FUSE_LN"
) -> bool:
    return (
        _env_knob(knob) == "1"
        and isinstance(p, dict)
        and "kernel_q" in p
        and _is_stacked_q(p)
        and not (use_lora and "lora_a" in p)
        and x.shape[0] == 1
    )


def _mk_ab(a_main, b_main, a_cond, b_cond, k: int) -> jnp.ndarray:
    """Pack per-segment affine rows into the kernels' [8, K] ab operand
    (rows 0..3 = a_main / b_main / a_cond / b_cond; cond falls back to the
    main affine when there is no cond segment)."""
    if a_cond is None:
        a_cond, b_cond = a_main, b_main
    ab = jnp.zeros((8, k), jnp.float32)
    ab = ab.at[0].set(a_main[0].astype(jnp.float32))
    ab = ab.at[1].set(b_main[0].astype(jnp.float32))
    ab = ab.at[2].set(a_cond[0].astype(jnp.float32))
    return ab.at[3].set(b_cond[0].astype(jnp.float32))


def _ln_mod_xla(x, ln_mod):
    """XLA composition of the LN + per-segment affine prologue (the
    reference's norm1/norm path, block.py:191-207)."""
    a_m, b_m, a_c, b_c, boundary = ln_mod
    return _seg_affine(layer_norm(x), boundary, a_m, b_m, a_c, b_c)


def _bias3(p: Params, shape: Optional[Tuple[int, ...]] = None) -> jnp.ndarray:
    """fp32 bias operand for the stacked quant kernels (zeros when the
    linear has no bias) — [NB, 1, N] by default; fused-qkv callers pass
    their [NB, 1, 3, H] / [NB, 1, 3H] layouts explicitly."""
    if shape is None:
        nb, _, n = p["kernel_q"].shape
        shape = (nb, 1, n)
    return (
        p["bias"].astype(jnp.float32).reshape(shape)
        if "bias" in p else jnp.zeros(shape, jnp.float32)
    )


def ln_mod_linear(
    p: Params,
    x: jnp.ndarray,
    ln_mod,
    activation: Optional[str] = None,
    use_lora: bool = True,
    lora_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(layer_norm(x) * a_seg + b_seg) -> linear (+ fused gelu).

    ln_mod = (a_main, b_main, a_cond|None, b_cond|None, boundary); x is the
    RAW fused [main | cond] stream [B, S, K]."""
    if _elementwise_fusable(p, x, use_lora):
        a_m, b_m, a_c, b_c, boundary = ln_mod
        b, s, k = x.shape
        nb, _, n = p["kernel_q"].shape
        ab = _mk_ab(a_m, b_m, a_c, b_c, k)
        from loongx_tpu.parallel.mesh import current_tp

        if current_tp() is not None:
            from loongx_tpu.parallel.tp_quant import tp_quant_matmul_stacked

            y = tp_quant_matmul_stacked(
                "col", x.reshape(s, k), p["kernel_q"],
                p["kernel_scale"].reshape(nb, 1, n), p["_blk"],
                bias2=p.get("bias"), activation=activation,
                ab=ab, seg_boundary=boundary,
            )
            return y.reshape(b, s, n).astype(x.dtype)
        from loongx_tpu.ops.quant_matmul import quant_ln_mod_linear_stacked

        y = quant_ln_mod_linear_stacked(
            boundary, activation, x.reshape(s, k), p["kernel_q"],
            p["kernel_scale"].reshape(nb, 1, n), _bias3(p), ab, p["_blk"],
        )
        return y.reshape(b, s, n).astype(x.dtype)
    nx = _ln_mod_xla(x, ln_mod)
    if activation == "gelu_tanh":
        return linear_gelu(p, nx, use_lora, lora_mask, tp_kind="col")
    assert activation is None
    return linear(p, nx, use_lora, lora_mask, tp_kind="col")


def gate_res_linear(
    p: Params,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    g_main: jnp.ndarray,
    g_cond: Optional[jnp.ndarray],
    boundary: int,
    use_lora: bool = True,
    lora_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """resid + gate_seg(row) * linear(x) — the adaLN-zero gated residual
    add, fused into the matmul store epilogue when representable."""
    if _elementwise_fusable(p, x, use_lora, knob="LOONGX_FUSE_GATE"):
        b, s, k = x.shape
        nb, _, n = p["kernel_q"].shape
        gc = g_cond if g_cond is not None else g_main
        gate = jnp.zeros((8, n), jnp.float32)
        gate = gate.at[0].set(g_main[0].astype(jnp.float32))
        gate = gate.at[1].set(gc[0].astype(jnp.float32))
        from loongx_tpu.parallel.mesh import current_tp

        if current_tp() is not None:
            from loongx_tpu.parallel.tp_quant import tp_quant_matmul_stacked

            y = tp_quant_matmul_stacked(
                "row", x.reshape(s, k), p["kernel_q"],
                p["kernel_scale"].reshape(nb, 1, n), p["_blk"],
                bias2=p.get("bias"), seg_boundary=boundary,
                resid=resid.reshape(s, n), gate=gate,
            )
            return y.reshape(b, s, n).astype(resid.dtype)
        from loongx_tpu.ops.quant_matmul import quant_gate_res_linear_stacked

        y = quant_gate_res_linear_stacked(
            boundary, x.reshape(s, k), p["kernel_q"],
            p["kernel_scale"].reshape(nb, 1, n), _bias3(p),
            resid.reshape(s, n), gate, p["_blk"],
        )
        return y.reshape(b, s, n).astype(resid.dtype)
    h = linear(p, x, use_lora, lora_mask, tp_kind="row")
    zero = jnp.zeros_like(g_main)
    gated = _seg_affine(h, boundary, g_main, zero, g_cond, zero)
    return resid + gated


def double_block_forward(
    block: Params,
    cfg: FluxConfig,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    temb: jnp.ndarray,
    cond_temb: Optional[jnp.ndarray],
    rope_full: Tuple[jnp.ndarray, jnp.ndarray],
    flags: Dict[str, Any],
    c_factor: Optional[jnp.ndarray],
    attn_backend: str,
):
    """One dual-stream block (reference semantics: block.py:179-278).

    TPU-first restructuring: img and cond tokens ride ONE fused latent stream
    through the shared-weight matmuls (qkv/out/ff) — larger M on the MXU and
    half the kernel launches vs the reference's per-stream calls — with
    per-segment adaLN modulation/gating and segment-masked LoRA preserving
    the reference's exact per-stream semantics.
    """
    use_cond = cond is not None
    latent_lora = bool(flags.get("latent_lora", False))
    nh = cfg.num_heads
    s_img, s_txt = img.shape[1], txt.shape[1]
    s_cond = cond.shape[1] if use_cond else 0

    lat = jnp.concatenate([img, cond], axis=1) if use_cond else img
    luse, lmask = _seg_lora(s_img, s_cond, latent_lora, lat.dtype)

    # adaLN modulation per segment (shared norm1 weights; cond modulated at
    # the fixed condition timestep — reference transformer.py:108-114; LoRA
    # on the cond modulation path matches block.py:191-207 gating).
    mi, mc = _mod_pair(
        block["norm1"], temb, cond_temb if use_cond else None, latent_lora, 6
    )
    mt = _mod6(block["norm1_context"], temb, use_lora=False)

    lm_attn = (
        1.0 + mi[1], mi[0],
        (1.0 + mc[1]) if use_cond else None, mc[0] if use_cond else None,
        s_img,
    )
    n_txt = layer_norm(txt) * (1.0 + mt[1][:, None, :]) + mt[0][:, None, :]

    attn = block["attn"]
    q_l, k_l, v_l = _qkv(
        attn, lat, nh, "to", use_lora=luse, lora_mask=lmask, ln_mod=lm_attn
    )
    q_t, k_t, v_t = _qkv(attn, n_txt, nh, "add", use_lora=False)
    # Sequence order [txt | img | cond] (reference block.py:70-72, 101-104);
    # token axis is 1 in the heads-last layout.
    q = jnp.concatenate([q_t, q_l], axis=1)
    k = jnp.concatenate([k_t, k_l], axis=1)
    v = jnp.concatenate([v_t, v_l], axis=1)

    mode = "union"
    if not flags.get("union_cond_attn", True):
        mode = "no_union"
    elif flags.get("independent_condition", False):
        mode = "independent"
    # RoPE rides into the attention backend (fused in the Pallas kernel)
    out = unified_attention(
        q, k, v, cond_len=s_cond, mode=mode, c_factor=c_factor,
        rope=rope_full, backend=attn_backend, layout="bshd",
    )
    out = _merge_heads(out)

    attn_txt = linear(
        attn["to_add_out"], out[:, :s_txt], use_lora=False, tp_kind="row"
    )
    if use_cond and flags.get("add_cond_attn", False):
        # reference block.py:233-234: img also receives the gated cond attn
        # — a cross-segment add the fused epilogue can't express
        attn_lat = linear(
            attn["to_out"], out[:, s_txt:], use_lora=luse, lora_mask=lmask,
            tp_kind="row",
        )
        if s_cond != s_img:
            raise ValueError(
                "add_cond_attn requires equal image and condition token "
                f"counts (img {s_img}, cond {s_cond}): the gated cond "
                "attention is added onto the image tokens elementwise "
                "(reference block.py:233-234)"
            )
        zero = jnp.zeros_like(mi[2])
        gated_lat = _seg_affine(attn_lat, s_img, mi[2], zero, mc[2], zero)
        gated_lat = gated_lat.at[:, :s_img].add(gated_lat[:, s_img:])
        lat = lat + gated_lat
    else:
        lat = gate_res_linear(
            attn["to_out"], out[:, s_txt:], lat,
            mi[2], mc[2] if use_cond else None, s_img,
            use_lora=luse, lora_mask=lmask,
        )
    txt = txt + mt[2][:, None, :] * attn_txt

    # MLP (fused latent stream; only ff.out is LoRA-targeted — seed config
    # regex targets ff.net.2, not net.0)
    h = ln_mod_linear(
        block["ff"]["in"], lat,
        (1.0 + mi[4], mi[3],
         (1.0 + mc[4]) if use_cond else None, mc[3] if use_cond else None,
         s_img),
        activation="gelu_tanh", use_lora=False,
    )
    lat = gate_res_linear(
        block["ff"]["out"], h, lat, mi[5], mc[5] if use_cond else None,
        s_img, use_lora=luse, lora_mask=lmask,
    )

    n2t = layer_norm(txt) * (1.0 + mt[4][:, None, :]) + mt[3][:, None, :]
    ht = linear_gelu(block["ff_context"]["in"], n2t, use_lora=False,
                     tp_kind="col")
    ht = linear(block["ff_context"]["out"], ht, use_lora=False, tp_kind="row")
    txt = txt + mt[5][:, None, :] * ht

    return txt, lat[:, :s_img], lat[:, s_img:] if use_cond else None


def single_block_forward(
    block: Params,
    cfg: FluxConfig,
    x: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    temb: jnp.ndarray,
    cond_temb: Optional[jnp.ndarray],
    rope_full: Tuple[jnp.ndarray, jnp.ndarray],
    flags: Dict[str, Any],
    c_factor: Optional[jnp.ndarray],
    attn_backend: str,
):
    """One single-stream block over [txt+img] (+ cond)
    (reference semantics: block.py:281-339), stream-fused like
    `double_block_forward`: main and cond tokens share every matmul with
    per-segment modulation/gating and segment-masked LoRA."""
    use_cond = cond is not None
    latent_lora = bool(flags.get("latent_lora", False))
    nh = cfg.num_heads
    s_x = x.shape[1]
    s_cond = cond.shape[1] if use_cond else 0

    full = jnp.concatenate([x, cond], axis=1) if use_cond else x
    luse, lmask = _seg_lora(s_x, s_cond, latent_lora, full.dtype)

    # adaLN-zero (3 chunks: shift, scale, gate) — both streams in one matvec
    mx, mc = _mod_pair(
        block["norm"], temb, cond_temb if use_cond else None, latent_lora, 3
    )
    lm = (
        1.0 + mx[1], mx[0],
        (1.0 + mc[1]) if use_cond else None, mc[0] if use_cond else None,
        s_x,
    )
    mlp_h = ln_mod_linear(
        block["proj_mlp"], full, lm,
        activation="gelu_tanh", use_lora=luse, lora_mask=lmask,
    )

    attn = block["attn"]
    q, k, v = _qkv(
        attn, full, nh, "to", use_lora=luse, lora_mask=lmask, ln_mod=lm
    )

    mode = "union"
    if not flags.get("union_cond_attn", True):
        mode = "no_union"
    elif flags.get("independent_condition", False):
        mode = "independent"
    out = unified_attention(
        q, k, v, cond_len=s_cond, mode=mode, c_factor=c_factor,
        rope=rope_full, backend=attn_backend, layout="bshd",
    )
    out = _merge_heads(out)

    g_cond = mc[2] if use_cond else None
    if "proj_out_mlp" in block:
        # split proj_out (ops/quant.split_single_proj_out): two K-partial
        # matmuls accumulated through the gated residual — never builds the
        # [S, hidden+mlp] concat (y = x_a W[:h] + x_m W[h:] + b exactly)
        full = gate_res_linear(
            block["proj_out"], out, full, mx[2], g_cond,
            s_x, use_lora=luse, lora_mask=lmask,
        )
        full = gate_res_linear(
            block["proj_out_mlp"], mlp_h, full, mx[2], g_cond,
            s_x, use_lora=luse, lora_mask=lmask,
        )
    else:
        h = jnp.concatenate([out, mlp_h], axis=-1)
        full = gate_res_linear(
            block["proj_out"], h, full, mx[2], g_cond,
            s_x, use_lora=luse, lora_mask=lmask,
        )
    return full[:, :s_x], full[:, s_x:] if use_cond else None


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def flux_forward(
    params: Params,
    cfg: FluxConfig,
    *,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    pooled: jnp.ndarray,
    timestep: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt_ids: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    cond: Optional[jnp.ndarray] = None,
    cond_ids: Optional[jnp.ndarray] = None,
    flags: Optional[Dict[str, Any]] = None,
    c_t: float = 0.0,
    c_factor: Optional[jnp.ndarray] = None,
    attn_backend: str = "auto",
    remat: bool = False,
    controlnet_block_samples: Optional[jnp.ndarray] = None,
    controlnet_single_block_samples: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full conditioned FLUX forward (reference: transformer.py:47-252).

    Args:
      img: [B, S_img, in_channels] packed latent tokens.
      txt: [B, S_txt, joint_dim] T5 embeddings.
      pooled: [B, pooled_dim] CLIP pooled embedding.
      timestep: [B] in [0, 1] (will be scaled by 1000 internally).
      guidance: [B] guidance scale (dev only), scaled by 1000 internally.
      img_ids/txt_ids: [S, 3] position ids; cond_ids likewise.
      cond: [B, S_cond, in_channels] condition latent tokens or None.
      flags: model flag dict (union_cond_attn / add_cond_attn / latent_lora /
        independent_condition).
      c_t: fixed condition timestep (0 in reference).
      c_factor: optional traced condition-strength scalar.
      remat: rematerialise each block (gradient checkpointing).
      controlnet_block_samples: optional [N, B, S_img, hidden] residuals added
        to the img stream after each double block (reference
        transformer.py:172-181: block i receives sample
        i // ceil(n_blocks / N)); the scan body dynamic-indexes the stack.
      controlnet_single_block_samples: likewise [N, B, S_img, hidden] after
        each single block, added to the img segment only
        (reference transformer.py:230-239).

    Returns: [B, S_img, in_channels] velocity prediction.
    """
    flags = flags or {}
    use_cond = cond is not None
    latent_lora = bool(flags.get("latent_lora", False))

    # Canonicalize every float input to the latents' dtype.  The block math
    # dtype follows temb (= pooled's dtype, combined_timestep_embed) while
    # the scan carries follow img/txt/cond — a caller mixing dtypes (e.g.
    # f32 prompt embeddings over bf16 latents) would otherwise promote the
    # carries mid-scan and fail lax.scan's carry-type check.
    wdt = img.dtype
    txt = txt.astype(wdt)
    pooled = pooled.astype(wdt)
    if use_cond:
        cond = cond.astype(wdt)
    # ControlNet residuals add onto the img scan carry — an f32 stack over
    # bf16 latents would promote the carry and fail the same check.
    if controlnet_block_samples is not None:
        controlnet_block_samples = controlnet_block_samples.astype(wdt)
    if controlnet_single_block_samples is not None:
        controlnet_single_block_samples = (
            controlnet_single_block_samples.astype(wdt)
        )

    img_h = linear(params["x_embedder"], img, use_lora=latent_lora)
    cond_h = (
        linear(params["x_embedder"], cond, use_lora=True) if use_cond else None
    )
    txt_h = linear(params["context_embedder"], txt, use_lora=False)

    t1000 = timestep.astype(jnp.float32) * 1000.0
    g1000 = (
        guidance.astype(jnp.float32) * 1000.0
        if (guidance is not None and cfg.guidance_embeds)
        else None
    )
    temb = combined_timestep_embed(params, cfg, t1000, pooled, g1000)
    cond_temb = None
    if use_cond:
        ct = jnp.full_like(t1000, c_t * 1000.0)
        cond_temb = combined_timestep_embed(params, cfg, ct, pooled, g1000)

    # One RoPE table for the full [txt | img | cond] order — shared by double
    # and single blocks (single blocks see [txt+img | cond], same order).
    ids_full = (
        jnp.concatenate([txt_ids, img_ids, cond_ids], axis=0)
        if use_cond
        else jnp.concatenate([txt_ids, img_ids], axis=0)
    )
    rope_full = rope_ops.rope_embed(ids_full, cfg.axes_dims, cfg.theta)

    # ControlNet residual index maps (reference transformer.py:172-181,
    # 230-239: block i receives sample i // ceil(n_blocks / n_samples)).
    def _cn_idx(n_blocks: int, samples) -> Optional[jnp.ndarray]:
        if samples is None:
            return None
        interval = -(-n_blocks // samples.shape[0])  # ceil
        return jnp.arange(n_blocks) // interval

    cn_dbl_idx = _cn_idx(cfg.num_double_blocks, controlnet_block_samples)
    cn_sgl_idx = _cn_idx(cfg.num_single_blocks, controlnet_single_block_samples)

    # Quantized stacks: scan by block index with the int8 weight stacks
    # closed over (stacked Pallas kernels index them via scalar prefetch)
    # instead of letting scan slice-copy each block's kernels per iteration.
    dbl_stacked = _use_stacked_qmm(params["double_blocks"])
    sgl_stacked = _use_stacked_qmm(params["single_blocks"])
    dbl_xs = (
        jnp.arange(cfg.num_double_blocks) if dbl_stacked
        else params["double_blocks"]
    )
    sgl_xs = (
        jnp.arange(cfg.num_single_blocks) if sgl_stacked
        else params["single_blocks"]
    )

    def _dbl_block(b):
        return _stacked_view(params["double_blocks"], b) if dbl_stacked else b

    def _sgl_block(b):
        return _stacked_view(params["single_blocks"], b) if sgl_stacked else b

    def _cn_residual(samples, idx):
        # dynamic-index the [N, B, S, H] residual stack inside the scan body
        return jax.lax.dynamic_index_in_dim(samples, idx, 0, keepdims=False)

    # --- double blocks (scan over stacked params) ---
    def double_body(carry, xs):
        block, cn_i = xs
        block = _dbl_block(block)
        txt_c, img_c, cond_c = carry
        txt_c, img_c, cond_c = double_block_forward(
            block, cfg, img_c, txt_c, cond_c, temb, cond_temb, rope_full,
            flags, c_factor, attn_backend,
        )
        if cn_i is not None:
            img_c = img_c + _cn_residual(controlnet_block_samples, cn_i)
        return (txt_c, img_c, cond_c), None

    if use_cond:
        body = (
            jax.checkpoint(double_body, prevent_cse=False)
            if remat else double_body
        )
        (txt_h, img_h, cond_h), _ = jax.lax.scan(
            body, (txt_h, img_h, cond_h), (dbl_xs, cn_dbl_idx)
        )
    else:
        # Keep the carry structure static (no None in scan carries).
        def body2(carry, xs):
            block, cn_i = xs
            block = _dbl_block(block)
            (t, i), _ = carry, None
            t, i, _c = double_block_forward(
                block, cfg, i, t, None, temb, None, rope_full, flags,
                c_factor, attn_backend,
            )
            if cn_i is not None:
                i = i + _cn_residual(controlnet_block_samples, cn_i)
            return (t, i), None

        b2 = jax.checkpoint(body2, prevent_cse=False) if remat else body2
        (txt_h, img_h), _ = jax.lax.scan(
            b2, (txt_h, img_h), (dbl_xs, cn_dbl_idx)
        )

    # --- single blocks over [txt | img] ---
    s_txt = txt_h.shape[1]
    x = jnp.concatenate([txt_h, img_h], axis=1)

    def single_body(carry, xs):
        block, cn_i = xs
        block = _sgl_block(block)
        x_c, cond_c = carry
        x_c, cond_c = single_block_forward(
            block, cfg, x_c, cond_c, temb, cond_temb, rope_full, flags,
            c_factor, attn_backend,
        )
        if cn_i is not None:
            x_c = x_c.at[:, s_txt:].add(
                _cn_residual(controlnet_single_block_samples, cn_i)
            )
        return (x_c, cond_c), None

    if use_cond:
        sb = jax.checkpoint(single_body, prevent_cse=False) if remat else single_body
        (x, cond_h), _ = jax.lax.scan(
            sb, (x, cond_h), (sgl_xs, cn_sgl_idx)
        )
    else:
        def single_body2(x_c, xs):
            block, cn_i = xs
            block = _sgl_block(block)
            x_c, _ = single_block_forward(
                block, cfg, x_c, None, temb, None, rope_full, flags,
                c_factor, attn_backend,
            )
            if cn_i is not None:
                x_c = x_c.at[:, s_txt:].add(
                    _cn_residual(controlnet_single_block_samples, cn_i)
                )
            return x_c, None

        sb2 = (
            jax.checkpoint(single_body2, prevent_cse=False) if remat else single_body2
        )
        x, _ = jax.lax.scan(sb2, x, (sgl_xs, cn_sgl_idx))

    x = x[:, txt_h.shape[1] :]

    # AdaLayerNormContinuous: scale first, then shift (diffusers order).
    mod = linear(params["norm_out"]["linear"], silu(temb), use_lora=False)
    scale, shift = jnp.split(mod, 2, axis=-1)
    x = layer_norm(x) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return linear(params["proj_out"], x, use_lora=False)
