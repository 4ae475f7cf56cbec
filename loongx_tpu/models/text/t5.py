"""T5 v1.1 encoder in JAX (FLUX's primary text encoder).

TPU-native replacement for the T5-XXL encoder the reference uses through
``pipeline.encode_prompt`` (/root/reference/src/flux/pipeline_tools.py:36-49).
T5 v1.1-XXL: d_model=4096, 24 layers, 64 heads, d_kv=64, d_ff=10240,
gated-GELU feed-forward, RMSNorm, relative position bias shared from layer 0,
no attention-score scaling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.ops.nn import Params, init_linear, qdot, rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    rel_pos_buckets: int = 32
    rel_pos_max_distance: int = 128
    layer_norm_eps: float = 1e-6

    @staticmethod
    def xxl() -> "T5Config":
        return T5Config()

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
        )


def _init_block(key, cfg: T5Config, dtype) -> Params:
    inner = cfg.num_heads * cfg.d_kv
    ks = jax.random.split(key, 7)
    return {
        "ln_attn": {"weight": jnp.ones((cfg.d_model,), dtype)},
        "q": init_linear(ks[0], cfg.d_model, inner, bias=False, dtype=dtype),
        "k": init_linear(ks[1], cfg.d_model, inner, bias=False, dtype=dtype),
        "v": init_linear(ks[2], cfg.d_model, inner, bias=False, dtype=dtype),
        "o": init_linear(ks[3], inner, cfg.d_model, bias=False, dtype=dtype),
        "ln_ff": {"weight": jnp.ones((cfg.d_model,), dtype)},
        "wi_0": init_linear(ks[4], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
        "wi_1": init_linear(ks[5], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
        "wo": init_linear(ks[6], cfg.d_ff, cfg.d_model, bias=False, dtype=dtype),
    }


def init_t5_params(key, cfg: T5Config, dtype=jnp.bfloat16) -> Params:
    k_emb, k_rel, k_blocks = jax.random.split(key, 3)
    block_keys = jax.random.split(k_blocks, cfg.num_layers)
    blocks = [_init_block(k, cfg, dtype) for k in block_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "embed": jax.random.normal(k_emb, (cfg.vocab_size, cfg.d_model)).astype(dtype),
        "rel_pos_bias": jax.random.normal(
            k_rel, (cfg.rel_pos_buckets, cfg.num_heads)
        ).astype(dtype)
        * 0.02,
        "blocks": stacked,
        "final_ln": {"weight": jnp.ones((cfg.d_model,), dtype)},
    }


def _relative_position_bucket(
    rel_pos: jnp.ndarray, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def t5_rel_pos_bias(params: Params, cfg: T5Config, seq_len: int) -> jnp.ndarray:
    """[1, H, S, S] additive attention bias."""
    ctx = jnp.arange(seq_len)[:, None]
    mem = jnp.arange(seq_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.rel_pos_buckets, cfg.rel_pos_max_distance
    )
    bias = params["rel_pos_bias"][buckets]  # [S, S, H]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def t5_encode(
    params: Params,
    cfg: T5Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    stacked_kernels: bool | None = None,
) -> jnp.ndarray:
    """input_ids [B, S] -> embeddings [B, S, d_model].

    When the blocks are int8-quantized (``quantize_tree``), the scan runs
    the scalar-prefetch stacked Pallas quant matmuls (ops/quant_matmul.py)
    instead of per-iteration XLA dequant dots: the XLA path reads the int8
    slice, writes a transient bf16 weight copy, and reads it back —
    ~3x the weight HBM traffic of the in-kernel tile dequant.  Weight-only
    mode (bf16 MXU, fp32 accum): activations stay un-quantized, so the
    result differs from the XLA path only by the bf16 rounding of the
    dequantised weight.  ``stacked_kernels``: None = auto (stacked iff
    fully quantized AND on TPU — interpret-mode Pallas at XXL scale would
    hang a CPU/GPU encode); True forces the stacked path (raises unless
    every block linear is quantized); False forces the XLA path."""
    b, s = input_ids.shape
    x = params["embed"][input_ids]
    bias = t5_rel_pos_bias(params, cfg, s)
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)

    blocks = params["blocks"]
    n_quant = sum("kernel_q" in blocks[nm] for nm in _BLOCK_LINEARS)
    quantized = n_quant == len(_BLOCK_LINEARS)
    if stacked_kernels is None:
        stacked_kernels = quantized and jax.default_backend() == "tpu"
    elif stacked_kernels and not quantized:
        raise ValueError(
            "stacked_kernels=True requires a fully int8-quantized T5 "
            f"(quantize_tree): {n_quant}/{len(_BLOCK_LINEARS)} block "
            "linears carry int8 weights"
        )
    if stacked_kernels:
        return _t5_encode_stacked(params, cfg, x, bias, b, s)

    def block_fn(x, blk):
        def mm(name, t, activation=None):
            y = qdot(blk[name], t)  # int8-weight aware (quantized serving)
            if activation == "gelu_tanh":
                y = jax.nn.gelu(y, approximate=True)
            return y

        y = _t5_block(
            cfg, bias, b, s, x,
            blk["ln_attn"]["weight"], blk["ln_ff"]["weight"], mm,
        )
        return y, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    return rms_norm(x, params["final_ln"]["weight"], cfg.layer_norm_eps)


_BLOCK_LINEARS = ("q", "k", "v", "o", "wi_0", "wi_1", "wo")


def _t5_block(cfg, bias, b, s, x, ln_attn_w, ln_ff_w, mm):
    """One T5 block (pre-norm self-attention, no score scaling, gated-GELU
    FF) — shared by both encode paths; ``mm(name, t, activation)`` is the
    only path-specific piece (how the linear is issued)."""
    h = rms_norm(x, ln_attn_w, cfg.layer_norm_eps)

    def heads(t):
        return t.astype(x.dtype).reshape(
            b, s, cfg.num_heads, cfg.d_kv
        ).transpose(0, 2, 1, 3)

    q, k, v = (heads(mm(nm, h)) for nm in ("q", "k", "v"))
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        + bias
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
    x = x + mm("o", attn).astype(x.dtype)

    h = rms_norm(x, ln_ff_w, cfg.layer_norm_eps)
    gelu = mm("wi_0", h, activation="gelu_tanh")
    lin = mm("wi_1", h)
    ff = mm("wo", (gelu * lin).astype(x.dtype)).astype(x.dtype)
    return x + ff


def _t5_encode_stacked(
    params: Params, cfg: T5Config, x: jnp.ndarray, bias: jnp.ndarray,
    b: int, s: int,
) -> jnp.ndarray:
    """Serving path over int8 blocks: scan over the LAYER INDEX with the
    full [NB, K, N] weight stacks as scalar-prefetch kernel operands (the
    DiT's scan pattern, models/flux/model.py) — no per-iteration weight
    slice copies, int8-only weight HBM reads."""
    from loongx_tpu.ops.quant_matmul import quant_matmul_stacked

    blocks = params["blocks"]

    def block_fn(x, blk_idx):
        def mm(name, t, activation=None):
            p = blocks[name]
            y = quant_matmul_stacked(
                t.reshape(b * s, t.shape[-1]), p["kernel_q"],
                p["kernel_scale"], blk_idx, activation=activation, w8a8=False,
            )
            return y.reshape(b, s, -1)

        y = _t5_block(
            cfg, bias, b, s, x,
            blocks["ln_attn"]["weight"][blk_idx],
            blocks["ln_ff"]["weight"][blk_idx], mm,
        )
        return y, None

    x, _ = jax.lax.scan(block_fn, x, jnp.arange(cfg.num_layers))
    return rms_norm(x, params["final_ln"]["weight"], cfg.layer_norm_eps)
