"""Weight-only int8 quantization for linear layers.

Purpose: the full FLUX.1-dev DiT is ~12B params — 24 GB in bf16, over a
16 GB v5e's HBM.  Per-output-channel symmetric int8 weights (absmax/127
scales) halve weight memory and HBM traffic; activations stay bf16 and the
dequant multiply fuses into the matmul's operand load.  Typical weight-only
int8 error for DiT-scale linears is <0.5% — below bf16 sampling noise.

Quantized linears carry (kernel_q int8 [..., in, out], kernel_scale
[..., 1, out]) instead of ``kernel``; `models.flux.model.linear` consumes
either form.  Scan-stacked blocks quantize along the stacked axes naturally.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_linear(p: Params) -> Params:
    """One linear dict {kernel, bias?, lora_*...} -> int8-weight form."""
    kernel = p["kernel"].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kernel), axis=-2, keepdims=True)  # per out-col
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    out = {k: v for k, v in p.items() if k != "kernel"}
    out["kernel_q"] = q
    out["kernel_scale"] = scale.astype(jnp.float32)
    return out


def dequant_kernel(p: Params, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (
        p["kernel_q"].astype(jnp.float32) * p["kernel_scale"]
    ).astype(dtype)


def quantize_tree(params: Params, predicate=None) -> Params:
    """Quantize every linear subtree ({kernel: ...}) in a param tree.

    predicate(path, leaf_dict) -> bool can exclude layers (e.g. embedders).
    """
    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "kernel" in tree:
                if predicate is None or predicate(path, tree):
                    return quantize_linear(tree)
                return tree
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in tree.items()}
        return tree

    return walk(params)


def quantized_bytes(params: Params) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )


@functools.partial(jax.jit, static_argnames=("shape",))
def _random_int8(kk: jax.Array, shape) -> jnp.ndarray:
    """One fused program: random bits -> int8 reinterpret.  Jitted so XLA
    aliases the bitcast (zero-copy); eager per-op dispatch would hold a uint8
    source AND an int8 copy — a 2x transient that blows the margin when the
    final tree is ~12 GiB on a ~14 GiB-usable chip."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(kk, shape, jnp.uint8), jnp.int8
    )


def random_quantized_like(
    key: jax.Array, init_fn, sync_bytes: int = 2**30
) -> Params:
    """Build a random int8-quantized param tree WITHOUT materialising the
    bf16 original (structure via jax.eval_shape) — lets a 12B-param model be
    instantiated directly inside a ~14 GB-usable chip for benchmarking.

    init_fn: () -> params (called only under eval_shape).

    sync_bytes: force device execution every time this many bytes of new
    leaves have been enqueued.  Remote-compile platforms (axon) defer every
    dispatch until a value is pulled, so without periodic sync the whole
    12 GB tree build executes as one burst whose per-leaf transients
    (random bits + bitcast) overlap and exhaust HBM.
    """
    shapes = jax.eval_shape(init_fn)
    pending = [0]

    def _sync(x):
        pending[0] += x.size * x.dtype.itemsize
        if pending[0] >= sync_bytes:
            jax.device_get(jnp.ravel(x)[0])  # real barrier (see utils/device_bench)
            pending[0] = 0
        return x

    def walk(tree):
        if isinstance(tree, dict):
            if "kernel" in tree and not isinstance(tree["kernel"], dict):
                sds = tree["kernel"]
                kk = jax.random.fold_in(key, hash(str(sds.shape)) % (2**31))
                out = {}
                out["kernel_q"] = _sync(_random_int8(kk, tuple(sds.shape)))
                fan_in = sds.shape[-2]
                out["kernel_scale"] = jnp.full(
                    sds.shape[:-2] + (1, sds.shape[-1]),
                    0.02 / (fan_in ** 0.5) / 127.0,
                    jnp.float32,
                )
                for name, leaf in tree.items():
                    if name != "kernel":
                        out[name] = jnp.zeros(leaf.shape, leaf.dtype)
                return out
            return {k: walk(v) for k, v in tree.items()}
        # non-linear leaf (norm weights etc.)
        if jnp.issubdtype(tree.dtype, jnp.floating):
            return jnp.ones(tree.shape, tree.dtype)
        return jnp.zeros(tree.shape, tree.dtype)

    return walk(shapes)


def fuse_qkv_projections(
    flux_params: Params, consume: bool = False, tp_layout: bool = False
) -> Params:
    """Serving-time transform: concatenate each attention's q/k/v projection
    weights along the output axis so every stream issues ONE matmul instead
    of three (the activations are read from HBM once, and W8A8 quantizes
    them in-VMEM once).  Exact — per-out-channel int8 scales concatenate
    losslessly — and works on stacked ([NB, K, N]) or flat trees, quantized
    or bf16.

    The reference pays three separate nn.Linear launches per stream
    (block.py:84-95).  Skipped (left unfused) wherever a LoRA delta sits on
    q/k/v — the adapters address the projections individually — or under
    tensor parallelism, where the TP rules shard the UNfused per-projection
    output axes (a fused [K, 3H] column shard would split heads across q/k/v
    boundaries).

    Consumed by ``models.flux.model._qkv`` via the fused "to_qkv" /
    "add_qkv_proj" dicts; `jnp.split` recovers q, k, v.

    consume=True MUTATES the input tree, dropping the source q/k/v arrays
    (with a device sync) right after each concat so the transform's peak
    HBM is one fused stack, not the whole fused+unfused set (~2 GB extra at
    12B on a ~14 GiB chip).  Use it when the caller is replacing its tree.

    tp_layout=True emits q/k/v STACKED on a new axis instead of
    concatenated flat — kernel_q [NB, K, 3, H], kernel_scale [NB, 1, 3, H],
    bias [NB, 3, H] — so tensor parallelism can shard the head axis of all
    three projections identically (P(..., "tensor") on the LAST dim); a
    flat [K, 3H] column shard would cut across the q/k/v boundary
    (parallel/tp_quant.tp_quant_qkv_stacked consumes this form).
    """
    def fuse3(a, b, c):
        # heterogeneous triples (e.g. a quantize predicate excluded one of
        # q/k/v, or mismatched extra leaves) cannot fuse losslessly — leave
        # them unfused rather than KeyError mid-walk or drop state
        if not (set(a) == set(b) == set(c)):
            return None
        fused: Params = {}
        for name in a:
            if tp_layout:
                fused[name] = jnp.stack([a[name], b[name], c[name]], axis=-2)
            else:
                fused[name] = jnp.concatenate(
                    [a[name], b[name], c[name]], axis=-1
                )
        return fused

    def fuse_attn(attn: Params) -> Params:
        out = attn if consume else dict(attn)
        for stem, fused_name in (
            ("to_{}", "to_qkv"), ("add_{}_proj", "add_qkv_proj")
        ):
            names = [stem.format(x) for x in ("q", "k", "v")]
            if all(n in attn for n in names):
                if any("lora_a" in attn[n] for n in names):
                    continue
                f = fuse3(*(attn[n] for n in names))
                if f is not None:
                    out[fused_name] = f
                    for n in names:
                        del out[n]
                    if consume:
                        # barrier: let the concat finish and the donors free
                        # before the next group's transient allocates
                        jax.device_get(jnp.ravel(f["kernel_scale"])[0]
                                       if "kernel_scale" in f
                                       else jnp.ravel(f["kernel"])[0])
        return out

    def walk(tree):
        if isinstance(tree, dict):
            if consume:
                for k, v in tree.items():
                    if k == "attn":
                        fuse_attn(v)
                    else:
                        walk(v)
                return tree
            return {
                k: (fuse_attn(v) if k == "attn" else walk(v))
                for k, v in tree.items()
            }
        return tree

    return walk(flux_params)


def split_single_proj_out(
    flux_params: Params, hidden: int, consume: bool = False
) -> Params:
    """Serving-time transform: split the single-block ``proj_out`` stack
    (input rows [hidden | mlp]) into an attention part (K=hidden, keeps the
    bias) and an MLP part, so ``single_block_forward`` never materialises
    the [S, hidden+mlp] concatenated activation.  That concat was measured
    as a 75 MB HBM write per block at batch 1 and lowers to a pathological
    pad/maximum loop at batch 4 (benchmarks/batch_trace.py).  Exact:
    y = x_attn @ W[:hidden] + x_mlp @ W[hidden:] + b — and the two parts
    get their OWN per-row activation quant scales, which can only help.

    Operates on stacked trees ([NB, K, N] int8 ``kernel_q`` or bf16
    ``kernel``); skipped when a LoRA delta sits on proj_out (adapters
    address the fused projection).  consume=True syncs and drops the
    source stack immediately so transform peak HBM is source + parts once
    (~+1.8 GB transient at 12B), not permanently.
    """
    sgl = flux_params.get("single_blocks")
    if not isinstance(sgl, dict):
        return flux_params
    p = sgl.get("proj_out")
    if not isinstance(p, dict) or "lora_a" in p or "proj_out_mlp" in sgl:
        return flux_params
    wname = "kernel_q" if "kernel_q" in p else "kernel"
    if wname not in p:
        return flux_params
    w = p[wname]
    if w.ndim != 3 or w.shape[1] <= hidden:  # expect stacked [NB, K, N]
        return flux_params

    attn_part = {k: v for k, v in p.items() if k != wname}
    attn_part[wname] = w[:, :hidden]
    mlp_part = {k: v for k, v in p.items() if k not in (wname, "bias")}
    mlp_part[wname] = w[:, hidden:]
    if consume:
        jax.device_get(jnp.ravel(mlp_part[wname])[0])  # parts materialised
        del p[wname]

    out_sgl = sgl if consume else dict(sgl)
    out_sgl["proj_out"] = attn_part
    out_sgl["proj_out_mlp"] = mlp_part
    if consume:
        return flux_params
    out = dict(flux_params)
    out["single_blocks"] = out_sgl
    return out
