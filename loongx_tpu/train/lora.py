"""LoRA as pytree weight deltas.

The reference injects peft LoRA adapters into the HF transformer by module
regex (/root/reference/src/train/model.py:513-524, target_modules in
train/config/seed_512.yaml:36-41).  Here LoRA lives *inside* the param tree:
targeted linears gain ``lora_a`` [.., in, r], ``lora_b`` [.., r, out] and a
``lora_scale`` scalar leaf; `loongx_tpu.models.flux.model.linear` applies
``y += (x A) B * scale`` when the leaves are present and the call site's
``use_lora`` gate is on (the enable_lora/latent_lora semantics,
reference src/flux/lora_controller.py).

Because blocks are scan-stacked, LoRA factors stack on the same leading axis
— one pytree, no per-block Python objects.  peft-style init: A ~ N(0, 1/r),
B = 0, scale = alpha / r.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# Default target set == the reference's regex (seed_512.yaml:39) translated to
# our tree paths.  Stacked-block leading axes are implicit.
DEFAULT_TARGETS: Tuple[str, ...] = (
    r"^x_embedder$",
    r"^double_blocks/norm1/linear$",
    r"^double_blocks/attn/to_(q|k|v)$",
    r"^double_blocks/attn/to_out$",
    r"^double_blocks/ff/out$",
    r"^single_blocks/norm/linear$",
    r"^single_blocks/attn/to_(q|k|v)$",
    r"^single_blocks/proj_mlp$",
    r"^single_blocks/proj_out$",
)

# The flux forward applies a LoRA delta only at call sites whose ``use_lora``
# gate can be on (models/flux/model.py) — today exactly the DEFAULT_TARGETS
# layers.  Everything else (context_embedder, norm1_context, ff_context,
# add_*_proj, to_add_out, time_in/vector_in/guidance_in, norm_out, the final
# proj_out, double ff/in) calls linear(..., use_lora=False): an adapter
# attached there would get exactly-zero gradients and train nothing, so
# `add_lora` refuses such targets instead of silently attaching dead leaves.
FLUX_APPLIABLE_TARGETS: Tuple[str, ...] = DEFAULT_TARGETS


def _walk_linears(tree: Params, prefix: str = ""):
    """Yield (path, dict) for every linear-like subtree — bf16 ({kernel})
    or int8-quantized ({kernel_q, kernel_scale})."""
    if isinstance(tree, dict):
        if "kernel" in tree or "kernel_q" in tree:
            yield prefix, tree
        else:
            for k, v in tree.items():
                yield from _walk_linears(v, f"{prefix}/{k}" if prefix else k)


def add_lora(
    key: jax.Array,
    params: Params,
    r: int = 4,
    alpha: int = 4,
    targets: Tuple[str, ...] = DEFAULT_TARGETS,
    dtype=jnp.bfloat16,
    appliable: Optional[Tuple[str, ...]] = FLUX_APPLIABLE_TARGETS,
) -> Params:
    """Return a copy of ``params`` with LoRA leaves added to targeted linears.

    ``appliable`` guards against dead adapters: any matched path outside it
    raises (the forward would never read those leaves — see
    FLUX_APPLIABLE_TARGETS).  Pass appliable=None for non-flux trees."""
    fused = [
        p for p, _ in _walk_linears(params)
        if p.endswith(("to_qkv", "add_qkv_proj"))
    ]
    if fused:
        # the reference's target regexes address to_q/to_k/to_v individually;
        # silently skipping them on a serving-fused tree would train a
        # different adapter set than configured
        raise ValueError(
            "param tree has serving-fused qkv projections "
            f"({fused[:2]}...): quantize with fuse_qkv=False before adding "
            "LoRA adapters"
        )
    if any(p.endswith("proj_out_mlp") for p, _ in _walk_linears(params)):
        # same reason for the serving-time proj_out K-split: the reference
        # regex targets the FUSED proj_out; r^proj_out$ would silently hit
        # only the attn part here (loading a trained adapter onto a split
        # tree is fine — load_lora_state_dict routes the rows)
        raise ValueError(
            "param tree has the serving proj_out K-split "
            "(single_blocks/proj_out_mlp): quantize without "
            "split_single_proj_out before adding LoRA adapters"
        )
    params = jax.tree.map(lambda x: x, params)  # shallow-ish copy via rebuild
    patterns = [re.compile(t) for t in targets]
    matched = []
    for path, leaf_dict in _walk_linears(params):
        if any(p.search(path) for p in patterns):
            matched.append((path, leaf_dict))
    if not matched:
        raise ValueError(f"no linears matched LoRA targets {targets}")
    # The appliable guard only makes sense on a FULL flux tree (the paths it
    # names are rooted there); subtree calls (e.g. on double_blocks alone)
    # skip it — their paths have no double_blocks/ prefix to match.
    full_flux = (
        isinstance(params, dict)
        and "double_blocks" in params
        and "single_blocks" in params
    )
    if appliable is not None and full_flux:
        ok = [re.compile(t) for t in appliable]
        dead = [p for p, _ in matched if not any(a.search(p) for a in ok)]
        if dead:
            raise ValueError(
                f"LoRA targets match layers the forward never applies "
                f"adapters to (use_lora=False call sites): {dead}. These "
                "would train with exactly-zero gradients. Target a subset "
                "of train.lora.FLUX_APPLIABLE_TARGETS, or pass "
                "appliable=None for a non-flux tree."
            )
    keys = jax.random.split(key, len(matched))
    for (path, leaf), k in zip(matched, keys):
        kernel = leaf.get("kernel", leaf.get("kernel_q"))  # QLoRA: int8 base
        *stack, d_in, d_out = kernel.shape
        leaf["lora_a"] = (
            jax.random.normal(k, (*stack, d_in, r), jnp.float32) / r
        ).astype(dtype)
        leaf["lora_b"] = jnp.zeros((*stack, r, d_out), dtype)
        # per-block scale so stacked (scan-sliced) blocks carry a leading axis
        leaf["lora_scale"] = jnp.full(tuple(stack), alpha / r, jnp.float32)
    return params


def lora_mask(params: Params) -> Params:
    """Boolean mask tree: True for lora_a / lora_b leaves (the trainable set
    — the reference trains only the LoRA layers, model.py:533-543)."""
    def mask(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        return any(n in ("lora_a", "lora_b") for n in names)

    return jax.tree_util.tree_map_with_path(mask, params)


def merge_lora(params: Params) -> Params:
    """Fold LoRA deltas into the base kernels (inference fast path) and strip
    the lora leaves."""
    out = {}

    def merge_tree(tree):
        if isinstance(tree, dict):
            if "kernel_q" in tree and "lora_a" in tree:
                # folding a bf16 delta into int8 weights would requantize
                # (lossy) — serve quantized bases with live deltas instead
                # (linear() applies them on top of the quant matmul exactly)
                raise ValueError(
                    "merge_lora: cannot fold a LoRA delta into an "
                    "int8-quantized kernel; keep the deltas live (QLoRA "
                    "serving) or merge before quantize()"
                )
            if "kernel" in tree and "lora_a" in tree:
                kernel = tree["kernel"]
                scale = tree["lora_scale"]
                delta = jnp.einsum(
                    "...ir,...ro->...io",
                    tree["lora_a"].astype(jnp.float32),
                    tree["lora_b"].astype(jnp.float32),
                ) * scale[..., None, None]
                new = {
                    k: v
                    for k, v in tree.items()
                    if k not in ("lora_a", "lora_b", "lora_scale")
                }
                new["kernel"] = (kernel.astype(jnp.float32) + delta).astype(
                    kernel.dtype
                )
                return new
            return {k: merge_tree(v) for k, v in tree.items()}
        return tree

    return merge_tree(params)


def lora_state_dict(params: Params) -> Dict[str, jnp.ndarray]:
    """Flat {path: array} of only the LoRA leaves, INCLUDING lora_scale so a
    trained alpha/r scaling survives the round trip (for checkpointing —
    equivalent of peft's get_peft_model_state_dict, reference model.py:526-531).

    None leaves are skipped: a partitioned *trainable* tree (train/step.py
    `partition`) holds lora_a/lora_b arrays but lora_scale=None (frozen), and
    np.asarray(None) would silently serialise a NaN scalar."""
    out = {}
    for path, leaf in _walk_linears(params):
        if leaf.get("lora_a") is not None:
            out[f"{path}/lora_a"] = leaf["lora_a"]
            out[f"{path}/lora_b"] = leaf["lora_b"]
            if leaf.get("lora_scale") is not None:
                out[f"{path}/lora_scale"] = leaf["lora_scale"]
    return out


def _route_split_proj_out(index, state: Dict[str, Any]) -> Dict[str, Any]:
    """Reconcile LoRA factor layout with the serving-time proj_out K-split
    (ops/quant.split_single_proj_out divides the fused [hidden+mlp]-row
    single-block proj_out into K=hidden / K=mlp parts).

    Forward: a factor trained against the fused layout is split by rows
    onto the two parts — exact, since x_full A B = x_attn A[:h] B +
    x_mlp A[h:] B and the forward accumulates both gated partials.
    Reverse: a state saved from a split tree loads into a fused tree by
    concatenating the rows back (lora_b/lora_scale are identical copies)."""
    out = dict(state)
    paths = {k.rsplit("/", 1)[0] for k in state}
    for path in sorted(paths):
        if path.endswith("/proj_out") and path in index:
            mlp = path + "_mlp"
            a_key = f"{path}/lora_a"
            if mlp in index and a_key in out:
                kernel = index[path].get("kernel", index[path].get("kernel_q"))
                k_rows = kernel.shape[-2]
                a = jnp.asarray(out[a_key])
                if a.shape[-2] > k_rows:
                    out[a_key] = a[..., :k_rows, :]
                    out[f"{mlp}/lora_a"] = a[..., k_rows:, :]
                    for leaf in ("lora_b", "lora_scale"):
                        if f"{path}/{leaf}" in out:
                            out[f"{mlp}/{leaf}"] = out[f"{path}/{leaf}"]
        elif path.endswith("/proj_out_mlp") and path not in index:
            base = path[: -len("_mlp")]
            a_base, a_mlp = f"{base}/lora_a", f"{path}/lora_a"
            if base in index and a_base in out and a_mlp in out:
                out[a_base] = jnp.concatenate(
                    [jnp.asarray(out[a_base]), jnp.asarray(out[a_mlp])],
                    axis=-2,
                )
                for leaf in ("lora_a", "lora_b", "lora_scale"):
                    out.pop(f"{path}/{leaf}", None)
    return out


def load_lora_state_dict(
    params: Params, state: Dict[str, Any], strict_shapes: bool = True
) -> Params:
    """Inverse of `lora_state_dict` (mutates and returns ``params``).

    strict_shapes=False allows replacing factors with a different rank
    (adapter switching across ranks — recompiles once downstream)."""
    index = {path: leaf for path, leaf in _walk_linears(params)}
    state = _route_split_proj_out(index, state)
    scale_paths, factor_paths = set(), {}
    for key, value in state.items():
        path, leaf_name = key.rsplit("/", 1)
        if path not in index:
            raise KeyError(f"no linear at {path!r} in params")
        tgt = index[path]
        value = jnp.asarray(value)
        if leaf_name == "lora_a":
            kernel = tgt.get("kernel", tgt.get("kernel_q"))
            if (
                kernel is not None
                and kernel.ndim == value.ndim
                and kernel.shape[-2] != value.shape[-2]
            ):
                raise ValueError(
                    f"{key}: lora_a input dim {value.shape[-2]} does not "
                    f"match the kernel's {kernel.shape[-2]} at {path!r} "
                    f"(kernel {kernel.shape}) — wrong adapter for this "
                    "model/layout?"
                )
        if (
            strict_shapes
            and tgt.get(leaf_name) is not None
            and tgt[leaf_name].shape != value.shape
        ):
            raise ValueError(
                f"{key}: shape {value.shape} != expected {tgt[leaf_name].shape}"
            )
        tgt[leaf_name] = value
        if leaf_name == "lora_scale":
            scale_paths.add(path)
        else:
            factor_paths[path] = value.shape[:-2]
    # A state dict without lora_scale entries means "scale 1.0" — reset it
    # even when the live tree already holds a (possibly deactivate()-zeroed)
    # scale, otherwise a previously-registered adapter's zeros leak into
    # this one and it becomes a silent no-op.
    for path, stack in factor_paths.items():
        if path not in scale_paths:
            index[path]["lora_scale"] = jnp.ones(stack, jnp.float32)
    return params
