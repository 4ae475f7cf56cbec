"""The jitted training step: flow-matching loss over LoRA parameters.

Equivalent of the reference's ``OminiModel.step`` + Lightning plumbing
(/root/reference/src/train/model.py:560-729), TPU-first:

  * params are partitioned into (trainable, frozen) sub-trees; gradients are
    taken only over the trainable leaves (LoRA factors, optionally the CS3
    encoders + DGF — the reference computes encoder grads but never updates
    them since only lora_layers reach the optimizer, model.py:533-543; we
    make that an explicit choice);
  * one jit-compiled step; gradient accumulation via optax.MultiSteps
    (reference: Lightning accumulate_grad_batches, train.py:183);
  * data parallelism = batch-axis NamedSharding over the mesh's "data" axis;
    XLA derives the gradient all-reduce over ICI (vs. NCCL DDP).

VAE/text encoding is *not* in this step — like the reference's no_grad
region, it runs in a separate jitted prepare pass (see data pipeline).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from loongx_tpu.models.flux.model import FluxConfig, flux_forward
from loongx_tpu.models.encoders import (
    eeg_encode, ppg_encode, fnirs_encode, motion_encode,
)
from loongx_tpu.models.fusion import (
    fuse_eeg_ppg, fuse_fnirs_motion, fuse_text_train,
)
from loongx_tpu.ops.schedule import flow_match_xt

# ---------------------------------------------------------------------------
# Partition / combine (trainable vs frozen leaves)
# ---------------------------------------------------------------------------


def partition(params, mask) -> Tuple[Any, Any]:
    """Split into (trainable, frozen) trees; the complementary positions hold
    None (JAX treats None as an empty subtree, so grad/optax skip them)."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def combine(trainable, frozen):
    return jax.tree.map(
        lambda a, b: b if a is None else a, trainable, frozen,
        is_leaf=lambda x: x is None,
    )


def trainable_mask(params: Dict[str, Any], train_encoders: bool = False):
    """Mask over the *pipeline* param tree: LoRA leaves of the flux tree,
    plus (optionally) all encoder/DGF leaves."""
    from loongx_tpu.train.lora import lora_mask

    mask = {k: jax.tree.map(lambda _: False, v) for k, v in params.items()}
    mask["flux"] = lora_mask(params["flux"])
    if train_encoders:
        for name in ("encoders", "dgf"):
            if name in params:
                mask[name] = jax.tree.map(lambda _: True, params[name])
    return mask


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def flow_match_loss(
    params: Dict[str, Any],
    flux_cfg: FluxConfig,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    flags: Dict[str, Any],
    use_brain_condition: bool,
    fuse_flag: bool,
    attn_backend: str,
    remat: bool,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One flow-matching MSE step (reference model.py:569-729).

    batch: x0 [B,S,C] clean packed latents; img_ids/txt_ids; prompt_embeds /
    pooled; optional cond_tokens/cond_ids; optional eeg/fnirs/ppg/motion.
    """
    x0 = batch["x0"].astype(jnp.float32)
    b = x0.shape[0]
    k_t, k_noise, k_drop = jax.random.split(key, 3)

    # t ~ sigmoid(N(0,1)); x_t = (1-t) x0 + t x1 (model.py:594-597)
    t = jax.nn.sigmoid(jax.random.normal(k_t, (b,), jnp.float32))
    x1 = jax.random.normal(k_noise, x0.shape, jnp.float32)
    x_t = flow_match_xt(x0, x1, t).astype(dtype)

    prompt_embeds = batch["prompt_embeds"].astype(dtype)
    pooled = batch["pooled"].astype(dtype)

    if use_brain_condition and "eeg" in batch:
        enc, dgf = params["encoders"], params["dgf"]
        # rng wired through => the encoders' 0.3 dropout is ACTIVE during
        # training, matching the reference's nn.Dropout(0.3) regime
        ke, kp, kf, km = jax.random.split(k_drop, 4)
        eeg_feat = eeg_encode(enc["eeg"], batch["eeg"].astype(dtype), rng=ke)
        brain_prompt = (
            fuse_eeg_ppg(
                dgf, eeg_feat,
                ppg_encode(enc["ppg"], batch["ppg"].astype(dtype), rng=kp),
            )
            if "ppg" in batch else eeg_feat
        )
        # fNIRS may be absent per-sample (the reference guards 'FNIRS' in
        # bio_data, data.py:81); without it the pooled embeds stay textual
        brain_pooled = None
        if "fnirs" in batch:
            fnirs_feat = fnirs_encode(
                enc["fnirs"], batch["fnirs"].astype(dtype), rng=kf
            )
            brain_pooled = (
                fuse_fnirs_motion(
                    dgf, fnirs_feat,
                    motion_encode(
                        enc["motion"], batch["motion"].astype(dtype), rng=km
                    ),
                )
                if "motion" in batch else fnirs_feat
            )
        if fuse_flag:
            # brain_pooled=None skips the pooled-fusion branch inside
            # fuse_text_train (no placeholder DUAN compute)
            prompt_embeds, pooled = fuse_text_train(
                dgf, prompt_embeds, pooled, brain_prompt, brain_pooled
            )
        else:
            prompt_embeds = brain_prompt.astype(dtype)
            if brain_pooled is not None:
                pooled = brain_pooled.astype(dtype)

    guidance = jnp.ones((b,), jnp.float32) if flux_cfg.guidance_embeds else None
    cond = batch.get("cond_tokens")
    pred = flux_forward(
        params["flux"], flux_cfg,
        img=x_t,
        txt=prompt_embeds,
        pooled=pooled,
        timestep=t,
        guidance=guidance,
        img_ids=batch["img_ids"],
        txt_ids=batch["txt_ids"],
        cond=None if cond is None else cond.astype(dtype),
        cond_ids=batch.get("cond_ids"),
        flags=flags,
        attn_backend=attn_backend,
        remat=remat,
    )
    target = x1 - x0  # velocity target (model.py:727)
    loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
    return loss, jnp.mean(t)


# ---------------------------------------------------------------------------
# Train step factory
# ---------------------------------------------------------------------------


class TrainState(NamedTuple):
    trainable: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_step(
    flux_cfg: FluxConfig,
    optimizer: optax.GradientTransformation,
    flags: Optional[Dict[str, Any]] = None,
    use_brain_condition: bool = False,
    fuse_flag: bool = True,
    attn_backend: str = "auto",
    remat: bool = True,
    grad_clip: float = 0.5,
    dtype=jnp.bfloat16,
):
    """Build (init_fn, step_fn).

    step_fn(state, frozen, batch, key) -> (state, metrics) — jit it (or
    jit with shardings) at the call site.  grad_clip matches the reference's
    gradient_clip_val=0.5 (train.py:184).
    """
    flags = dict(flags or {})
    # grad_clip=None/0 means the caller already handles clipping (e.g. the
    # train loop clips inside its MultiSteps chain so the ACCUMULATED
    # gradient is clipped once, matching Lightning's gradient_clip_val)
    tx = (
        optax.chain(optax.clip_by_global_norm(grad_clip), optimizer)
        if grad_clip
        else optimizer
    )

    def init_fn(trainable) -> TrainState:
        return TrainState(
            trainable=trainable,
            opt_state=tx.init(trainable),
            step=jnp.zeros([], jnp.int32),
        )

    def step_fn(state: TrainState, frozen, batch, key):
        def loss_fn(trainable):
            params = combine(trainable, frozen)
            return flow_match_loss(
                params, flux_cfg, batch, key, flags,
                use_brain_condition, fuse_flag, attn_backend, remat, dtype,
            )

        (loss, t_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "t_mean": t_mean,
        }
        return (
            TrainState(trainable, opt_state, state.step + 1),
            metrics,
        )

    return init_fn, step_fn
