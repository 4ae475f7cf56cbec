"""The full training loop (L5 orchestration).

Equivalent of the reference's ``src/train/train.py`` main()
(/root/reference/src/train/train.py:51-217): config -> dataset -> model ->
step loop with grad accumulation, clipping, callbacks, wall-clock timing —
but as one process driving a device mesh (the ``accelerate launch`` +
Lightning-DDP pair collapses into NamedSharding over the "data" axis), with
optimizer-state resume the reference lacks.
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from loongx_tpu.config import Config
from loongx_tpu.data import build_dataset, iterate_batches
from loongx_tpu.models.pipeline import LoongXPipeline
from loongx_tpu.parallel import make_mesh, shard_params, shard_batch
from loongx_tpu.train.callbacks import TrainingCallback
from loongx_tpu.train.lora import add_lora
from loongx_tpu.train.optim import build_optimizer
from loongx_tpu.train.prepare import prepare_batch
from loongx_tpu.train.step import (
    make_train_step, partition, trainable_mask,
)
from loongx_tpu.utils.checkpoint import (
    latest_checkpoint, load_fingerprint, load_train_checkpoint,
)


def train(
    config: Config,
    pipeline: Optional[LoongXPipeline] = None,
    dataset=None,
    max_steps: Optional[int] = None,
    resume: bool = True,
    use_wandb: Optional[bool] = None,
) -> Dict[str, Any]:
    """Run training per config.  Returns summary metrics.

    ``pipeline``/``dataset`` injectable for tests; by default built from the
    config (pretrained weights dir via config.flux_path)."""
    tcfg = config.train
    np.random.seed(tcfg.seed)
    run_name = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")

    if dataset is None:
        dataset = build_dataset(tcfg)

    # staged text encoding (train.staged_text): encode ALL dataset prompts
    # with only T5/CLIP resident, free them, then bring in the DiT — the
    # training mirror of the 12B serving staging (cli/infer.py
    # staged_text_encode); see build_text_cache for why this is required at
    # full scale and why it is numerically free
    text_cache = None
    if tcfg.staged_text:
        from loongx_tpu.train.prepare import build_text_cache

        descs = (
            dataset.descriptions() if hasattr(dataset, "descriptions")
            else [dataset[i].get("description", "")
                  for i in range(len(dataset))]
        )
        if pipeline is None:
            import gc

            text_pipe = LoongXPipeline.from_pretrained(
                config.flux_path, components=("t5", "clip")
            )
            text_cache = build_text_cache(text_pipe, descs)
            text_pipe.free_text_encoders()
            del text_pipe
            gc.collect()
            print(f"[train] staged_text: {len(text_cache[0])} prompts "
                  "cached; text encoders freed")
            pipeline = LoongXPipeline.from_pretrained(
                config.flux_path,
                components=("flux", "vae", "encoders", "dgf"),
            )
        else:
            # injected pipeline (tests): cache from it, then free
            text_cache = build_text_cache(pipeline, descs)
            pipeline.free_text_encoders()
    elif pipeline is None:
        pipeline = LoongXPipeline.from_pretrained(config.flux_path)

    # mesh: all devices data-parallel (+ optional tensor axis from config).
    # ``mesh.data`` pins the data-axis extent to a device SUBSET (e.g.
    # data: 1 trains single-device on a multi-device host — the tiny CPU
    # rehearsal uses this; unset = all devices).
    tensor = int(config.mesh.get("tensor", 1)) if config.mesh else 1
    data = int(config.mesh.get("data", 0)) if config.mesh else 0
    devices = jax.devices()
    if data > 0:
        if data * tensor > len(devices):
            raise RuntimeError(
                f"config mesh {data}x{tensor} needs {data * tensor} devices; "
                f"{len(devices)} available"
            )
        devices = devices[: data * tensor]
    mesh = make_mesh(data=-1, tensor=tensor, devices=devices)

    # LoRA injection (reference init_lora, model.py:513-524)
    lcfg = tcfg.lora_config
    pipeline.params["flux"] = add_lora(
        jax.random.key(tcfg.seed), pipeline.params["flux"],
        r=lcfg.r, alpha=lcfg.lora_alpha, dtype=pipeline.dtype,
    )
    mask = trainable_mask(
        pipeline.params, train_encoders=tcfg.train_encoders
    )
    trainable, frozen = partition(pipeline.params, mask)

    accum = max(1, tcfg.accumulate_grad_batches)
    # clip INSIDE MultiSteps: the reference (Lightning gradient_clip_val)
    # clips the ACCUMULATED gradient once per optimizer step; chaining the
    # clip outside would clip each micro-gradient before averaging.
    # Lightning semantics for the value itself: None/0 disables clipping
    # (clip_by_global_norm(0.0) would zero every update).
    tx = build_optimizer(tcfg.optimizer)
    if tcfg.gradient_clip_val:
        tx = optax.chain(
            optax.clip_by_global_norm(tcfg.gradient_clip_val), tx
        )
    optimizer = optax.MultiSteps(tx, every_k_schedule=accum)
    use_brain = tcfg.dataset.type.lower() == "seed"
    if use_brain and "encoders" not in pipeline.params:
        # fail at setup with the real constraint, not a KeyError('encoders')
        # inside the first traced train step
        raise RuntimeError(
            "dataset.type='seed' trains with biosignal conditioning, but "
            "the pipeline has no 'encoders' (CS3) params — load a checkpoint "
            "converted with the biosignal components, or use a spatial "
            "dataset type"
        )
    init_fn, step_fn = make_train_step(
        pipeline.flux_cfg,
        optimizer,
        flags=config.model.to_dict(),
        use_brain_condition=use_brain,
        fuse_flag=True,
        remat=tcfg.gradient_checkpointing,
        grad_clip=None,  # clipping lives inside the MultiSteps chain above
        dtype=pipeline.dtype,
    )
    state = init_fn(trainable)
    start_step = 0
    # Config facts that must match across a resume: restoring a checkpoint
    # from a run with a different LoRA rank / dataset / optimizer under the
    # same save_path would fail deep inside orbax restore or silently adopt
    # the wrong experiment's optimizer state.
    fingerprint = {
        "lora_r": lcfg.r,
        "lora_alpha": lcfg.lora_alpha,
        "dataset_type": tcfg.dataset.type,
        "optimizer": tcfg.optimizer.type,
        "condition_type": tcfg.condition_type,
        "accumulate_grad_batches": tcfg.accumulate_grad_batches,
        # the skip_batches/fold_in resume continuity depends on both: a
        # changed batch size or seed would fast-forward a DIFFERENT stream
        "batch_size": tcfg.batch_size,
        "seed": tcfg.seed,
        # changes the trainable tree structure — a resume across this flag
        # would fail deep inside orbax restore
        "train_encoders": tcfg.train_encoders,
        "flux_blocks": [pipeline.flux_cfg.num_double_blocks,
                        pipeline.flux_cfg.num_single_blocks],
    }
    if resume:
        # resume from the newest run under save_path, if any
        for prior in sorted(os.listdir(tcfg.save_path) if os.path.isdir(tcfg.save_path) else [], reverse=True):
            prior_orbax = os.path.join(tcfg.save_path, prior, "orbax")
            ck = latest_checkpoint(prior_orbax)
            if ck:
                prior_fp = load_fingerprint(prior_orbax)
                if prior_fp is not None and prior_fp != fingerprint:
                    diff = {
                        k: (prior_fp.get(k), fingerprint.get(k))
                        for k in set(prior_fp) | set(fingerprint)
                        if prior_fp.get(k) != fingerprint.get(k)
                    }
                    raise RuntimeError(
                        f"refusing to resume from {ck}: its config "
                        f"fingerprint mismatches the current config "
                        f"(saved vs current): {diff}. Pass resume=False or "
                        f"use a fresh save_path for the new configuration."
                    )
                if prior_fp is None:
                    print(f"[train] warning: {prior_orbax} has no config "
                          "fingerprint (pre-fingerprint run) — resuming "
                          "without a compatibility check")
                t, o, start_step = load_train_checkpoint(
                    ck, {"trainable": state.trainable, "opt_state": state.opt_state}
                )
                # state.step counts MICRO batches (step_fn increments per
                # call); the checkpoint stores the OPTIMIZER step
                state = state._replace(trainable=t, opt_state=o,
                                       step=jnp.asarray(start_step * accum))
                print(f"[train] resumed from {ck} @ step {start_step}")
                break

    frozen = shard_params(frozen, mesh)
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    # rebind the pipeline to the SHARDED frozen leaves: the unsharded
    # originals would otherwise stay pinned on the default device for the
    # whole run beside the sharded copies — a second full frozen DiT (~12 GB
    # int8 / 24 GB bf16 at full scale) of pure waste.  The trainable leaves
    # here alias `state` and die on the first donated step — anything that
    # reads them mid-run must merge live values over them (the probe's
    # trainable_view does); the tree is repaired with the FINAL trained
    # weights before returning.
    from loongx_tpu.train.step import combine as _combine

    pipeline.params = _combine(trainable, frozen)
    step_jit = jax.jit(step_fn, donate_argnums=(0,))

    # periodic visual-regression probe from the first dataset sample
    # (reference generate_a_sample, callbacks.py:91-328)
    sample_fn = None
    if tcfg.sample_interval and len(dataset) > 0:
        try:
            from loongx_tpu.train.sampling_probe import SampleProbe

            probe_sample = dataset[0]
            # canonical pkl keys ('Motion', not 'MOTION' — SampleProbe and
            # cli/infer.py read exactly these)
            biosig = {
                key: probe_sample[k]
                for k, key in (("eeg", "EEG"), ("fnirs", "FNIRS"),
                               ("ppg", "PPG"), ("motion", "Motion"))
                if probe_sample.get(k) is not None
            }
            if biosig and "encoders" not in pipeline.params:
                # a dataset that carries biosignals but a pipeline without
                # CS3 encoders (spatial-control configs) — probing with the
                # signals would fail at every interval
                print("[train] probe: pipeline has no biosignal encoders — "
                      "probing without the sample's signals")
                biosig = {}
            latest = {"state": state}  # updated each step below
            sample_fn = SampleProbe(
                pipeline,
                condition_type=tcfg.condition_type,
                probe_image=probe_sample.get("condition"),
                prompt=probe_sample.get("description", ""),
                biosignals=biosig or None,
                out_dir=os.path.join(tcfg.save_path, run_name, "samples"),
                size=tcfg.dataset.target_size,
                # probes render with the CURRENT LoRA weights, not the init
                trainable_view=lambda: latest["state"].trainable,
            )
        except Exception as exc:
            print(f"[train] sample probe unavailable: {exc}")

    # rank-0 gating (the reference's Lightning plumbing logs on rank 0 only,
    # train.py:71-73): every host would otherwise open its own wandb run and
    # print duplicate logs
    is_main = jax.process_index() == 0
    callback = TrainingCallback(
        run_name=run_name,
        save_path=tcfg.save_path,
        save_interval=tcfg.save_interval,
        sample_interval=tcfg.sample_interval,
        use_wandb=(use_wandb if use_wandb is not None else bool(tcfg.wandb))
        and is_main,
        wandb_config=tcfg.wandb,
        sample_fn=sample_fn,
        frozen=frozen,
        fingerprint=fingerprint,
        print_interval=10 if is_main else 0,
    )

    # max_steps counts OPTIMIZER steps like the reference's Lightning
    # Trainer(max_steps=..., accumulate_grad_batches=...): with accumulation
    # the loop runs max_steps * accum micro-batches
    total = tcfg.max_steps if max_steps is None else max_steps
    if total is None or total < 0:  # reference: max_steps -1 == unlimited
        total = float("inf")
    total_micro = total * accum
    start_micro = start_step * accum
    # resume: decorrelate the noise/timestep stream from the consumed prefix
    # (restarting key(seed) would replay the exact draws of steps 0..start)
    key = jax.random.key(tcfg.seed)
    if start_step:
        key = jax.random.fold_in(key, start_step)
    t0 = time.time()
    micro = start_micro
    metrics = {}
    batches = iterate_batches(
        dataset, tcfg.batch_size, seed=tcfg.seed,
        num_workers=tcfg.dataloader_workers,
        host_id=jax.process_index(), num_hosts=jax.process_count(),
        # fast-forward past the batches a resumed run already consumed so
        # the data order continues instead of replaying from epoch 0
        skip_batches=start_micro,
    )

    def device_batches():
        for host_batch in batches:
            batch = prepare_batch(
                pipeline, host_batch,
                position_scale=tcfg.dataset.position_scale,
                text_cache=text_cache,
            )
            yield shard_batch(batch, mesh)

    from loongx_tpu.data.loader import background_iter

    # one-deep lookahead: the next batch's decode + frozen-encoder pass
    # overlaps the current train step.  The guard BEFORE building the
    # iterator matters: at total_micro <= start_micro (max_steps=0, resume at
    # completion) the prefetch would otherwise decode + VAE/T5-encode a full
    # batch just to discard it.
    window = []  # per-micro metrics of the current accumulation span
    # mesh_context: with a non-trivial data axis the Pallas kernels (flash
    # attention fwd/bwd, int8 quant custom_vjp) run per-shard via shard_map
    # instead of falling back to XLA math — multi-device training keeps the
    # same kernels that make single-chip QLoRA fast.  Trace-time routing:
    # the context must wrap the step call that triggers compilation.
    # tensor_axis=None: the TP quant wrappers are SERVING-ONLY (no
    # custom_vjp, parallel/tp_quant.py) — activating the tensor axis here
    # would route frozen stacked-int8 layers through a non-differentiable
    # pallas_call and fail at the first grad trace.  Training under a
    # tensor>1 mesh keeps the differentiable kernels (data-axis shard_map /
    # XLA dequant), with GSPMD resharding the TP-placed weights.
    from loongx_tpu.parallel.mesh import mesh_context

    if total_micro > start_micro:
        with mesh_context(mesh, tensor_axis=None):
            for batch in background_iter(device_batches(), depth=1):
                if micro >= total_micro:
                    break
                key, sub = jax.random.split(key)
                state, metrics = step_jit(state, frozen, batch, sub)
                if sample_fn is not None:
                    latest["state"] = state
                window.append(metrics)
                micro += 1
                if micro % accum == 0:
                    # callbacks fire per OPTIMIZER step (Lightning
                    # global_step): save_interval / sample_interval / wandb
                    # "steps" count them.  Loss/grad-norm average over the
                    # span (the optimizer saw the MEAN of these micro-grads;
                    # the mean of their norms bounds the accumulated norm
                    # the clip acted on — the last micro alone reflected
                    # ~1/accum of the step)
                    agg = dict(metrics)
                    for k in ("loss", "grad_norm"):
                        if k in metrics:
                            agg[k] = jnp.mean(
                                jnp.stack([w[k] for w in window])
                            )
                    window.clear()
                    callback.on_step_end(micro // accum, agg, state)
    step = micro // accum
    wall = time.time() - t0
    if is_main:
        print(f"[train] {step - start_step} optimizer steps "
              f"({micro - start_micro} micro-batches) in {wall:.1f}s "
              f"({(micro - start_micro) / max(wall, 1e-9):.2f} micro-steps/s)")
    callback.save_checkpoint(step, state)
    # repair the trainable aliases step_jit donated away, and expose the
    # FINAL trained weights — callers keep using the pipeline after train()
    # (the reference trains its torch modules in place)
    pipeline.params = _combine(state.trainable, frozen)
    return {"steps": step, "wall_s": wall,
            "final_loss": float(metrics.get("loss", np.nan)) if metrics else None}
