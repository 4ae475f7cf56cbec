"""Named LoRA adapter registry (peft ``set_adapters`` equivalent).

The reference supports multiple named LoRA adapters selected at generate
time by condition type: ``pipeline.set_adapters(conditions[0].condition_type)``
(/root/reference/src/flux/generate.py:279), with peft storing each adapter's
factors per module under its name.

TPU-first design: the compiled model consumes exactly ONE set of
``(lora_a, lora_b, lora_scale)`` leaves inside the param tree — swapping
the *values* of those leaves is a host-side pytree update that reuses the
compiled executable (shapes are unchanged while ranks match; a different
rank recompiles once).  The registry stores each adapter as a flat LoRA
state dict (the `train/lora.lora_state_dict` layout) plus a scale.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from loongx_tpu.train.lora import (
    Params,
    _walk_linears,
    load_lora_state_dict,
    lora_state_dict,
)


class AdapterRegistry:
    """Holds named LoRA adapters and activates one into a param tree."""

    def __init__(self):
        self._adapters: Dict[str, Tuple[Dict[str, Any], Optional[float]]] = {}

    def add(
        self, name: str, state: Dict[str, Any], scale: Optional[float] = None
    ) -> None:
        """Register a flat {path/lora_a|lora_b[|lora_scale]: array} adapter.

        scale=None keeps the state's own lora_scale entries (the trained
        alpha/r scaling) or 1.0 where absent; a float overrides them all."""
        if not state:
            raise ValueError(f"adapter {name!r}: empty state dict")
        self._adapters[name] = (
            dict(state), None if scale is None else float(scale)
        )

    def add_from_params(
        self, name: str, params: Params, scale: Optional[float] = None
    ):
        """Capture the LoRA leaves currently in ``params`` as an adapter."""
        self.add(name, lora_state_dict(params), scale)

    def names(self):
        return list(self._adapters)

    def __contains__(self, name: str) -> bool:
        return name in self._adapters

    def activate(self, params: Params, name: str) -> Params:
        """Return ``params`` with adapter ``name``'s factors and scale set.

        All other lora scales are zeroed first, so switching between
        adapters that target different module sets (or ranks) never blends
        them.  Raises KeyError (listing available names) for unknown
        adapters — peft's set_adapters behaves the same way.
        """
        if name not in self._adapters:
            raise KeyError(
                f"unknown adapter {name!r}; registered: {self.names()}"
            )
        state, scale = self._adapters[name]
        params = self.deactivate(params)  # kill any stale adapter's leaves
        params = load_lora_state_dict(params, state, strict_shapes=False)
        covered = {k.rsplit("/", 1)[0] for k in state}
        for lpath, leaf in _walk_linears(params):
            if lpath not in covered:
                continue
            stack = leaf["lora_a"].shape[:-2]
            if scale is not None:
                leaf["lora_scale"] = jnp.full(stack, scale, jnp.float32)
            elif f"{lpath}/lora_scale" not in state:
                leaf["lora_scale"] = jnp.full(stack, 1.0, jnp.float32)
            # else: the state dict's own lora_scale was just loaded
        return params

    def deactivate(self, params: Params) -> Params:
        """Zero every lora_scale — the enable_lora(False) equivalent
        (reference lora_controller.py:5-42) without removing leaves."""
        params = jax.tree.map(lambda x: x, params)
        for _, leaf in _walk_linears(params):
            if "lora_scale" in leaf:
                leaf["lora_scale"] = jnp.zeros_like(leaf["lora_scale"])
        return params
