"""Auxiliary loss registry.

Capability target: vlnce_baselines/common/aux_losses.py:4-43 — a global
registry that accumulates named, weighted, masked losses during a forward
pass and reduces them — reimplemented functionally (explicit instance, no
module-level singleton mutation inside jit; losses are jnp scalars).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


class AuxLosses:
    def __init__(self):
        self._losses: Dict[str, jnp.ndarray] = {}
        self._weights: Dict[str, float] = {}
        self._active = False

    def clear(self):
        self._losses.clear()
        self._weights.clear()

    def activate(self):
        self._active = True

    def deactivate(self):
        self._active = False

    @property
    def is_active(self) -> bool:
        return self._active

    def register(self, name: str, loss, weight: float = 1.0, mask=None):
        if not self._active:
            return
        loss = jnp.asarray(loss)
        if mask is not None:
            mask = jnp.asarray(mask, loss.dtype)
            loss = (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = loss.mean()
        self._losses[name] = loss
        self._weights[name] = weight

    def reduce(self, mask=None) -> jnp.ndarray:
        total = jnp.float32(0.0)
        for name, loss in self._losses.items():
            total = total + self._weights[name] * loss
        return total

    def get(self, name: str):
        return self._losses[name]
