"""Auxiliary loss registry.

Capability target: vlnce_baselines/common/aux_losses.py:4-43 — a global
registry that accumulates named, weighted losses during a forward pass and
reduces them under a validity mask — reimplemented functionally (explicit
instance, no module-level singleton mutation inside jit; losses are jnp
arrays; the reference's ``torch.masked_select(...).mean()`` becomes a
where-sum / count masked mean so it stays jit-compatible at static shapes).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def _masked_mean(loss: jnp.ndarray, mask) -> jnp.ndarray:
    if mask is None:
        return loss.mean()
    mask = jnp.broadcast_to(jnp.asarray(mask, loss.dtype), loss.shape)
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class AuxLosses:
    def __init__(self):
        self._losses: Dict[str, jnp.ndarray] = {}
        self._masks: Dict[str, Optional[jnp.ndarray]] = {}
        self._weights: Dict[str, float] = {}
        self._active = False

    def clear(self):
        self._losses.clear()
        self._masks.clear()
        self._weights.clear()

    def activate(self):
        self._active = True

    def deactivate(self):
        self._active = False

    @property
    def is_active(self) -> bool:
        return self._active

    def register(self, name: str, loss, weight: float = 1.0, mask=None):
        """Record an unreduced per-element loss (register_loss,
        aux_losses.py:14-19). ``mask`` optionally pre-binds a validity mask
        for this loss; it composes with the mask later given to reduce()."""
        if not self._active:
            return
        self._losses[name] = jnp.asarray(loss)
        self._masks[name] = None if mask is None else jnp.asarray(mask)
        self._weights[name] = weight

    def reduce(self, mask=None) -> jnp.ndarray:
        """Weighted sum of masked means (aux_losses.py:25-32): each loss is
        averaged over elements where BOTH its registration mask and the
        reduce-time ``mask`` are live."""
        total = jnp.float32(0.0)
        for name, loss in self._losses.items():
            m = self._masks[name]
            if mask is not None:
                rm = jnp.broadcast_to(
                    jnp.asarray(mask, loss.dtype), loss.shape)
                m = rm if m is None else (
                    jnp.broadcast_to(m.astype(loss.dtype), loss.shape) * rm)
            total = total + self._weights[name] * _masked_mean(loss, m)
        return total

    def get(self, name: str):
        """The raw registered loss array (get_loss, aux_losses.py:21-22)."""
        return self._losses[name]
