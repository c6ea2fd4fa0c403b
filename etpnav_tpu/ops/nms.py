"""Heatmap NMS for waypoint extraction, static-shaped for TPU.

Replicates the reference's iterative argmax + rectangular suppression
(waypoint_pred/utils.py:8-64) and the candidate extraction that the policy
does host-side with .nonzero() (Policy_ViewSelection_ETP.py:220-318) — but
as fixed-shape jitted ops: no host round-trips, no dynamic shapes.

Geometry notes (kept bit-identical to the reference, including its quirk of
applying circular wrap to the *distance* axis): the heatmap is (B, H, W)
with H = angles (122 after wrap rows), W = distances (12); suppression
removes |dx| <= sigma_x (circular, period W) and |dy| <= sigma_y around each
selected peak; the peak itself is suppressed so all selections are distinct.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _suppression_mask(x_mu: jax.Array, y_mu: jax.Array, width: int,
                      height: int, sigma: Tuple[float, float],
                      circular_x: bool) -> jax.Array:
    """(B,) peak coords -> (B, H, W) 1.0 where suppressed.
    Mirrors neighborhoods() (waypoint_pred/utils.py:8-34, gaussian=False)."""
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    x_diff = xs - x_mu[:, None, None].astype(jnp.float32)
    y_diff = ys - y_mu[:, None, None].astype(jnp.float32)
    if circular_x:
        x_diff = jnp.minimum(jnp.abs(x_diff), jnp.abs(x_diff + width))
    else:
        x_diff = jnp.abs(x_diff)
    hit = jnp.logical_and(x_diff <= sigma[0], jnp.abs(y_diff) <= sigma[1])
    return hit.astype(jnp.float32)


def heatmap_nms(prob: jax.Array, max_predictions: int = 5,
                sigma: Tuple[float, float] = (7.0, 5.0),
                circular_x: bool = True) -> jax.Array:
    """Iterative argmax NMS. prob: (B, H, W) -> sparse (B, H, W) map holding
    the original values at up to `max_predictions` distinct peaks, 0 elsewhere.
    """
    B, H, W = prob.shape
    flat = prob.reshape(B, -1)

    def body(_, carry):
        supp, out = carry
        ix = jnp.argmax(supp, axis=1)                       # (B,)
        val = jnp.take_along_axis(flat, ix[:, None], axis=1)
        out = out.at[jnp.arange(B), ix].set(val[:, 0])
        y = ix // W
        x = ix % W
        g = _suppression_mask(x, y, W, H, sigma, circular_x)
        supp = supp * (1.0 - g.reshape(B, -1))
        return supp, out

    supp0 = flat.astype(jnp.float32)
    out0 = jnp.zeros_like(supp0)
    _, out = jax.lax.fori_loop(0, max_predictions, body, (supp0, out0))
    out = jnp.maximum(out, 0.0)
    return out.reshape(B, H, W).astype(prob.dtype)


def extract_candidates(nms_map: jax.Array, max_candidates: int
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-shape analogue of `batch_output_map[j].nonzero()` ordered
    row-major (angle ascending, the torch nonzero order).

    nms_map: (B, A, D) sparse map (already de-wrapped to 120 angle rows).
    Returns (angle_idx, dist_idx, valid) each (B, max_candidates);
    invalid slots hold index 0 and valid=False.
    """
    B, A, D = nms_map.shape
    flat = nms_map.reshape(B, -1)
    valid = flat > 0
    order_key = jnp.where(
        valid, jnp.arange(A * D, dtype=jnp.int32)[None, :], A * D)
    # ascending sort puts valid entries (in row-major order) first
    sorted_key = jnp.sort(order_key, axis=1)[:, :max_candidates]
    is_valid = sorted_key < A * D
    idx = jnp.where(is_valid, sorted_key, 0)
    return idx // D, idx % D, is_valid
