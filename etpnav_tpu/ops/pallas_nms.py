"""Fused waypoint-heatmap NMS as a single Pallas TPU kernel.

The XLA formulation (ops/nms.py heatmap_nms) runs the 5 argmax+suppress
rounds as a lax.fori_loop of small fused ops over a (B, 122, 12) map —
~94 KB of data spending ~0.6 ms in op-dispatch/fusion overhead at B=16
(tools/exp_round2_perf.py nms_ms). Here the whole post-heatmap chain
(softmax over the full map -> circular wrap rows -> iterative NMS) runs
in ONE kernel with the map resident in VMEM.

Semantics are bit-faithful to ops/nms.py (itself pinned to the
reference's waypoint_pred/utils.py:8-64 incl. the circular-*distance*
wrap quirk): suppression is rectangular |dx|<=sigma_x (circular over the
wrapped width), |dy|<=sigma_y, peaks distinct, values are the original
softmax probabilities.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(logits_ref, out_ref, *, max_predictions: int,
                sigma: Tuple[float, float], A: int, D: int):
    """logits (blk, A, D) raw heatmap logits -> sparse wrapped-map
    (blk, A+2, D) with up to max_predictions peaks (softmax values)."""
    x = logits_ref[...].astype(jnp.float32)            # (blk, A, D)
    # softmax over the whole (A*D) map per batch element
    m = jnp.max(x, axis=(1, 2), keepdims=True)
    e = jnp.exp(x - m)
    prob = e / jnp.sum(e, axis=(1, 2), keepdims=True)
    # circular wrap rows: [last, 0..A-1, first] along the angle axis
    wrapped = jnp.concatenate(
        [prob[:, A - 1:A], prob, prob[:, 0:1]], axis=1)  # (blk, H, D)
    H = A + 2
    blk = wrapped.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (blk, H, D), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (blk, H, D), 2)
    flat_pos = ys * D + xs

    supp = wrapped
    out = jnp.zeros_like(wrapped)
    for _ in range(max_predictions):
        peak = jnp.max(supp, axis=(1, 2), keepdims=True)
        eq = supp >= peak
        # first (row-major) peak position
        idx = jnp.min(jnp.where(eq, flat_pos, jnp.float32(H * D)),
                      axis=(1, 2), keepdims=True)
        y_mu = jnp.floor(idx / D)
        x_mu = idx - y_mu * D
        hit_y = jnp.abs(ys - y_mu) <= sigma[1]
        # the reference's asymmetric circular wrap (utils.py:26 quirk,
        # preserved by ops/nms.py): min(|dx|, |dx + W|) — wraps only
        # from the negative side
        dxs = xs - x_mu
        hit_x = jnp.minimum(jnp.abs(dxs),
                            jnp.abs(dxs + D)) <= sigma[0]
        is_peak = flat_pos == idx
        out = jnp.where(is_peak, supp, out)
        supp = jnp.where(hit_x & hit_y, 0.0, supp)
    out_ref[...] = jnp.maximum(out, 0.0).astype(out_ref.dtype)


def fused_heatmap_nms(heatmap_logits: jax.Array, max_predictions: int,
                      sigma: Tuple[float, float], *,
                      block_b: int = 16,
                      interpret: bool = False) -> jax.Array:
    """(B, A, D) raw logits -> (B, A+2, D) sparse wrapped NMS map
    (softmax values at peaks, 0 elsewhere) — equivalent to
    softmax -> wrap -> ops/nms.heatmap_nms in one kernel."""
    B, A, D = heatmap_logits.shape
    blk = max(block_b, 1)
    while blk > 1 and B % blk:
        blk //= 2
    return pl.pallas_call(
        functools.partial(_nms_kernel, max_predictions=max_predictions,
                          sigma=tuple(sigma), A=A, D=D),
        grid=(B // blk,),
        in_specs=[pl.BlockSpec((blk, A, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, A + 2, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, A + 2, D), jnp.float32),
        interpret=interpret,
    )(heatmap_logits)
