"""Fused waypoint-heatmap NMS as a single Pallas TPU kernel.

The XLA formulation (ops/nms.py heatmap_nms) runs the 5 argmax+suppress
rounds as a lax.fori_loop of small fused ops over a (B, 122, 12) map —
~94 KB of data spending ~0.6 ms in op-dispatch/fusion overhead at B=16
(tools/exp_round2_perf.py nms_ms). Here the whole NMS loop runs in ONE
kernel with the map resident in VMEM, as plain 2D (B, H*W) vector ops
(3D sub-tile layouts SIGABRT the Mosaic compiler at these shapes).

Semantics are bit-faithful to ops/nms.py (itself pinned to the
reference's waypoint_pred/utils.py:8-64 incl. the circular-*distance*
wrap quirk): suppression is rectangular |dx|<=sigma_x (asymmetric
circular over the width), |dy|<=sigma_y, peaks distinct, values are the
original probabilities.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(prob_ref, out_ref, *, max_predictions: int,
                sigma: Tuple[float, float], H: int, W: int):
    """prob (blk, H*W) flattened wrapped map -> sparse map (blk, H*W)."""
    flat = prob_ref[...].astype(jnp.float32)          # (blk, N)
    blk, N = flat.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (blk, N), 1)
    ys = pos // W
    xs = pos - ys * W

    supp = flat
    out = jnp.zeros_like(flat)
    for _ in range(max_predictions):
        peak = jnp.max(supp, axis=1, keepdims=True)
        eq = supp >= peak
        idx = jnp.min(jnp.where(eq, pos, N), axis=1,
                      keepdims=True)                  # first peak
        y_mu = idx // W
        x_mu = idx - y_mu * W
        hit_y = jnp.abs(ys - y_mu).astype(jnp.float32) <= sigma[1]
        # the reference's asymmetric circular wrap (utils.py:26 quirk,
        # preserved by ops/nms.py): min(|dx|, |dx + W|) — wraps only
        # from the negative side
        dxs = xs - x_mu
        hit_x = jnp.minimum(jnp.abs(dxs), jnp.abs(dxs + W)).astype(
            jnp.float32) <= sigma[0]
        is_peak = pos == idx
        out = jnp.where(is_peak, supp, out)
        supp = jnp.where(hit_x & hit_y, 0.0, supp)
    out_ref[...] = jnp.maximum(out, 0.0).astype(out_ref.dtype)


def fused_heatmap_nms(heatmap_logits: jax.Array, max_predictions: int,
                      sigma: Tuple[float, float], *,
                      block_b: int = 16,
                      interpret: bool = False) -> jax.Array:
    """(B, A, D) raw logits -> (B, A+2, D) sparse wrapped NMS map
    (softmax values at peaks, 0 elsewhere) — softmax + circular row wrap
    run as (fused) XLA ops; the 5-round NMS loop runs as one kernel."""
    B, A, D = heatmap_logits.shape
    prob = jax.nn.softmax(
        heatmap_logits.reshape(B, A * D).astype(jnp.float32),
        axis=1).reshape(B, A, D)
    wrapped = jnp.concatenate([prob[:, A - 1:A], prob, prob[:, 0:1]],
                              axis=1)                 # (B, H, D)
    H = A + 2
    # Mosaic requires the sublane (second-to-last) block dim divisible
    # by 8 or equal to the array dim: pad the batch up to a multiple of
    # the block (zero rows NMS to zeros; sliced off below). Without this,
    # any batch not blockable by 8 — e.g. 7 live envs after one episode
    # finishes — fails to lower.
    blk = max(block_b, 8)
    while blk > 8 and B % blk:
        blk //= 2
    Bp = -(-B // blk) * blk
    flat = wrapped.reshape(B, H * D)
    if Bp != B:
        flat = jnp.pad(flat, ((0, Bp - B), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_nms_kernel, max_predictions=max_predictions,
                          sigma=tuple(sigma), H=H, W=D),
        grid=(Bp // blk,),
        in_specs=[pl.BlockSpec((blk, H * D), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, H * D), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, H * D), jnp.float32),
        interpret=interpret,
    )(flat)
    return out[:B].reshape(B, H, D)
