"""Fused biased multi-head attention as a Pallas TPU kernel.

The planner's attentions all take an additive bias (padding masks, the
graph spatial-relation bias, the waypoint predictor's circular neighbor
mask — see ops/attention.py). The XLA path materializes the (B, H, Lq, Lk)
logit tensor in HBM twice (pre/post softmax); at ETPNav's sequence lengths
(<=200) the whole per-(batch, head) problem fits in VMEM, so this kernel
computes QK^T + bias -> softmax -> PV entirely on-chip: one HBM read per
operand, one write for the output.

Grid: (B, H); each program handles one (batch, head) pair. The bias is
(B, Lq, Lk) — shared across heads, matching how the planner builds it —
so its block index ignores the head coordinate.

Training support: custom VJP whose backward recomputes via the plain XLA
formulation (attention backward is matmul-dominated; XLA fuses it well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    """One program per batch element; all H heads as one batched matmul
    (head-count ~12, L <= 256: everything fits VMEM)."""
    q = q_ref[0]                                   # (H, Lq, hd)
    k = k_ref[0]                                   # (H, Lk, hd)
    v = v_ref[0]                                   # (H, Lk, hd)
    bias = bias_ref[0].astype(jnp.float32)         # (Lq, Lk)

    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),        # (H, Lq, Lk)
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (H, Lq, hd)
    out_ref[0] = (ctx / denom).astype(out_ref.dtype)


def _attention_xla(q, k, v, bias, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[:, None].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_bias_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         bias: jax.Array, scale: float,
                         interpret: bool = False) -> jax.Array:
    """q (B,H,Lq,hd), k/v (B,H,Lk,hd), bias (B,Lq,Lk) -> (B,H,Lq,hd)."""
    return _fused_fwd_impl(q, k, v, bias, scale, interpret)


def _fused_fwd_impl(q, k, v, bias, scale, interpret):
    B, H, Lq, hd = q.shape
    Lk = k.shape[2]
    grid = (B,)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, Lq, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, Lk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Lq, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Lq * Lk * (2 * hd),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + bias.size * 4,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(q, k, v, bias)


def _fused_fwd(scale, interpret, q, k, v, bias):
    out = _fused_fwd_impl(q, k, v, bias, scale, interpret)
    return out, (q, k, v, bias)


def _fused_bwd(scale, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q, k, v, bias:
                     _attention_xla(q, k, v, bias, scale), q, k, v, bias)
    return vjp(g)


# custom_vjp with nondiff_argnums expects them first in fwd/bwd
fused_bias_attention.defvjp(
    lambda q, k, v, bias, scale, interpret:
        _fused_fwd(scale, interpret, q, k, v, bias),
    lambda scale, interpret, res, g: _fused_bwd(scale, interpret, res, g),
)


def supports_pallas() -> bool:
    return jax.default_backend() == "tpu"
