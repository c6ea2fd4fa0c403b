"""Multi-head attention with additive bias, in BERT (post-norm) block form.

This one primitive backs every attention in the framework:
- language self-attention (vilmodel_cmt.py:79-141)
- pano pre-norm self-attention (common/transformer.py:133-190)
- cross-modal q=visn kv=txt attention (vilmodel_cmt.py:301-352)
- graph self-attention with spatial-relation bias (vilmodel_cmt.py:391-393)

All shapes are static; the bias argument carries padding masks, sprel
distances, and the waypoint predictor's circular neighborhood mask alike.
XLA fuses the softmax chain; a Pallas fused path can slot in here later
without changing callers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from etpnav_tpu.ops.basic import (
    layer_norm,
    linear,
    linear_init,
    ln_init,
    maybe_dropout,
)


def mha_init(key: jax.Array, dim: int, ctx_dim: Optional[int] = None) -> dict:
    kq, kk, kv, ko = jax.random.split(key, 4)
    ctx_dim = ctx_dim if ctx_dim is not None else dim
    return {
        "q": linear_init(kq, dim, dim),
        "k": linear_init(kk, ctx_dim, dim),
        "v": linear_init(kv, ctx_dim, dim),
        "o": linear_init(ko, dim, dim),
    }


# Pallas fused-attention switches, measured HONESTLY on v5e-1 (chained
# scans with per-iteration input perturbation — earlier comparisons were
# invalidated by XLA hoisting the loop-invariant benchmark body):
#
# - no-bias inference (frozen CLIP tower, B~384 H=12 L=50): the fused
#   kernel cuts the whole 12-layer encoder 42.4 -> 33.6 ms by keeping
#   logits in VMEM -> DEFAULT ON on TPU.
# - biased attention (planner shapes): mixed — 0.46 vs 0.38 ms at
#   B=160 L=64 (XLA wins), 0.55 vs 0.82 ms at B=64 L=200 (kernel wins)
#   -> None = auto: TPU and Lk >= 128 (long-text RxR encoder wins, short
#   nav-graph scoring keeps XLA).
USE_FUSED_ATTENTION: Optional[bool] = None
USE_FUSED_ATTENTION_NOBIAS: Optional[bool] = None   # None = auto (TPU on)
# bf16 softmax-probs chain for bf16 inputs (set from IL.attn_probs_bf16
# by the trainers, like ops.basic.DROPOUT_BITS8); fp32 inputs (parity
# tests, serving fp32 nav stack) are never affected.
PROBS_BF16: bool = False
# Cross-batch 'one big GEMM' kernel for the nobias path (tiny-L shapes);
# experimental switch for tools/exp_attn_xbatch.py until measured.
USE_XBATCH_ATTENTION: bool = False


def _fused_enabled(Lk: int = 0) -> bool:
    if USE_FUSED_ATTENTION is not None:
        return USE_FUSED_ATTENTION
    return jax.default_backend() == "tpu" and Lk >= 128


def _fused_nobias_enabled() -> bool:
    if USE_FUSED_ATTENTION_NOBIAS is not None:
        return USE_FUSED_ATTENTION_NOBIAS
    return jax.default_backend() == "tpu"


def mha(params: dict, q_in: jax.Array, kv_in: jax.Array, num_heads: int,
        bias: Optional[jax.Array] = None, *,
        attn_dropout: float = 0.0, rng: Optional[jax.Array] = None,
        train: bool = False) -> jax.Array:
    """Multi-head attention.

    q_in: (B, Lq, D), kv_in: (B, Lk, Dc), bias broadcastable to
    (B, H, Lq, Lk) added to pre-softmax logits. Returns (B, Lq, D)
    after the output projection (no residual / norm here).

    On TPU the softmax chain runs as the fused Pallas kernel
    (ops/pallas_attention.py) when no attention-prob dropout is active;
    otherwise the XLA formulation below (prob dropout matches the
    reference's BertSelfAttention, vilmodel_cmt.py:122-133).
    """
    B, Lq, D = q_in.shape
    H = num_heads
    hd = D // H

    q2d = linear(params["q"], q_in)                  # (B, Lq, D)
    k2d = linear(params["k"], kv_in)
    v2d = linear(params["v"], kv_in)
    q = q2d.reshape(B, Lq, H, hd)
    k = k2d.reshape(B, -1, H, hd)
    v = v2d.reshape(B, -1, H, hd)
    Lk = k.shape[1]

    drop_active = train and attn_dropout > 0.0 and rng is not None
    if bias is None and not drop_active and _fused_nobias_enabled():
        # unbiased inference attention (frozen CLIP tower). Preferred:
        # the NO-TRANSPOSE kernel gridded over lane-blocks of the
        # natural (B, L, D) projection layout — the four HBM transpose
        # round-trips of the head-leading path cost more than the
        # attention math at the CLIP shape (v5e-1, B=192 L=50:
        # head-leading 0.824 ms/layer vs nhd 0.603 (hpb=4, blk=16);
        # sweep in tools/exp_attn_nhd.py — all hpb in {2,4,6,12} land
        # within noise of each other, all well under the transpose path.
        import math
        from etpnav_tpu.ops.pallas_attention import (
            fused_attention,
            fused_attention_nhd,
            fused_attention_xbatch,
        )
        scale = 1.0 / math.sqrt(hd)
        if USE_XBATCH_ATTENTION and Lq == Lk:
            ctx2d = fused_attention_xbatch(q2d, k2d, v2d, scale,
                                           num_heads=H)
            return linear(params["o"], ctx2d)
        for hpb in (4, 2):
            if Lq == Lk and (hpb * hd) % 128 == 0 and H % hpb == 0:
                ctx2d = fused_attention_nhd(q2d, k2d, v2d, scale,
                                            num_heads=H,
                                            heads_per_block=hpb)
                return linear(params["o"], ctx2d)
        ctx = fused_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), scale)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Lq, D)
        return linear(params["o"], ctx)
    if bias is not None and not drop_active and _fused_enabled(Lk):
        from etpnav_tpu.ops.pallas_attention import fused_bias_attention
        # planner biases are head-independent: (B,1,1,Lk) or (B,1,Lq,Lk)
        bias_qk = jnp.broadcast_to(
            bias.reshape((-1,) + bias.shape[-2:]), (B, Lq, Lk))
        import math
        ctx = fused_bias_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), bias_qk, 1.0 / math.sqrt(hd))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Lq, D)
        return linear(params["o"], ctx)

    # (B, H, Lq, Lk) logits in fp32 for a stable softmax
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / jnp.sqrt(jnp.float32(hd)))
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if PROBS_BF16 and q_in.dtype == jnp.bfloat16:
        # bf16 probs chain (IL.attn_probs_bf16): max-shift in fp32 for
        # range safety, then exp/normalize/dropout/backward in bf16 —
        # halves the (B,H,Lq,Lk) softmax+dropout traffic that dominates
        # the learn step's backward (tools/exp_learn_bwd.py: grad
        # program touches 36 GB at G=64, nav stack 80% of step time).
        # Probs live in [0,1] where bf16 keeps ~3 significant digits —
        # the same regime torch fp16 autocast trains the reference in.
        shifted = logits - jax.lax.stop_gradient(
            jnp.maximum(logits.max(axis=-1, keepdims=True), -1e30))
        probs = jax.nn.softmax(shifted.astype(jnp.bfloat16), axis=-1)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    probs = maybe_dropout(probs, attn_dropout, rng, train)

    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q_in.dtype), v,
                     preferred_element_type=jnp.float32).astype(q_in.dtype)
    ctx = ctx.reshape(B, Lq, D)
    return linear(params["o"], ctx)


def attention_output_init(key: jax.Array, dim: int) -> dict:
    """Post-attention residual projection + LN (BertSelfOutput)."""
    return {"dense": linear_init(key, dim, dim), "ln": ln_init(dim)}


def self_attention_block(params: dict, x: jax.Array, num_heads: int,
                         bias: Optional[jax.Array], eps: float, *,
                         hidden_dropout: float = 0.0,
                         attn_dropout: float = 0.0,
                         rng: Optional[jax.Array] = None,
                         train: bool = False) -> jax.Array:
    """BERT post-norm self-attention sub-block:
    LN(x + Dropout(Dense(MHA(x)))) — vilmodel_cmt.py:143-166.

    params = {'attn': mha params (o unused -> folded into 'out'), 'out':
    {'dense','ln'}}. We keep MHA's o-projection as the BertSelfOutput dense,
    so params = {'attn': {q,k,v}, 'out': {dense, ln}}.
    """
    r1, r2 = _split(rng)
    attn_p = {**params["attn"], "o": params["out"]["dense"]}
    h = mha(attn_p, x, x, num_heads, bias,
            attn_dropout=attn_dropout, rng=r1, train=train)
    h = maybe_dropout(h, hidden_dropout, r2, train)
    return layer_norm(x + h, params["out"]["ln"]["scale"],
                      params["out"]["ln"]["bias"], eps)


def cross_attention_block(params: dict, x: jax.Array, ctx: jax.Array,
                          num_heads: int, bias: Optional[jax.Array],
                          eps: float, *,
                          hidden_dropout: float = 0.0,
                          attn_dropout: float = 0.0,
                          rng: Optional[jax.Array] = None,
                          train: bool = False) -> jax.Array:
    """BertXAttention: cross-attn + residual LN (vilmodel_cmt.py:354-363)."""
    r1, r2 = _split(rng)
    attn_p = {**params["attn"], "o": params["out"]["dense"]}
    h = mha(attn_p, x, ctx, num_heads, bias,
            attn_dropout=attn_dropout, rng=r1, train=train)
    h = maybe_dropout(h, hidden_dropout, r2, train)
    return layer_norm(x + h, params["out"]["ln"]["scale"],
                      params["out"]["ln"]["bias"], eps)


def self_attention_block_init(key: jax.Array, dim: int,
                              ctx_dim: Optional[int] = None) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "attn": {
            "q": linear_init(k1, dim, dim),
            "k": linear_init(k2, ctx_dim or dim, dim),
            "v": linear_init(k3, ctx_dim or dim, dim),
        },
        "out": attention_output_init(k4, dim),
    }


def _split(rng: Optional[jax.Array]):
    if rng is None:
        return None, None
    return jax.random.split(rng)
