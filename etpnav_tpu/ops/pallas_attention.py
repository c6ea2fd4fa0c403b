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


def _attn_kernel_nobias(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                        blk: int, pack: int, blhd: bool = False):
    """`blk` batch elements per program, heads folded into the batched
    dot_general. Built for the CLIP ViT shape regime (B~384, H=12, L=50,
    hd=64) where XLA's unfused path spends ~half the encoder time
    shuttling fp32 logits through HBM.

    `blhd` = operands arrive as (blk, L, H, hd) — the natural layout off
    the QKV projections — and the head-leading relayout happens here in
    VMEM. MEASURED NEGATIVE on v5e-1 (tools/exp_attn_layout.py): the
    in-kernel relayout costs 2.34 vs 0.79 ms/layer for XLA transposes
    around the head-leading kernel (XLA fuses those to ~free), needs a
    64M scoped-vmem limit, and Lq<8 blocks trip scoped-vmem OOM. The
    no-transpose alternative (dot_general with non-leading batch dims)
    is Mosaic-unimplemented. Kept for documentation; production uses
    the default layout.

    `pack` > 1 additionally packs that many (batch, head) problems into
    one block-diagonal attention of length pack*L: a (50,64) matmul fills
    ~15% of a 128x128 MXU tile, a (100,64) one ~60%. Cross-problem logits
    get -inf from a static mask, so the math is exact (their softmax
    weight is 0 and P@V cross rows contribute 0).

    The batched dot is chunked to <=96 problems per dot_general: Mosaic
    crashes (tpu_compile_helper exit 1) on larger batched matmuls at
    these tile shapes, and chunking lets bigger `blk` amortize grid
    overhead anyway."""
    if blhd:
        H = q_ref.shape[2]
        Lq, hd = q_ref.shape[1], q_ref.shape[3]
        Lk = k_ref.shape[1]
        qh = q_ref[...].transpose(0, 2, 1, 3)      # (blk, H, Lq, hd)
        kh = k_ref[...].transpose(0, 2, 1, 3)
        vh = v_ref[...].transpose(0, 2, 1, 3)
    else:
        H = q_ref.shape[1]
        Lq, hd = q_ref.shape[2], q_ref.shape[3]
        Lk = k_ref.shape[2]
        qh, kh, vh = q_ref[...], k_ref[...], v_ref[...]
    BH = blk * H
    q = qh.reshape(BH // pack, pack * Lq, hd)
    k = kh.reshape(BH // pack, pack * Lk, hd)
    v = vh.reshape(BH // pack, pack * Lk, hd)
    n = BH // pack
    CH = min(n, 96)
    while n % CH:
        CH -= 1
    chunks = []
    for s in range(0, n, CH):
        qs, ks, vs = q[s:s + CH], k[s:s + CH], v[s:s + CH]
        logits = jax.lax.dot_general(
            qs, ks, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if pack > 1:
            qi = jax.lax.broadcasted_iota(
                jnp.int32, (pack * Lq, pack * Lk), 0)
            ki = jax.lax.broadcasted_iota(
                jnp.int32, (pack * Lq, pack * Lk), 1)
            same = (qi // Lq) == (ki // Lk)
            logits = jnp.where(same[None], logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        chunks.append((ctx / denom).astype(out_ref.dtype))
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
    if blhd:
        out = out.reshape(blk, H, Lq, hd).transpose(0, 2, 1, 3)
    out_ref[...] = out.reshape(out_ref.shape)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float, *, block_b: int = 8,
                    pack: int | None = None, blhd: bool = False,
                    interpret: bool = False) -> jax.Array:
    """Unbiased fused attention. Inference-only (frozen CLIP tower); no
    VJP. Layouts: default q (B,H,Lq,hd), k/v (B,H,Lk,hd) -> (B,H,Lq,hd);
    with blhd=True, q (B,Lq,H,hd), k/v (B,Lk,H,hd) -> (B,Lq,H,hd) — the
    natural projection layout, avoiding four HBM transpose round-trips
    per call (the head relayout happens in VMEM inside the kernel)."""
    if blhd:
        B, Lq, H, hd = q.shape
        Lk = k.shape[1]
    else:
        B, H, Lq, hd = q.shape
        Lk = k.shape[2]
    blk = max(block_b, 1)
    while blk > 1 and B % blk:
        blk //= 2
    if pack is None:
        # Measured on v5e-1 at the CLIP shape (B=384 H=12 L=50 hd=64):
        # pack=2 is SLOWER (1.35-1.38 vs 0.77-0.81 ms/iter) — the
        # blown-up (2L, 2L) fp32 logits + block-diag mask cost more than
        # the MXU tile-occupancy win (the packed QK^T also does 2x the
        # MACs of the two separate problems, so packing only saves
        # per-op overhead). Cheapening the logits pass to close the gap
        # (bf16 logits + constant-shift softmax, tools/exp_attn_pack.py)
        # is Mosaic-rejected: 'tpu.matmul op Expected matmul acc to be
        # 32-bit'. Default off; kept since the trade may flip at other
        # L/hd.
        pack = 1
    while pack > 1 and ((blk * H) % pack or Lq != Lk):
        pack //= 2
    grid = (B // blk,)
    if blhd:
        qspec = pl.BlockSpec((blk, Lq, H, hd), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((blk, Lk, H, hd), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        qspec = pl.BlockSpec((blk, H, Lq, hd), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((blk, H, Lk, hd), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    # the blhd in-kernel head relayout needs ~38M of scoped VMEM at the
    # CLIP shape (blk=8): raise the 16M default (v5e VMEM is 128M)
    compiler_params = (pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024) if blhd else None)
    return pl.pallas_call(
        functools.partial(_attn_kernel_nobias, scale=scale, blk=blk,
                          pack=pack, blhd=blhd),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        compiler_params=compiler_params,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Lq * Lk * (2 * hd),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(q, k, v)


def _attn_kernel_nhd(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                     hd: int, heads_per_block: int):
    """No-transpose attention: operands arrive in the NATURAL
    post-projection layout (blk, L, heads_per_block*hd) — a lane-block
    of the (B, L, D) activations — and each head's 64-lane slice is
    attended independently. Nothing is ever transposed, in HBM or VMEM.
    """
    for hh in range(heads_per_block):
        sl = slice(hh * hd, (hh + 1) * hd)
        q = q_ref[:, :, sl]                            # (blk, L, hd)
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, sl] = (ctx / denom).astype(out_ref.dtype)


def fused_attention_nhd(q: jax.Array, k: jax.Array, v: jax.Array,
                        scale: float, *, num_heads: int,
                        block_b: int = 16, heads_per_block: int = 4,
                        interpret: bool = False) -> jax.Array:
    """Unbiased fused attention over the NATURAL (B, L, D) layout.

    The default path transposes q/k/v to head-leading (B,H,L,hd) in HBM
    and back — at the CLIP shape (B=192x12 views, L=50, D=768) those
    four layout round-trips cost more HBM time than the attention math
    itself. Here the grid is (batch blocks x head groups): each program
    DMAs a lane-contiguous (blk, L, heads_per_block*hd) block straight
    out of the projection output, attends each head's lane slice, and
    writes the context back in the same layout, so the out-projection
    GEMM consumes it directly. Inference-only (frozen CLIP tower).

    heads_per_block * hd should be a multiple of 128 (full lane tiles):
    2 heads x 64 = 128 for the ViT-B shapes.
    """
    B, L, D = q.shape
    hd = D // num_heads
    hpb = max(1, min(heads_per_block, num_heads))
    while num_heads % hpb:
        hpb -= 1
    blk = max(block_b, 1)
    while blk > 1 and B % blk:
        blk //= 2
    lanes = hpb * hd
    spec = pl.BlockSpec((blk, L, lanes), lambda b, h: (b, 0, h),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_nhd, scale=scale, hd=hd,
                          heads_per_block=hpb),
        grid=(B // blk, num_heads // hpb),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * num_heads * L * L * (2 * hd),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * num_heads * L * L,
        ),
        interpret=interpret,
    )(q, k, v)


def _attn_kernel_xbatch(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                        hd: int, num_heads: int, L: int, blk: int):
    """Cross-batch 'one big GEMM' attention for tiny sequence lengths.

    The nhd kernel issues per-(batch, head) 50x64x50 dot_generals — on
    the MXU those are latency-bound (measured ~0.30 ms/layer at the CLIP
    shape against ~0.012 ms of flops). Here the blk batch elements of a
    head are flattened into ONE (blk*L, hd) operand so QK^T and PV run
    as two dense (blk*L)^2-scale GEMMs; a block-diagonal -inf mask
    (i//L == j//L) before the softmax zeroes the cross-batch logits, so
    the math is exactly per-sample attention. The (blk-1)x flop waste is
    cheap at hd=64; what it buys is MXU-shaped work instead of dispatch
    latency.
    """
    R = blk * L
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    same = (ri // L) == (ci // L)                   # block-diagonal mask
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_ref[:, :, sl].reshape(R, hd)
        k = k_ref[:, :, sl].reshape(R, hd)
        v = v_ref[:, :, sl].reshape(R, hd)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(same, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:, :, sl] = (ctx / denom).reshape(blk, L, hd) \
            .astype(out_ref.dtype)


def fused_attention_xbatch(q: jax.Array, k: jax.Array, v: jax.Array,
                           scale: float, *, num_heads: int,
                           block_b: int = 8,
                           interpret: bool = False) -> jax.Array:
    """Unbiased fused attention over the natural (B, L, D) layout with
    cross-batch GEMM batching (see _attn_kernel_xbatch). Grid is batch
    blocks only: each program DMAs full-lane (blk, L, D) q/k/v blocks
    once and loops the heads in VMEM. Inference-only (frozen CLIP
    tower); self-attention (Lq == Lk) with no bias.

    VMEM at blk=8, L=50, D=768: 4 io blocks ~0.6 MB each (x2 pipeline
    buffers) + one (400, 400) fp32 logit tile ~0.7 MB — well under the
    ~16 MB/core budget.
    """
    B, L, D = q.shape
    hd = D // num_heads
    blk = max(1, min(block_b, B))
    while blk > 1 and B % blk:
        blk -= 1
    spec = pl.BlockSpec((blk, L, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_xbatch, scale=scale, hd=hd,
                          num_heads=num_heads, L=L, blk=blk),
        grid=(B // blk,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * (blk * L) * L * hd,
            bytes_accessed=(q.size * 4) * q.dtype.itemsize,
            transcendentals=B * num_heads * blk * L * L,
        ),
        interpret=interpret,
    )(q, k, v)


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


def _prenorm_attn_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref,
                         bo_ref, out_ref, *, heads: int, scale: float,
                         eps: float, blk: int):
    """Pre-norm attention half-block (CLIP resblock first half):
        out = x + proj(attention(LN(x)))
    One program per `blk` batch elements; projections run as one
    (blk*L, D) GEMM so MXU efficiency survives the blocking.

    STATUS (v5e-1, 2026-08): interpret-mode exact (2e-7), but Mosaic
    rejects the hardware lowering — 'infer-vector-layout: unsupported
    shape cast' on the (blk*L, 3D) -> (blk, L, 3, H, hd) head split
    (minor-dim reshape). The profitable batched formulation needs
    exactly the minor-dim splits/merges Mosaic forbids; the per-batch-
    element head-leading formulation (fused_attention_block below)
    compiles but loses the GEMM batching that makes fusion pay. Kept as
    a starting point; not wired into any production path."""
    blkL = blk * x_ref.shape[1]
    L = x_ref.shape[1]
    D = x_ref.shape[2]
    hd = D // heads
    x = x_ref[...].reshape(blkL, D)
    cdt = x.dtype

    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    a = ((x32 - mu) * jax.lax.rsqrt(var + eps)
         * g_ref[0].astype(jnp.float32)
         + b_ref[0].astype(jnp.float32)).astype(cdt)

    # fused qkv: (blk*L, D) @ (D, 3D) -> (blk*L, 3D)
    qkv = (jax.lax.dot_general(
        a, wqkv_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv_ref[0].astype(jnp.float32)).astype(cdt)
    qkv = qkv.reshape(blk, L, 3, heads, hd)
    # (blk, L, 3, H, hd) -> (3, blk, H, L, hd) -> flatten batch*heads
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, blk * heads, L, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    ctx = (jax.lax.dot_general(
        p.astype(cdt), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / denom).astype(cdt)

    # (blk*H, L, hd) -> (blk*L, D) for the out projection
    ctx = ctx.reshape(blk, heads, L, hd).transpose(0, 2, 1, 3) \
        .reshape(blkL, D)
    out = jax.lax.dot_general(
        ctx, wo_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)
    out_ref[...] = (x32 + out).astype(out_ref.dtype).reshape(out_ref.shape)


def fused_prenorm_attention(x: jax.Array, ln: dict, attn: dict,
                            num_heads: int, eps: float, *,
                            block_b: int = 8,
                            interpret: bool = False) -> jax.Array:
    """x (B, L, D) -> x + proj(mha(LN(x))) in one kernel (inference-only,
    no VJP; the frozen CLIP tower). ln = {'scale','bias'}, attn =
    {'q','k','v','o'} linear params."""
    import math
    B, L, D = x.shape
    blk = max(block_b, 1)
    while blk > 1 and B % blk:
        blk //= 2
    wqkv = jnp.concatenate([attn["q"]["w"], attn["k"]["w"],
                            attn["v"]["w"]], axis=1)        # (D, 3D)
    bqkv = jnp.concatenate([attn["q"]["b"], attn["k"]["b"],
                            attn["v"]["b"]])[None]          # (1, 3D)
    row = lambda a: a.reshape(1, -1)

    def spec(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_prenorm_attn_kernel, heads=num_heads,
                          scale=1.0 / math.sqrt(D // num_heads), eps=eps,
                          blk=blk),
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((blk, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            spec((1, D)), spec((1, D)),
            spec((D, 3 * D)), spec((1, 3 * D)),
            spec((D, D)), spec((1, D)),
        ],
        out_specs=pl.BlockSpec((blk, L, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, row(ln["scale"]), row(ln["bias"]), wqkv, bqkv, attn["o"]["w"],
      row(attn["o"]["b"]))


def _prenorm_attn_kernel_v2(x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref,
                            bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                            out_ref, *, heads: int, scale: float,
                            eps: float, blk: int):
    """Pre-norm attention half-block, Mosaic-compatible formulation:
        out = x + proj(attention(LN(x)))

    The v1 kernel above (_prenorm_attn_kernel) is Mosaic-rejected on its
    (blk*L, 3D) -> (blk, L, 3, H, hd) head split — a minor-dim reshape.
    Here heads are never split by reshape: the three projections run as
    full-width (blk*L, D) @ (D, D) GEMMs (MXU-efficient), and each head
    is attended on its 64-lane slice exactly like _attn_kernel_nhd —
    only leading-dim reshapes and lane slicing, both of which Mosaic
    lowers. q/k/v/ctx never leave VMEM, which is the fusion win over
    the XLA-projections + nhd-kernel production path."""
    L, D = x_ref.shape[1], x_ref.shape[2]
    hd = D // heads
    x = x_ref[...]                                    # (blk, L, D)
    cdt = x.dtype
    x2 = x.reshape(blk * L, D)                        # leading merge
    x32 = x2.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    a = ((x32 - mu) * jax.lax.rsqrt(var + eps)
         * g_ref[0].astype(jnp.float32)
         + b_ref[0].astype(jnp.float32)).astype(cdt)

    def proj(wref, bref):
        y = jax.lax.dot_general(a, wref[...].astype(cdt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + bref[0].astype(jnp.float32)).astype(cdt) \
            .reshape(blk, L, D)                       # leading split
    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    ctx_slices = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # (blk, L, L)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(cdt), v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ctx_slices.append((ctx / denom).astype(cdt))
    ctx = jnp.concatenate(ctx_slices, axis=-1)        # lane concat
    out = jax.lax.dot_general(
        ctx.reshape(blk * L, D), wo_ref[...].astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + bo_ref[0].astype(jnp.float32)
    out_ref[...] = (x32 + out).astype(out_ref.dtype) \
        .reshape(out_ref.shape)


def fused_prenorm_attention_v2(x: jax.Array, ln: dict, attn: dict,
                               num_heads: int, eps: float, *,
                               block_b: int = 8,
                               interpret: bool = False) -> jax.Array:
    """x (B, L, D) -> x + proj(mha(LN(x))) in one kernel — the
    Mosaic-compatible successor to fused_prenorm_attention (inference-
    only; the frozen CLIP tower). ln = {'scale','bias'}, attn =
    {'q','k','v','o'} linear params ({'w': (D,D), 'b': (D,)}).

    STATUS (v5e-1, 2026-08-17, tools/exp_prenorm_v2.py at B=192 L=50
    H=12): compiles and matches the production path (maxerr 0.03 in
    bf16) but LOSES the A/B at every block size — 1.151/1.135/1.211 ms
    per layer (blk 8/16/32) vs 1.062 ms for XLA LN + XLA q/k/v/o GEMMs
    + fused_attention_nhd. The fusion removes the q/k/v/ctx HBM
    round-trips, but serializing all four projections behind per-head
    64-lane-slice attention inside one kernel costs more than the HBM
    traffic saved: XLA overlaps/pipelines the full-width GEMMs across
    the tower better than the monolithic grid. Kept compilable (parity
    test pins it) as the starting point if the CLIP attention half ever
    needs another pass; NOT wired into production (clip_vit gate
    USE_FUSED_BLOCK stays False)."""
    import math
    B, L, D = x.shape
    blk = max(block_b, 1)
    while blk > 1 and B % blk:
        blk //= 2
    row = lambda a: a.reshape(1, -1)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((blk, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    a = attn
    return pl.pallas_call(
        functools.partial(_prenorm_attn_kernel_v2, heads=num_heads,
                          scale=1.0 / math.sqrt(D // num_heads), eps=eps,
                          blk=blk),
        grid=(B // blk,),
        in_specs=[
            xspec,
            wspec((1, D)), wspec((1, D)),
            wspec((D, D)), wspec((1, D)),
            wspec((D, D)), wspec((1, D)),
            wspec((D, D)), wspec((1, D)),
            wspec((D, D)), wspec((1, D)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * D * (4 * D) + 2 * B * num_heads * L * L
            * (2 * D // num_heads),
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + 4 * D * D * 4,
            transcendentals=B * num_heads * L * L,
        ),
        interpret=interpret,
    )(x, row(ln["scale"]), row(ln["bias"]),
      a["q"]["w"], row(a["q"]["b"]), a["k"]["w"], row(a["k"]["b"]),
      a["v"]["w"], row(a["v"]["b"]), a["o"]["w"], row(a["o"]["b"]))


def supports_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# EXPERIMENTAL — fully-fused post-norm attention block:
#   y = LN(x + (softmax(qk^T*scale + bias) v) Wo + bo)
# One VMEM pass per batch element. Status (v5e-1, 2026-08): interpret-mode
# parity is exact, but the hardware lowering shows NO speedup over XLA's
# own fusion (1.00x at B=160 L=64, 0.78x at B=64 L=200) AND a numerical
# discrepancy on-device (suspected Mosaic batched-matmul layout hazard at
# non-128-multiple L). Not wired into any production path — kept as the
# starting point for future kernel work; see NOTES_ROUND1.md.
# ---------------------------------------------------------------------------

def _attn_block_kernel(x_ref, qw_ref, qb_ref, kw_ref, kb_ref, vw_ref,
                       vb_ref, ow_ref, ob_ref, g_ref, b_ref, bias_ref,
                       out_ref, *, heads: int, scale: float, eps: float):
    """Weights arrive pre-split per head — qw (H, D, hd), ow (H, hd, D) —
    so every head op is a batched dot_general (Mosaic cannot split the
    minor dim with an in-kernel reshape)."""
    x = x_ref[0]                                   # (L, D)
    cdt = x.dtype

    # projections yield (H, hd, L); Mosaic wants batch dims at position 0
    # of both operands, so everything stays head-leading
    def proj_hdl(wref, bref):
        y = jax.lax.dot_general(wref[:].astype(cdt), x,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + bref[:].astype(jnp.float32)[:, :, None]).astype(cdt)

    q = proj_hdl(qw_ref, qb_ref)                   # (H, hd, L)
    k = proj_hdl(kw_ref, kb_ref)
    v = proj_hdl(vw_ref, vb_ref)

    # (H,hd,Lq) x (H,hd,Lk) contract hd, batch H -> (H, Lq, Lk)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0].astype(jnp.float32)[None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # (H,Lq,Lk) x (H,hd,Lk) contract Lk, batch H -> (H, Lq, hd)
    ctx = jax.lax.dot_general(
        p.astype(cdt), v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(cdt)
    # (H,Lq,hd) x (H,hd,D) contract hd, batch H -> (H, Lq, D), sum heads
    out = jax.lax.dot_general(
        ctx, ow_ref[:].astype(cdt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = jnp.sum(out, axis=0) + ob_ref[0].astype(jnp.float32)

    h = x.astype(jnp.float32) + out
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    y = (h - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def fused_attention_block(x: jax.Array, params: dict, bias: jax.Array,
                          num_heads: int, eps: float,
                          interpret: bool = False) -> jax.Array:
    """x (B, L, D), params = self_attention_block layout
    ({'attn': {q,k,v}, 'out': {dense, ln}}), bias (B, L, L) ->
    LN(x + proj(attention(x))). Inference path (no dropout)."""
    import math
    B, L, D = x.shape
    H = num_heads
    hd = D // H
    p2 = lambda a: a.reshape(1, -1)

    a = params["attn"]
    o = params["out"]
    # pre-split heads outside the kernel (plain XLA reshapes)
    qw = a["q"]["w"].reshape(D, H, hd).transpose(1, 0, 2)   # (H, D, hd)
    kw = a["k"]["w"].reshape(D, H, hd).transpose(1, 0, 2)
    vw = a["v"]["w"].reshape(D, H, hd).transpose(1, 0, 2)
    qb = a["q"]["b"].reshape(H, hd)
    kb = a["k"]["b"].reshape(H, hd)
    vb = a["v"]["b"].reshape(H, hd)
    ow = o["dense"]["w"].reshape(H, hd, D)                  # (H, hd, D)

    def spec_hw(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_attn_block_kernel, heads=H,
                          scale=1.0 / math.sqrt(hd), eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_hw((H, D, hd)), spec_hw((H, hd)),
            spec_hw((H, D, hd)), spec_hw((H, hd)),
            spec_hw((H, D, hd)), spec_hw((H, hd)),
            spec_hw((H, hd, D)), spec_hw((1, D)),
            spec_hw((1, D)), spec_hw((1, D)),
            pl.BlockSpec((1, L, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, qw, qb, kw, kb, vw, vb, ow, p2(o["dense"]["b"]),
      p2(o["ln"]["scale"]), p2(o["ln"]["bias"]), bias)
