"""Scratch experiment: can pack=2 win with cheaper logits handling?

The production no-bias kernel (ops/pallas_attention.py) measured pack=2
SLOWER (1.38 vs 0.81 ms/layer at CLIP shape B=384 H=12 L=50 hd=64):
the (2L, 2L) fp32 logits + block-diag mask + max/exp/sum passes cost
more than the MXU tile-occupancy win. This tries to shrink exactly that
overhead:

  v_base   - production kernel, pack=1 (reference point)
  v_pack2  - production kernel, pack=2 (known slower)
  v_p2bf   - pack=2 with bf16 logits and constant-shift softmax (skip
             the max reduction; CLIP attention logits are bounded, and
             the block-diag mask adds -30 instead of -inf so exp
             underflows to 0 in the cross blocks)
  v_p1bf   - pack=1 with the same cheap softmax (isolates the
             bf16/no-max saving without the packing)

Accuracy is printed vs the XLA fp32 reference for each variant.

RESULT (v5e-1, 2026-08-16): v_base 0.772 ms, v_pack2 1.353 ms; both
bf16-logit variants are Mosaic-REJECTED ('tpu.matmul' op Expected matmul
acc to be 32-bit). pack stays off; the production kernel is the winner.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_attn_pack.py
"""

import functools
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from etpnav_tpu.ops.pallas_attention import fused_attention

    B, H, L, hd = 384, 12, 50, 64
    scale = 1.0 / math.sqrt(hd)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.bfloat16)

    def kernel_cheap(q_ref, k_ref, v_ref, out_ref, *, blk, pack):
        BH = blk * q_ref.shape[1]
        Lq, hd_ = q_ref.shape[2], q_ref.shape[3]
        Lk = k_ref.shape[2]
        qq = q_ref[...].reshape(BH // pack, pack * Lq, hd_)
        kk = k_ref[...].reshape(BH // pack, pack * Lk, hd_)
        vv = v_ref[...].reshape(BH // pack, pack * Lk, hd_)
        n = BH // pack
        CH = min(n, 96)
        while n % CH:
            CH -= 1
        chunks = []
        for s in range(0, n, CH):
            qs, ks, vs = qq[s:s + CH], kk[s:s + CH], vv[s:s + CH]
            # bf16 logits straight off the MXU; constant shift instead of
            # a max reduction (|logits*scale| <~ 8 for LN'd CLIP acts)
            logits = jax.lax.dot_general(
                qs, ks, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.bfloat16)
            logits = logits * jnp.bfloat16(scale)
            if pack > 1:
                qi = jax.lax.broadcasted_iota(
                    jnp.int32, (pack * Lq, pack * Lk), 0)
                ki = jax.lax.broadcasted_iota(
                    jnp.int32, (pack * Lq, pack * Lk), 1)
                same = (qi // Lq) == (ki // Lk)
                logits = jnp.where(same[None], logits, jnp.bfloat16(-30.0))
            p = jnp.exp((logits - jnp.bfloat16(10.0)).astype(jnp.float32)
                        ).astype(jnp.bfloat16)
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            ctx = jax.lax.dot_general(
                p, vs, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            chunks.append((ctx / denom).astype(out_ref.dtype))
        out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
        out_ref[...] = out.reshape(out_ref.shape)

    def cheap_attention(q, k, v, *, block_b=8, pack=1):
        B_, H_, Lq, hd_ = q.shape
        blk = block_b
        return pl.pallas_call(
            functools.partial(kernel_cheap, blk=blk, pack=pack),
            grid=(B_ // blk,),
            in_specs=[pl.BlockSpec((blk, H_, Lq, hd_),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((blk, H_, Lq, hd_),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q, k, v)

    def xla_ref(q, k, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32
                          ).astype(q.dtype)

    ref = np.asarray(jax.jit(xla_ref)(q, k, v), np.float32)

    variants = {
        "v_base": lambda q, k, v: fused_attention(q, k, v, scale),
        "v_pack2": lambda q, k, v: fused_attention(q, k, v, scale, pack=2),
        "v_p2bf": lambda q, k, v: cheap_attention(q, k, v, pack=2),
        "v_p1bf": lambda q, k, v: cheap_attention(q, k, v, pack=1),
    }

    iters = 100
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 5
    out = {}
    for name, fn in variants.items():
        try:
            got = np.asarray(jax.jit(fn)(q, k, v), np.float32)
            err = float(np.max(np.abs(got - ref)))

            def chained(q, k, v, xs, fn=fn):
                def body(c, x):
                    qp = q + x.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
                    return c + fn(qp, k, v).astype(jnp.float32).sum(), None
                c, _ = jax.lax.scan(body, jnp.float32(0), xs)
                return c
            f = jax.jit(chained)
            np.asarray(f(q, k, v, xs))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(q, k, v, xs))
                times.append(time.perf_counter() - t0)
            out[name] = {"ms": round(min(times) / iters * 1e3, 4),
                         "max_err": round(err, 5)}
        except Exception as e:  # Mosaic rejections etc.
            out[name] = {"error": str(e)[:200]}
    print({"backend": jax.default_backend(), **out})


if __name__ == "__main__":
    main()
