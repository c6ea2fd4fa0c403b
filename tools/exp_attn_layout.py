"""Scratch experiment: attention input/output layout cost at CLIP shape.

The mha no-bias path computes q/k/v in (B, L, H, hd) (natural off the
projections) but the fused kernel wants head-leading (B, H, L, hd).
Variants:
  xla_t   - XLA transposes around the head-leading kernel (production
            default): 4 HBM transpose round-trips per mha
  blhd    - (B,L,H,hd) blocks, explicit in-kernel transpose (measured
            SLOWER end-to-end: CLIP 33.6 -> 46.9 ms; Mosaic's major-dim
            relayout is elementwise-copy expensive)
  bdims   - (B,L,H,hd) blocks, no transpose: dot_general with
            non-leading batch dims ((0,2) x (0,2)); output written
            head-leading, single XLA transpose on the output only

RESULT (v5e-1, 2026-08-16): xla_t 0.792 ms, blhd 2.337 ms, bdims
Mosaic-REJECTED ('tpu.matmul' Not implemented for non-leading batch
dims). The XLA transposes around the head-leading kernel are fused to
~free (bare kernel: 0.77 ms); production keeps the default layout.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_attn_layout.py
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
    # natural projection layout
    q = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)

    def kernel_bdims(q_ref, k_ref, v_ref, out_ref, *, blk):
        qq = q_ref[...]                              # (blk, L, H, hd)
        kk = k_ref[...]
        vv = v_ref[...]
        logits = jax.lax.dot_general(
            qq, kk, (((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.float32) * scale   # (blk,H,L,L)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(vv.dtype), vv, (((3,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32)           # (blk,H,L,hd)
        out_ref[...] = (ctx / denom).astype(out_ref.dtype)

    def bdims_attention(q, k, v, *, block_b=8):
        B_, L_, H_, hd_ = q.shape
        blk = block_b
        in_spec = pl.BlockSpec((blk, L_, H_, hd_), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(kernel_bdims, blk=blk),
            grid=(B_ // blk,),
            in_specs=[in_spec] * 3,
            out_specs=pl.BlockSpec((blk, H_, L_, hd_),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B_, H_, L_, hd_), q.dtype),
        )(q, k, v)
        return out.transpose(0, 2, 1, 3)   # single output transpose

    variants = {
        "xla_t": lambda q, k, v: fused_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), scale).transpose(0, 2, 1, 3),
        "blhd": lambda q, k, v: fused_attention(q, k, v, scale,
                                                blhd=True),
        "bdims": bdims_attention,
    }

    def xla_ref(q, k, v):
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), vh,
                          preferred_element_type=jnp.float32
                          ).astype(q.dtype).transpose(0, 2, 1, 3)

    ref = np.asarray(jax.jit(xla_ref)(q, k, v), np.float32)
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
        except Exception as e:
            out[name] = {"error": str(e)[:160]}
    print({"backend": jax.default_backend(), **out})


if __name__ == "__main__":
    main()
