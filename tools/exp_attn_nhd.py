"""Does the no-transpose (natural-layout) attention kernel beat the
transpose+head-leading path at the CLIP shape?

Round-2 probe data (tools/exp_round2_perf.py, v5e-1, B=16 panos):
clip_full 15.34 ms vs clip_noattn 9.38 ms — the attention core + its
four HBM layout round-trips cost ~6 ms while the attention math itself
is <0.5 ms of MXU time. fused_attention_nhd grids over (batch x head
group) lane-blocks of the untransposed (B*V, L, D) activations, so no
transpose exists anywhere.

Times per CLIP layer equivalent (11 layers, B*V = 192):
  xla       - einsum attention (no kernel)
  headlead  - transpose -> fused_attention -> transpose (production)
  nhd1/2/6  - fused_attention_nhd with 1/2/6 heads per block
and end-to-end clip towers with each path.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_attn_nhd.py
"""

import json
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.ops import pallas_attention as pa

    B, L, H, hd = 192, 50, 12, 64
    D = H * hd
    scale = 1.0 / math.sqrt(hd)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    iters = 64
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

    def timed(core):
        def chained(q, k, v, xs):
            def body(c, t):
                qq = q + t.astype(q.dtype) * 1e-3
                return c + core(qq, k, v).astype(jnp.float32).sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c
        f = jax.jit(chained)
        np.asarray(f(q, k, v, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(q, k, v, xs))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters * 1e3

    def xla(q, k, v):
        qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, -1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), vh,
                         preferred_element_type=jnp.float32)
        return ctx.transpose(0, 2, 1, 3).reshape(B, L, D)

    def headlead(q, k, v):
        qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        ctx = pa.fused_attention(qh, kh, vh, scale)
        return ctx.transpose(0, 2, 1, 3).reshape(B, L, D)

    out = {"backend": jax.default_backend(), "B": B}
    out["xla_ms"] = round(timed(xla), 3)
    out["headlead_ms"] = round(timed(headlead), 3)
    for hpb in (2, 4, 6, 12):
        for blk in (8, 16, 32):
            fn = lambda q, k, v, hpb=hpb, blk=blk: pa.fused_attention_nhd(
                q, k, v, scale, num_heads=H, heads_per_block=hpb,
                block_b=blk)
            try:
                out[f"nhd{hpb}b{blk}_ms"] = round(timed(fn), 3)
            except Exception as e:                 # noqa: BLE001
                out[f"nhd{hpb}b{blk}_ms"] = \
                    f"FAIL {type(e).__name__}: {e}"[:120]

    # numerics vs xla on TPU
    want = np.asarray(xla(q, k, v), np.float32)
    got = np.asarray(pa.fused_attention_nhd(q, k, v, scale, num_heads=H,
                                            heads_per_block=2),
                     np.float32)
    out["nhd2_max_err"] = float(np.abs(got - want).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
