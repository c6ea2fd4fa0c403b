"""EXPERIMENT: cross-batch 'one big GEMM' attention vs the adopted nhd
kernel at the CLIP shape (B=192, H=12, L=50, hd=64).

Hypothesis: the nhd kernel's per-(batch, head) 50x64x50 dot_generals are
MXU-dispatch-latency-bound (~0.30 ms/layer measured vs ~0.012 ms of
flops). Flattening blk batch elements into one (blk*L, hd) operand turns
the core into two dense GEMMs + a block-diagonal mask — (blk-1)x wasted
flops, but MXU-shaped.

Measures: exactness vs the XLA reference, attention-core-only ms/layer
for nhd and xbatch at several blk, then the full CLIP tower with each.

RESULT (v5e-1, 2026-08-18): REJECTED. Exact (maxerr 0.016 bf16) but
slower: isolated core nhd 0.445 ms vs xbatch 0.837/0.754/0.822/0.954 at
blk=4/8/12/16 (XLA reference 0.794); full CLIP tower 12.99 -> 16.59 ms.
The (blk-1)x masked-GEMM flops + the fp32 (blk*L)^2 mask/softmax work
cost more than the per-(batch,head) dispatch latency they remove — the
nhd kernel's batched 50x64x50 dots are NOT latency-bound the way the
~6x-off-HBM-roofline core time suggested. Production keeps nhd;
USE_XBATCH_ATTENTION stays default-off (kernel retained with its parity
test as the measured record).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_attn_xbatch.py
"""

import json
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.ops import attention as attn_lib
    from etpnav_tpu.ops.pallas_attention import (
        fused_attention_nhd,
        fused_attention_xbatch,
    )

    B, H, L, hd = 192, 12, 50, 64
    D = H * hd
    scale = 1.0 / math.sqrt(hd)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)

    def xla_ref(q, k, v):
        qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhij,bhjd->bhid", p.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32)
        return ctx.transpose(0, 2, 1, 3).reshape(B, L, D) \
            .astype(jnp.bfloat16)

    want = np.asarray(jax.jit(xla_ref)(q, k, v), np.float32)
    out = {"backend": jax.default_backend(), "B": B, "L": L}

    interp = jax.default_backend() != "tpu"
    for blk in (4, 8, 12, 16):
        got = np.asarray(
            jax.jit(lambda q, k, v: fused_attention_xbatch(
                q, k, v, scale, num_heads=H, block_b=blk,
                interpret=interp))(q, k, v), np.float32)
        err = float(np.abs(got - want).max())
        out[f"maxerr_blk{blk}"] = round(err, 5)
        print(json.dumps({f"maxerr_blk{blk}": out[f"maxerr_blk{blk}"]}),
              flush=True)
        assert err < 0.05, f"xbatch blk={blk} mismatch {err}"

    if jax.default_backend() != "tpu":
        print(json.dumps(out))
        return

    iters = 96
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

    def timed(name, fn):
        def chained(q, k, v, xs):
            def body(c, t):
                dq = q + t.astype(q.dtype)
                return c + fn(dq, k, v).astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]
        f = jax.jit(chained)
        np.asarray(f(q, k, v, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(q, k, v, xs))
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts) / iters * 1e3, 4)
        print(json.dumps({name: out[name]}), flush=True)

    timed("nhd_ms", lambda q, k, v: fused_attention_nhd(
        q, k, v, scale, num_heads=H))
    for blk in (4, 8, 12, 16):
        timed(f"xbatch{blk}_ms",
              lambda q, k, v, blk=blk: fused_attention_xbatch(
                  q, k, v, scale, num_heads=H, block_b=blk))
    timed("xla_ms", xla_ref)

    # full CLIP tower with each attention core
    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import clip_vit

    cfg = r2r_config().clip
    params = jax.device_put(
        clip_vit.init_clip_params(jax.random.PRNGKey(0), cfg))
    rgb = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3)), jnp.uint8)

    def timed_clip(name):
        def chained(p, r, xs):
            def body(c, t):
                y = clip_vit.encode_image_uint8(p, cfg,
                                                r + t.astype(jnp.uint8))
                return c + y.sum(), None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]
        f = jax.jit(chained)
        np.asarray(f(params, rgb, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, rgb, xs))
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts) / iters * 1e3, 3)
        print(json.dumps({name: out[name]}), flush=True)

    timed_clip("clip_nhd_ms")
    attn_lib.USE_XBATCH_ATTENTION = True
    try:
        timed_clip("clip_xbatch_ms")
    finally:
        attn_lib.USE_XBATCH_ATTENTION = False
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
