"""Why is the FULL perceive program slower than its parts?

Probe numbers (exp_round2_perf): clip 13.65 + depth ~2.0 + nms 0.15
should fuse to ~16 ms/iter at B=16, but bench.py measures 21.9 ms.
Times the full fused perceive with attention-path variants toggled.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_full_perceive.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.ops import attention as attn_mod
    from etpnav_tpu.training import agent as agent_lib

    cfg = r2r_config()
    params = jax.device_put(
        agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B = 16
    rgb = jnp.asarray(rng.integers(0, 256, (B, 12, 224, 224, 3)),
                      jnp.uint8)
    depth = jnp.asarray(rng.random((B, 12, 128, 128, 1), np.float32))
    iters = 48
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

    def timed():
        def chained(params, rgb, depth, xs):
            def body(c, t):
                r = rgb + t.astype(jnp.uint8)
                d = depth + t.astype(jnp.float32) * 1e-6
                out = agent_lib.perceive(params, cfg, r, d)
                return c + out["avg_pano_embeds"].sum(), None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]
        f = jax.jit(chained)
        np.asarray(f(params, rgb, depth, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, rgb, depth, xs))
            ts.append(time.perf_counter() - t0)
        return round(min(ts) / iters * 1e3, 2)

    out = {"B": B, "backend": jax.default_backend()}
    out["full_default_ms"] = timed()            # nhd attention
    print(json.dumps(out), flush=True)
    attn_mod.USE_FUSED_ATTENTION_NOBIAS = False
    out["full_xla_attn_ms"] = timed()           # plain einsum attention
    print(json.dumps(out), flush=True)
    attn_mod.USE_FUSED_ATTENTION_NOBIAS = True

    # headlead kernel instead of nhd: monkeypatch the dispatch (mha
    # imports fused_attention_nhd at call time, so this takes effect)
    from etpnav_tpu.ops import pallas_attention as pa
    orig_nhd = pa.fused_attention_nhd

    def headlead_via_nhd(q, k, v, scale, *, num_heads, **kw):
        Bq, L, D = q.shape
        hd = D // num_heads
        qh = q.reshape(Bq, L, num_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(Bq, L, num_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(Bq, L, num_heads, hd).transpose(0, 2, 1, 3)
        ctx = pa.fused_attention(qh, kh, vh, scale)
        return ctx.transpose(0, 2, 1, 3).reshape(Bq, L, D)

    pa.fused_attention_nhd = headlead_via_nhd
    out["full_headlead_ms"] = timed()
    print(json.dumps(out), flush=True)
    pa.fused_attention_nhd = orig_nhd
    print(json.dumps(out))


if __name__ == "__main__":
    main()
