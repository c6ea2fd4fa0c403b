"""Scratch experiment: where does the depth encoder's 6.3 ms go?

Variants timed with the honest chained-scan harness (per-iteration input
perturbation; see bench.py docstring):
  full        - production encode_depth
  nostats     - GroupNorm stats replaced by constants (scale/bias apply
                only): bounds the cost of the mean/var reduction passes
  nogn        - GroupNorm removed entirely (conv+relu only): bounds all
                GN cost (stats + apply + extra HBM passes)
  gnfused     - single fused stats formulation: E[x^2]-E[x]^2 in one pass

RESULT (v5e-1, 2026-08-16, B=384): with the original grouped-reshape GN,
full 6.214 / nostats 3.409 / nogn 3.694 / gnfused 5.317 ms — the
grouped-minor-dim stats reductions cost ~2.8 ms. After rewriting
group_norm to channel-major moments + per-channel affine
(models/depth_resnet.py), full drops to 5.211 ms with golden parity
(atol 5e-5) intact.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_depth_gn.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import depth_resnet as dr

    cfg = r2r_config().depth
    params = jax.device_put(
        dr.init_depth_params(jax.random.PRNGKey(0), cfg))

    B = 32 * 12
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((B, 128, 128, 1), np.float32))
    iters = 48
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

    def timed(fn):
        def chained(p, d, xs):
            def body(c, x):
                return c + fn(p, d + x.astype(jnp.float32) * 1e-6), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c
        f = jax.jit(chained)
        np.asarray(f(params, depth, xs))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, depth, xs))
            times.append(time.perf_counter() - t0)
        return min(times) / iters * 1e3

    real_gn = dr.group_norm

    def gn_nostats(p, x, groups, eps=1e-5):
        return (x * p["scale"].astype(x.dtype)
                + p["bias"].astype(x.dtype))

    def gn_none(p, x, groups, eps=1e-5):
        return x

    def gn_fused(p, x, groups, eps=1e-5):
        B_, H, W, C = x.shape
        xg = x.astype(jnp.float32).reshape(B_, H * W, groups, C // groups)
        m1 = jnp.mean(xg, axis=(1, 3), keepdims=True)
        m2 = jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True)
        var = m2 - jnp.square(m1)
        y = (xg - m1) * jax.lax.rsqrt(var + eps)
        y = y.reshape(B_, H, W, C) * p["scale"] + p["bias"]
        return y.astype(x.dtype)

    out = {}
    for name, gn in (("full", real_gn), ("nostats", gn_nostats),
                     ("nogn", gn_none), ("gnfused", gn_fused)):
        dr.group_norm = gn
        out[name] = round(timed(
            lambda p, d: dr.encode_depth(p, cfg, d).sum()), 3)
        dr.group_norm = real_gn
    print({"backend": jax.default_backend(), "B": B, **out})


if __name__ == "__main__":
    main()
