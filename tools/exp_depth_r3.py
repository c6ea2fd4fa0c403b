"""Round-3 depth-trunk probe: per-layer split + dtype/GN variants at the
production batch (B=192 = 16 panos x 12 views).

VERDICT r2 named two unclosed perception levers: GN stats (~0.9 ms at
B=192 before the channel-major rewrite) and bottleneck convs at ~35% of
roofline. This probe bisects the remaining 2.6 ms:

  stages   - cumulative stem / layer1..4 / compression timing
  variants - full bf16 (production), full fp32, stats-free bound,
             GN stats accumulated in bf16, matmul (MXU) stats reduction

Timing uses the honest chained-scan harness (input perturbed from the
scan stream each iteration; see bench.py docstring).

RESULT (v5e-1, 2026-08-19, B=192, ms): stem 0.94 / thru_l1 1.65 /
thru_l2 2.19 / thru_l3 2.40 / thru_l4 2.51 / full_bf16 2.56 — the stem
(C_in=1 7x7/s2 conv + GN + maxpool) is 37% of the trunk; layers 3-4 are
nearly free. Variants ALL REJECTED: full_fp32 4.42 (1.7x), nostats 1.88
(bounds GN stats at ~0.68 ms), bf16-stats 2.59 (flat), MXU-stats 3.86
(the [x, x^2] concat materialization swamps the reduction win),
row-GEMM stem exact to 7e-7 but 1.26 vs 0.70 ms isolated and 5.44 ms
full trunk (stacking row shifts costs more than lax.conv — the
128x-lane-padding theory of the stem cost is wrong). Third stem
reformulation rejected (im2col r2, s2d r2, row-GEMM r3): the trunk is
at its measured floor short of a fused conv+GN Pallas kernel with
cross-block stats.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_depth_r3.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import depth_resnet as dr

    cfg = r2r_config().depth
    params = jax.device_put(dr.init_depth_params(jax.random.PRNGKey(0), cfg))
    B = 16 * 12
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((B, 128, 128, 1), np.float32))
    iters = 48
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7
    out = {"backend": jax.default_backend(), "B": B}

    def timed(name, fn):
        def chained(p, d, xs):
            def body(c, x):
                return c + fn(p, d + x.astype(jnp.float32) * 1e-6), None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]
        f = jax.jit(chained)
        np.asarray(f(params, depth, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, depth, xs))
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts) / iters * 1e3, 3)
        print(json.dumps(out), flush=True)

    # ---- cumulative stage split (production bf16 path) ------------------
    def prefix(upto, dtype=jnp.bfloat16):
        def fn(p, d):
            x = d.astype(dtype)
            x = dr.conv2d(p["stem_conv"], x, 2, 3)
            x = jax.nn.relu(dr.group_norm(p["stem_gn"], x, cfg.ngroups))
            x = dr.max_pool(x)
            if upto == 0:
                return x.sum()
            for li in range(upto):
                stride = 1 if li == 0 else 2
                for bi, bp in enumerate(p[f"layer{li + 1}"]):
                    x = dr._bottleneck(bp, x, stride if bi == 0 else 1,
                                       cfg.ngroups)
            return x.sum()
        return fn

    timed("stem", prefix(0))
    for li in range(1, 5):
        timed(f"thru_layer{li}", prefix(li))

    # ---- variants --------------------------------------------------------
    timed("full_bf16", lambda p, d: dr.encode_depth(p, cfg, d).sum())
    timed("full_fp32",
          lambda p, d: dr.encode_depth(p, cfg, d, dtype=jnp.float32).sum())

    real_gn = dr.group_norm

    def gn_nostats(p, x, groups, eps=1e-5):
        return (x * p["scale"].astype(x.dtype)
                + p["bias"].astype(x.dtype))

    def gn_bf16_stats(p, x, groups, eps=1e-5):
        B_, H, W, C = x.shape
        cg = C // groups
        s1 = jnp.sum(x, axis=(1, 2)).astype(jnp.float32)
        s2 = jnp.sum(jnp.square(x), axis=(1, 2)).astype(jnp.float32)
        n = H * W * cg
        g1 = s1.reshape(B_, groups, cg).sum(-1) / n
        g2 = s2.reshape(B_, groups, cg).sum(-1) / n
        inv = jax.lax.rsqrt(jnp.maximum(g2 - jnp.square(g1), 0.0) + eps)
        a = (jnp.repeat(inv, cg, 1) * p["scale"][None]).astype(x.dtype)
        b = (p["bias"][None]
             - jnp.repeat(g1, cg, 1) * jnp.repeat(inv, cg, 1)
             * p["scale"][None]).astype(x.dtype)
        return x * a[:, None, None, :] + b[:, None, None, :]

    def gn_mxu_stats(p, x, groups, eps=1e-5):
        # moments via a (1, HW) ones-vector contraction on the MXU
        B_, H, W, C = x.shape
        cg = C // groups
        xf = x.reshape(B_, H * W, C)
        stacked = jnp.concatenate(
            [xf, jnp.square(xf)], axis=-1).astype(jnp.bfloat16)
        ones = jnp.ones((B_, 1, H * W), jnp.bfloat16)
        s = jax.lax.dot_general(
            ones, stacked, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0]  # (B, 2C)
        s1, s2 = s[:, :C], s[:, C:]
        n = H * W * cg
        g1 = s1.reshape(B_, groups, cg).sum(-1) / n
        g2 = s2.reshape(B_, groups, cg).sum(-1) / n
        inv = jax.lax.rsqrt(jnp.maximum(g2 - jnp.square(g1), 0.0) + eps)
        inv_c = jnp.repeat(inv, cg, 1)
        mean_c = jnp.repeat(g1, cg, 1)
        a = inv_c * p["scale"][None]
        b = p["bias"][None] - mean_c * a
        y = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
        return y.astype(x.dtype)

    for name, gn in (("var_nostats", gn_nostats),
                     ("var_bf16stats", gn_bf16_stats),
                     ("var_mxustats", gn_mxu_stats)):
        dr.group_norm = gn
        try:
            timed(name, lambda p, d: dr.encode_depth(p, cfg, d).sum())
        finally:
            dr.group_norm = real_gn

    # ---- row-GEMM stem: the C_in=1 7x7/s2 conv as ONE dense GEMM ------
    # X7[b,i, a*W+w] = xpad[b, 2i+a, w] (7 lane-aligned row-shifted
    # slices); S[(a,wi), (j,c)] = K[a, wi-2j+3, c] banded weights. Every
    # intermediate keeps a 128-wide minor dim — the hypothesis is that
    # the lax.conv stem's 0.66 ms is the (B,128,128,1) tensor's 128x
    # lane padding, not flops.
    W = cfg.input_size
    Ho = Wo = W // 2
    wnp = np.asarray(params["stem_conv"]["w"])[:, :, 0, :]   # (7,7,C)
    C = wnp.shape[-1]
    S = np.zeros((7, W, Wo, C), np.float32)
    for a in range(7):
        for j in range(Wo):
            for b in range(7):
                wi = 2 * j + b - 3
                if 0 <= wi < W:
                    S[a, wi, j, :] = wnp[a, b, :]
    S = jnp.asarray(S.reshape(7 * W, Wo * C))

    def stem_rowgemm(x, dtype):
        B_ = x.shape[0]
        xp = jnp.pad(x[..., 0].astype(dtype), ((0, 0), (3, 3), (0, 0)))
        cols = [xp[:, a:a + 2 * Ho:2, :] for a in range(7)]
        X7 = jnp.stack(cols, axis=2).reshape(B_ * Ho, 7 * W)
        y = jax.lax.dot_general(
            X7, S.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.reshape(B_, Ho, Wo, C).astype(dtype)

    want = np.asarray(dr.conv2d(params["stem_conv"],
                                depth.astype(jnp.float32), 2, 3))
    got = np.asarray(stem_rowgemm(depth, jnp.float32))
    out["rowgemm_maxerr"] = float(np.abs(got - want).max())
    print(json.dumps({"rowgemm_maxerr": out["rowgemm_maxerr"]}),
          flush=True)

    timed("stemconv_only", lambda p, d: dr.conv2d(
        p["stem_conv"], d.astype(jnp.bfloat16), 2, 3).sum())
    timed("stemrowgemm_only",
          lambda p, d: stem_rowgemm(d, jnp.bfloat16).sum())

    def encode_rowgemm(p, d):
        x = stem_rowgemm(d, jnp.bfloat16)
        x = jax.nn.relu(dr.group_norm(p["stem_gn"], x, cfg.ngroups))
        x = dr.max_pool(x)
        for li in range(4):
            stride = 1 if li == 0 else 2
            for bi, bp in enumerate(p[f"layer{li + 1}"]):
                x = dr._bottleneck(bp, x, stride if bi == 0 else 1,
                                   cfg.ngroups)
        x = dr.conv2d(p["compression_conv"], x, 1, 1)
        x = jax.nn.relu(dr.group_norm(p["compression_gn"], x, 1))
        return x.astype(jnp.float32).sum()

    timed("full_rowgemm", encode_rowgemm)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
