"""EXPERIMENT: unroll the CLIP block scan.

Hypothesis: lax.scan compiles one block body and loops it; unrolling k
blocks per iteration gives XLA a longer straight-line region to overlap
DMA prefetch of the next block's weights with compute. ViT-B/32 weights
are ~85 MB bf16 over 12 blocks, ~7 MB per block — prefetch overlap is
plausibly worth a few percent at the bench shape.

Harness: chained scan with per-iteration input perturbation + host fetch
(CLAUDE.md benchmarking rules).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_scan_unroll.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import clip_vit
    from etpnav_tpu.ops.attention import mha
    from etpnav_tpu.ops.basic import layer_norm, linear, quick_gelu

    cfg = r2r_config().clip
    params = jax.device_put(
        clip_vit.init_clip_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B = args.batch
    rgb = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3)), jnp.uint8)
    xs = jnp.arange(1, args.iters + 1, dtype=jnp.int32) % 7
    bf = jnp.bfloat16

    def trunk_unrolled(p, x, dtype, unroll):
        Bx = x.shape[0]
        cls = jnp.broadcast_to(
            p["class_embedding"].astype(dtype)[None, None, :],
            (Bx, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + p["positional_embedding"].astype(dtype)[None]
        x = layer_norm(x, p["ln_pre"]["scale"], p["ln_pre"]["bias"],
                       cfg.layer_norm_eps)

        def block(h, bp):
            a = layer_norm(h, bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                           cfg.layer_norm_eps)
            h = h + mha(bp["attn"], a, a, cfg.heads)
            m = layer_norm(h, bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                           cfg.layer_norm_eps)
            m = quick_gelu(linear(bp["mlp_fc"], m))
            return h + linear(bp["mlp_proj"], m), None

        first = jax.tree_util.tree_map(lambda a: a[:-1], p["blocks"])
        last = jax.tree_util.tree_map(lambda a: a[-1], p["blocks"])
        x, _ = jax.lax.scan(block, x, first, unroll=unroll)
        a = layer_norm(x, last["ln_1"]["scale"], last["ln_1"]["bias"],
                       cfg.layer_norm_eps)
        h = x[:, :1] + mha(last["attn"], a[:, :1], a, cfg.heads)
        m = layer_norm(h, last["ln_2"]["scale"], last["ln_2"]["bias"],
                       cfg.layer_norm_eps)
        m = quick_gelu(linear(last["mlp_fc"], m))
        h = h + linear(last["mlp_proj"], m)
        cls_out = layer_norm(h[:, 0], p["ln_post"]["scale"],
                             p["ln_post"]["bias"], cfg.layer_norm_eps)
        return jnp.dot(cls_out, p["proj"].astype(dtype),
                       preferred_element_type=jnp.float32)

    def encode(p, rgb_u8, unroll):
        ps = cfg.patch_size
        s = jnp.tile(1.0 / (255.0 * clip_vit.CLIP_STD), ps * ps)
        t = jnp.tile(-clip_vit.CLIP_MEAN / clip_vit.CLIP_STD, ps * ps)
        w = p["patch_embed"].astype(jnp.float32)
        x = clip_vit._patchify(rgb_u8, ps).astype(bf)
        x = (jnp.dot(x, (s[:, None] * w).astype(bf),
                     preferred_element_type=jnp.float32)
             + jnp.dot(t, w, preferred_element_type=jnp.float32)
             ).astype(bf)
        return trunk_unrolled(p, x, bf, unroll)

    def timed(fn):
        f = jax.jit(lambda p, xs: jax.lax.scan(
            lambda c, t: (c + fn(p, t), None), jnp.float32(0), xs)[0])
        np.asarray(f(params, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, xs))
            ts.append(time.perf_counter() - t0)
        return min(ts) / args.iters * 1e3

    out = {"batch": B, "iters": args.iters,
           "backend": jax.default_backend()}
    for unroll in (1, 2, 4, 11):
        ms = timed(lambda p, t, u=unroll: encode(
            p, rgb + t.astype(jnp.uint8), u).sum())
        out[f"unroll{unroll}_ms"] = round(ms, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
