"""EXPERIMENT: pack CLIP's q/k/v projections into one (D, 3D) GEMM.

Hypothesis: three back-to-back (B*L, 768)x(768, 768) GEMMs per block pay
3x dispatch/epilogue overhead vs one (B*L, 768)x(768, 2304); the concat
of the frozen weights is loop-invariant (scanned block params), so XLA
should hoist it once per scan, making the pack ~free.

RESULT (v5e-1, 2026-08, B=192): REJECTED — 15.21 ms base vs 15.53 ms
packed (0.979x), bitwise-identical outputs (max_rel_err 0.0). XLA
already runs the three projections efficiently (same weights-stationary
GEMM stream); the pack adds a (768, 2304) concat materialization per
scan iteration without reducing MXU work. Production keeps separate
q/k/v linears (ops/attention.py mha).

Harness follows the CLAUDE.md benchmarking rules: chained scan with
per-iteration input perturbation from the xs stream + host fetch sync.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_qkv_pack.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)   # bench B=16 panos
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import clip_vit
    from etpnav_tpu.ops.attention import _fused_nobias_enabled
    from etpnav_tpu.ops.basic import layer_norm, linear, quick_gelu

    cfg = r2r_config().clip
    params = jax.device_put(
        clip_vit.init_clip_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B = args.batch
    rgb = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3)), jnp.uint8)
    xs = jnp.arange(1, args.iters + 1, dtype=jnp.int32) % 7
    bf = jnp.bfloat16

    # ---- packed-QKV trunk clone ----
    import math

    def mha_packed(p, x):
        Bx, L, D = x.shape
        H = cfg.heads
        hd = D // H
        wqkv = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]], 1)
        bqkv = jnp.concatenate([p["q"]["b"], p["k"]["b"], p["v"]["b"]])
        qkv = (jnp.dot(x, wqkv.astype(x.dtype),
                       preferred_element_type=jnp.float32)
               + bqkv.astype(jnp.float32)).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rs = lambda a: a.reshape(Bx, L, H, hd).transpose(0, 2, 1, 3)
        if _fused_nobias_enabled():
            from etpnav_tpu.ops.pallas_attention import fused_attention
            ctx = fused_attention(rs(q), rs(k), rs(v), 1.0 / math.sqrt(hd))
        else:
            qh, kh, vh = rs(q), rs(k), rs(v)
            lg = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
            pr = jax.nn.softmax(lg / math.sqrt(hd), -1).astype(x.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", pr, vh,
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(Bx, L, D)
        return linear(p["o"], ctx)

    def trunk_packed(p, x, dtype):
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
            h = h + mha_packed(bp["attn"], a)
            m = layer_norm(h, bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                           cfg.layer_norm_eps)
            m = quick_gelu(linear(bp["mlp_fc"], m))
            return h + linear(bp["mlp_proj"], m), None

        first = jax.tree_util.tree_map(lambda a: a[:-1], p["blocks"])
        last = jax.tree_util.tree_map(lambda a: a[-1], p["blocks"])
        x, _ = jax.lax.scan(block, x, first)
        a = layer_norm(x, last["ln_1"]["scale"], last["ln_1"]["bias"],
                       cfg.layer_norm_eps)
        from etpnav_tpu.ops.attention import mha as mha_ref
        h = x[:, :1] + mha_ref(last["attn"], a[:, :1], a, cfg.heads)
        m = layer_norm(h, last["ln_2"]["scale"], last["ln_2"]["bias"],
                       cfg.layer_norm_eps)
        m = quick_gelu(linear(last["mlp_fc"], m))
        h = h + linear(last["mlp_proj"], m)
        cls_out = layer_norm(h[:, 0], p["ln_post"]["scale"],
                             p["ln_post"]["bias"], cfg.layer_norm_eps)
        return jnp.dot(cls_out, p["proj"].astype(dtype),
                       preferred_element_type=jnp.float32)

    def encode_packed(p, rgb_u8):
        ps = cfg.patch_size
        s = jnp.tile(1.0 / (255.0 * clip_vit.CLIP_STD), ps * ps)
        t = jnp.tile(-clip_vit.CLIP_MEAN / clip_vit.CLIP_STD, ps * ps)
        w = p["patch_embed"].astype(jnp.float32)
        w_folded = (s[:, None] * w).astype(bf)
        b_folded = jnp.dot(t, w, preferred_element_type=jnp.float32)
        x = clip_vit._patchify(rgb_u8, ps).astype(bf)
        x = (jnp.dot(x, w_folded, preferred_element_type=jnp.float32)
             + b_folded).astype(bf)
        return trunk_packed(p, x, bf)

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

    def base(p, t):
        return clip_vit.encode_image_uint8(
            p, cfg, rgb + t.astype(jnp.uint8), dtype=bf).sum()

    def packed(p, t):
        return encode_packed(p, rgb + t.astype(jnp.uint8)).sum()

    # numeric parity first (same math, different GEMM grouping)
    a = np.asarray(jax.jit(lambda p: clip_vit.encode_image_uint8(
        p, cfg, rgb[:8], dtype=bf))(params))
    b = np.asarray(jax.jit(lambda p: encode_packed(p, rgb[:8]))(params))
    err = float(np.max(np.abs(a - b) / (np.abs(a) + 1e-3)))

    out = {"batch": B, "iters": args.iters,
           "backend": jax.default_backend(), "max_rel_err": err,
           "base_ms": round(timed(base), 2),
           "packed_ms": round(timed(packed), 2)}
    out["speedup"] = round(out["base_ms"] / out["packed_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
