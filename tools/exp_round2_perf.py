"""Round-2 perf probe: locate the remaining per-chip headroom.

Times (honest chained-scan harness, per-iteration input perturbation,
host-fetch sync — see bench.py docstring):
  clip_full      - production CLIP tower (B*12 images)
  clip_noattn    - attention core replaced by identity (QKVO GEMMs kept):
                   bounds what the (50,64) attention-core MXU
                   underutilization + softmax costs end-to-end
  clip_noattn_noproj - attention half fully removed (MLP+patch only)
  depth_full     - production depth encoder
  depth_stem     - stem conv+gn+pool only
  depth_trunk    - stem + 4 bottleneck stages (no compression)
  nms_full       - heatmap softmax+NMS+candidates

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_round2_perf.py [--batch 16]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import clip_vit, depth_resnet, waypoint
    from etpnav_tpu.models.clip_vit import _patchify, preprocess_rgb
    from etpnav_tpu.ops.basic import layer_norm, linear, quick_gelu
    from etpnav_tpu.training import agent as agent_lib

    cfg = r2r_config()
    params = jax.device_put(
        agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B, V = args.batch, 12
    rgb = jnp.asarray(rng.integers(0, 256, (B * V, 224, 224, 3)),
                      jnp.uint8)
    dep = jnp.asarray(rng.random((B * V, 128, 128, 1), np.float32))
    xs = jnp.arange(1, args.iters + 1, dtype=jnp.int32) % 7
    bf = jnp.bfloat16

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

    ccfg = cfg.clip

    def clip_embed(p, t):
        # uint8-folded normalization, as in encode_image_uint8
        ps = ccfg.patch_size
        s = jnp.tile(1.0 / (255.0 * clip_vit.CLIP_STD), ps * ps)
        tt = jnp.tile(-clip_vit.CLIP_MEAN / clip_vit.CLIP_STD, ps * ps)
        w = p.clip["patch_embed"].astype(jnp.float32)
        w_folded = (s[:, None] * w).astype(bf)
        b_folded = jnp.dot(tt, w, preferred_element_type=jnp.float32)
        x = _patchify(rgb + t.astype(jnp.uint8), ps).astype(bf)
        return (jnp.dot(x, w_folded, preferred_element_type=jnp.float32)
                + b_folded).astype(bf)

    def clip_variant(p, t, attn_mode):
        from etpnav_tpu.ops.attention import mha
        x = clip_embed(p, t)
        Bi = x.shape[0]
        cp = p.clip
        cls = jnp.broadcast_to(cp["class_embedding"].astype(bf)[None, None],
                               (Bi, 1, ccfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + cp["positional_embedding"].astype(bf)[None]
        x = layer_norm(x, cp["ln_pre"]["scale"], cp["ln_pre"]["bias"],
                       ccfg.layer_norm_eps)

        def block(h, bp):
            a = layer_norm(h, bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                           ccfg.layer_norm_eps)
            if attn_mode == "full":
                h = h + mha(bp["attn"], a, a, ccfg.heads)
            elif attn_mode == "noattn":
                # QKVO GEMMs kept, (50,64) attention core skipped
                q = linear(bp["attn"]["q"], a)
                _ = linear(bp["attn"]["k"], a)
                v = linear(bp["attn"]["v"], a)
                h = h + linear(bp["attn"]["o"], q * 0 + v)
            # 'none': attention half removed entirely
            m = layer_norm(h, bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                           ccfg.layer_norm_eps)
            m = quick_gelu(linear(bp["mlp_fc"], m))
            return h + linear(bp["mlp_proj"], m), None

        blocks = cp["blocks"]
        x, _ = jax.lax.scan(block, x, blocks, unroll=True)
        return x[:, 0].astype(jnp.float32).sum()

    dcfg = cfg.depth
    dr = depth_resnet

    def depth_stem(p, t):
        x = (dep + t.astype(jnp.float32) * 1e-6).astype(bf)
        x = dr.conv2d(p.depth["stem_conv"], x, 2, 3)
        x = jax.nn.relu(dr.group_norm(p.depth["stem_gn"], x, dcfg.ngroups))
        x = dr.max_pool(x)
        return x.astype(jnp.float32).sum()

    def depth_full(p, t):
        return depth_resnet.encode_depth(
            p.depth, dcfg, dep + t.astype(jnp.float32) * 1e-6,
            dtype=bf).sum()

    def nms_full(p, t):
        hm = (jnp.broadcast_to(t.astype(jnp.float32), (B, 120, 12))
              * jnp.arange(120 * 12, dtype=jnp.float32).reshape(1, 120,
                                                                12))
        c = waypoint.heatmap_to_candidates(cfg.waypoint, hm)
        return c["distances"].sum() + c["angles_ccw"].sum()

    out = {"batch": B, "iters": args.iters,
           "backend": jax.default_backend()}
    for name, fn in (
            ("clip_full", lambda p, t: clip_variant(p, t, "full")),
            ("clip_noattn", lambda p, t: clip_variant(p, t, "noattn")),
            ("clip_mlponly", lambda p, t: clip_variant(p, t, "none")),
            ("clip_embed", lambda p, t: clip_embed(p, t).sum()),
            ("depth_full", depth_full),
            ("depth_stem", depth_stem),
            ("nms", nms_full)):
        out[f"{name}_ms"] = round(timed(fn), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
