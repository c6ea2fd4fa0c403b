"""Honest per-component TPU timing probe for the perception pipeline.

Usage: python tools/perf_probe.py [--batch 32] [--iters 48]

Times each stage of the fused perception program (CLIP tower, depth
ResNet, waypoint TRM, NMS/candidates, full perceive) with the chained-
scan harness bench.py uses. Two measurement rules this script encodes
(learned the hard way — see CLAUDE.md "Benchmarking gotchas"):

1. every scan iteration must perturb its inputs with a value from the
   scan xs stream, otherwise XLA hoists the loop-invariant body and you
   time ONE execution no matter the loop length;
2. sync by fetching the result to host (np.asarray) — on the axon
   tunnel, block_until_ready is not a reliable sync point.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import clip_vit, depth_resnet, waypoint
    from etpnav_tpu.training import agent as agent_lib

    cfg = r2r_config()
    params = jax.device_put(
        agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B, V = args.batch, 12
    rgb = jnp.asarray(rng.integers(0, 256, (B, V, 224, 224, 3)), jnp.uint8)
    dep = jnp.asarray(rng.random((B, V, 128, 128, 1), np.float32))
    rgbf = rgb.reshape(B * V, 224, 224, 3)
    depf = dep.reshape(B * V, 128, 128, 1)
    xs = jnp.arange(1, args.iters + 1, dtype=jnp.int32) % 7
    bf = jnp.bfloat16

    def timed(fn):
        f = jax.jit(lambda p, xs: jax.lax.scan(
            lambda c, t: (c + fn(p, t), None), jnp.float32(0), xs)[0])
        np.asarray(f(params, xs))                      # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, xs))
            ts.append(time.perf_counter() - t0)
        return min(ts) / args.iters * 1e3

    def full(p, t):
        return agent_lib.perceive(
            p, cfg, rgb + t.astype(jnp.uint8),
            dep + t.astype(jnp.float32) * 1e-6)["avg_pano_embeds"].sum()

    def clip_only(p, t):
        return clip_vit.encode_image_uint8(
            p.clip, cfg.clip, rgbf + t.astype(jnp.uint8), dtype=bf).sum()

    def depth_only(p, t):
        return depth_resnet.encode_depth(
            p.depth, cfg.depth, depf + t.astype(jnp.float32) * 1e-6,
            dtype=bf).sum()

    def depth_wp(p, t):
        ds = depth_resnet.encode_depth(
            p.depth, cfg.depth, depf + t.astype(jnp.float32) * 1e-6,
            dtype=bf)
        s, c = ds.shape[1], ds.shape[-1]
        chw = ds.transpose(0, 3, 1, 2).reshape(B, V, c, s, s)
        cw = jnp.concatenate([chw[:, :1], chw[:, 1:][:, ::-1]], axis=1)
        return waypoint.waypoint_heatmap(
            p.waypoint, cfg.waypoint, cw.reshape(B, V, -1)).sum()

    def nav_only(p, t):
        # one planner scoring step: text memory + padded graph -> logits
        G = cfg.planner.max_gmap_len
        L = cfg.planner.max_txt_len
        D = cfg.planner.hidden_size
        g = np.random.default_rng(1)
        txt = jnp.asarray(g.standard_normal((B, L, D)), jnp.float32)
        txt_m = jnp.ones((B, L), bool)
        gmap = {
            "img_fts": jnp.asarray(g.standard_normal((B, G, D)),
                                   jnp.float32),
            "step_ids": jnp.zeros((B, G), jnp.int32),
            "pos_fts": jnp.asarray(g.standard_normal((B, G, 7)),
                                   jnp.float32),
            "mask": jnp.ones((B, G), bool),
            "visited": jnp.zeros((B, G), bool),
            "pair_dists": jnp.zeros((B, G, G), jnp.float32),
        }
        out = agent_lib.score_navigation(
            p, cfg, txt + t.astype(jnp.float32) * 1e-6, txt_m, gmap)
        return jnp.where(jnp.isfinite(out["global_logits"]),
                         out["global_logits"], 0.0).sum()

    def nms_only(p, t):
        hm = (jnp.broadcast_to(t.astype(jnp.float32), (B, 120, 12))
              * jnp.arange(120 * 12, dtype=jnp.float32).reshape(1, 120, 12))
        c = waypoint.heatmap_to_candidates(cfg.waypoint, hm)
        return c["distances"].sum() + c["angles_ccw"].sum()

    out = {"batch": B, "iters": args.iters,
           "backend": jax.default_backend()}
    for name, fn in (("full", full), ("clip", clip_only),
                     ("depth", depth_only), ("depth+wp", depth_wp),
                     ("nms", nms_only), ("nav", nav_only)):
        out[f"{name}_ms"] = round(timed(fn), 2)
    out["panos_per_s"] = round(B / (out["full_ms"] / 1e3), 1)
    out["planner_steps_per_s"] = round(B / (out["nav_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
