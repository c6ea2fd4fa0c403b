"""Bisect the fused-perceive slowdown: parts sum to ~16 ms but the full
program measures ~22 ms at B=16 (bench.py / exp_full_perceive.py).

Stages timed in ONE process (so chip/tunnel variance cancels):
  clip      - CLIP tower only (calibration vs. 13.65 ms this morning)
  depth     - depth encoder only (stem-matmul version)
  enc_heat  - CLIP + depth + waypoint heatmap (no NMS/candidates)
  enc_cand  - + NMS + candidate gather + token assembly (encode_panorama)
  full      - + pano encoder + masked average (perceive)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_perceive_bisect.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import clip_vit, depth_resnet, waypoint
    from etpnav_tpu.training import agent as agent_lib

    cfg = r2r_config()
    params = jax.device_put(
        agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B, V = 16, 12
    rgb = jnp.asarray(rng.integers(0, 256, (B, V, 224, 224, 3)),
                      jnp.uint8)
    depth = jnp.asarray(rng.random((B, V, 128, 128, 1), np.float32))
    iters = 48
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7
    bf = jnp.bfloat16
    out = {"B": B, "backend": jax.default_backend()}

    def timed(name, fn):
        f = jax.jit(lambda p, xs: jax.lax.scan(
            lambda c, t: (c + fn(p, t), None), jnp.float32(0), xs)[0])
        np.asarray(f(params, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, xs))
            ts.append(time.perf_counter() - t0)
        out[f"{name}_ms"] = round(min(ts) / iters * 1e3, 2)
        print(json.dumps(out), flush=True)

    def clip_only(p, t):
        r = (rgb + t.astype(jnp.uint8)).reshape(B * V, 224, 224, 3)
        return clip_vit.encode_image_uint8(p.clip, cfg.clip, r,
                                           dtype=bf).sum()

    def depth_only(p, t):
        d = (depth + t.astype(jnp.float32) * 1e-6).reshape(
            B * V, 128, 128, 1)
        return depth_resnet.encode_depth(p.depth, cfg.depth, d,
                                         dtype=bf).sum()

    def enc_heat(p, t):
        r = (rgb + t.astype(jnp.uint8)).reshape(B * V, 224, 224, 3)
        rgb_f = clip_vit.encode_image_uint8(p.clip, cfg.clip, r, dtype=bf)
        d = (depth + t.astype(jnp.float32) * 1e-6).reshape(
            B * V, 128, 128, 1)
        ds = depth_resnet.encode_depth(p.depth, cfg.depth, d, dtype=bf)
        s, c = ds.shape[1], ds.shape[-1]
        chw = ds.transpose(0, 3, 1, 2).reshape(B, V, c, s, s)
        cw = jnp.concatenate([chw[:, :1], chw[:, 1:][:, ::-1]], axis=1)
        hm = waypoint.waypoint_heatmap(p.waypoint, cfg.waypoint,
                                       cw.reshape(B, V, -1))
        return rgb_f.sum() + hm.sum() + ds.sum()

    def enc_cand(p, t):
        r = rgb + t.astype(jnp.uint8)
        d = depth + t.astype(jnp.float32) * 1e-6
        wp = agent_lib.encode_panorama(p, cfg, r, d)
        return (wp["rgb_fts"].sum() + wp["heatmap"].sum()
                + wp["cand_distances"].sum())

    def full(p, t):
        r = rgb + t.astype(jnp.uint8)
        d = depth + t.astype(jnp.float32) * 1e-6
        return agent_lib.perceive(p, cfg, r, d)["avg_pano_embeds"].sum()

    timed("clip", clip_only)
    timed("depth", depth_only)
    timed("enc_heat", enc_heat)
    timed("enc_cand", enc_cand)
    timed("full", full)


if __name__ == "__main__":
    main()
