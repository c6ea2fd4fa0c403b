"""Batch-size re-sweep of the full perceive program (post depth-stem revert).

The B=16 operating point in bench.py was chosen against the 8.7 ms im2col
depth path (NOTES_ROUND2.md perf session 2); with the lax.conv stem back the
compute mix shifted toward CLIP, so re-measure panos/s at several batch
sizes in one process (one backend init, one upload of the params).

Usage: python tools/exp_batch_sweep.py [--iters 32] [--batches 8,16,24,32,48]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--batches", type=str, default="8,16,24,32,48")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.training import agent as agent_lib

    cfg = r2r_config()
    params = jax.device_put(
        agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    xs = jnp.arange(1, args.iters + 1, dtype=jnp.int32) % 7
    results = {}
    for B in [int(b) for b in args.batches.split(",")]:
        V = 12
        rgb = jnp.asarray(rng.integers(0, 256, (B, V, 224, 224, 3)),
                          jnp.uint8)
        dep = jnp.asarray(rng.random((B, V, 128, 128, 1), np.float32))

        def full(p, t):
            # perturb from the scan stream or XLA hoists the body
            return agent_lib.perceive(
                p, cfg, rgb + t.astype(jnp.uint8),
                dep + t.astype(jnp.float32) * 1e-6)["avg_pano_embeds"].sum()

        f = jax.jit(lambda p, xs: jax.lax.scan(
            lambda c, t: (c + full(p, t), None), jnp.float32(0), xs)[0])
        np.asarray(f(params, xs))                     # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, xs))                 # host fetch = sync
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / args.iters * 1e3
        results[B] = {"ms_per_dispatch": round(ms, 2),
                      "panos_per_s": round(B / (ms / 1e3), 1)}
        print(json.dumps({"batch": B, **results[B]}), flush=True)
    best = max(results, key=lambda b: results[b]["panos_per_s"])
    print(json.dumps({"best_batch": best, **results[best]}))


if __name__ == "__main__":
    main()
