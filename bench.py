"""TPU benchmark: panoramas/sec through the full perception+planning
pipeline (CLIP ViT-B/32 + depth ResNet-50 + waypoint TRM + NMS + pano
encoder), the reference's hot loop (SURVEY.md §3.1).

Methodology: the pipeline is chained under one jitted lax.scan so the
measurement reflects device-resident throughput (as in a double-buffered
rollout where observations stream asynchronously), with a single host
fetch at the end forcing completion (plain block_until_ready is not a
reliable sync point on the axon tunnel, and per-call dispatch over the
tunnel adds ~50 ms that a production host pipelines away).

CRITICAL correctness detail: every scan iteration perturbs the inputs
with a value from the scan's xs stream. A loop whose body is
loop-invariant gets hoisted by XLA — computed ONCE outside the loop —
which silently turns the "benchmark" into a measurement of one execution
plus N scalar adds (observed: total time flat in N, implying >3x the
chip's peak FLOPs). The uint8/f32 adds below cost ~2% and make each
iteration's compute genuinely irreducible.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by BASELINE_PANOS_PER_SEC, an estimate of the
reference's single-A100 torch-AMP throughput on the same pipeline
(12x CLIP ViT-B/32 + depth ResNet + waypoint TRM per panorama at
~50% fp16 utilization). The BASELINE.json north star asks for >=5x on
v5e-8; this bench runs on ONE v5e chip, so per-chip parity (~1x) scales
to ~8x on the 8-chip mesh the sharded trainer targets.
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

    # Server operating point: B=16 panoramas (192 images) per dispatch.
    # Measured sweep on v5e-1 (tools/perf_probe.py --batch N): 8 -> 835,
    # 12 -> 910, 16 -> 932, 20 -> 923, 24 -> 866, 32 -> 825, 64 -> 813
    # panos/s — per-pano efficiency peaks at B=16 and degrades once the
    # (B*12, 50, 768) activation set outgrows VMEM headroom.
    B = 16
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (B, 12, 224, 224, 3)), jnp.uint8)
    depth = jnp.asarray(rng.random((B, 12, 128, 128, 1), np.float32))

    def one_pano(params, rgb, depth):
        return agent_lib.perceive(params, cfg, rgb,
                                  depth)["avg_pano_embeds"]

    def chained(params, rgb, depth, xs):
        def body(carry, x):
            # irreducible per-iteration input perturbation (see module
            # docstring): new pixels each step, like a real obs stream
            r = rgb + x.astype(jnp.uint8)
            d = depth + x.astype(jnp.float32) * 1e-6
            return carry + one_pano(params, r, d).sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    fn = jax.jit(chained)
    iters = 96                   # ~1.6 s per timed call at B=16
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7
    np.asarray(fn(params, rgb, depth, xs))             # compile + warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(params, rgb, depth, xs))         # fetch = sync
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
