"""Serving benchmark: sustained throughput + latency percentiles for
NavServer under concurrent sessions (etpnav_tpu/serving.py).

Spawns `--sessions` client threads, each stepping its own episode with
fresh observations as fast as the server allows, for `--steps` steps
per client after warmup. Reports steps/s (== panoramas/s: one step is
one 12-view panorama) and per-step latency p50/p95/p99.

Note the axon-tunnel caveat (CLAUDE.md): per-dispatch round trip is
~50 ms through the tunnel, which dominates latency here; on a directly
attached host the same batched dispatch path has none of that overhead,
so treat latency numbers as tunnel-bound upper bounds and throughput as
the load-bearing metric (batching amortizes the round trip).

MEASURED (v5e-1 via axon tunnel, 2026-08, 16 sessions x 20 steps):
1.2 steps/s, p50 2.18 s, p95 2.72 s — entirely transfer-bound: each
16-slot batch ships 16x12 uint8 224^2 views = 28.9 MB over the ~17 MB/s
tunnel (~1.7 s), while the device compute for the same batch is ~18 ms
(bench.py: 874 panos/s). On a directly attached host the same code path
is compute-bound at the bench number; the tunnel figure is recorded here
as the honest end-to-end measurement for THIS rig.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/serving_bench.py [--sessions 16] [--steps 20]
"""

import argparse
import json
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--max-wait-ms", type=float, default=30.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (CI smoke)")
    args = ap.parse_args()

    import jax

    from etpnav_tpu.config import r2r_config, tiny_config
    from etpnav_tpu.serving import NavServer
    from etpnav_tpu.training.agent import JittedAgent, init_agent_params

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    cfg = tiny_config() if args.tiny else r2r_config()
    agent = JittedAgent(cfg, init_agent_params(jax.random.PRNGKey(0), cfg))
    server = NavServer(cfg, agent, max_batch=args.sessions,
                       max_wait_ms=args.max_wait_ms)
    n_programs = server.warmup()

    rng = np.random.default_rng(0)
    H = cfg.clip.image_size
    Hd = cfg.depth.input_size
    lat = []
    lat_lock = threading.Lock()
    barrier = threading.Barrier(args.sessions)

    def client(seed):
        r = np.random.default_rng(seed)
        toks = r.integers(1, cfg.planner.vocab_size, 24)
        sid = server.create_session(toks)
        rgb = r.integers(0, 256, (12, H, H, 3)).astype(np.uint8)
        dep = r.random((12, Hd, Hd, 1)).astype(np.float32)
        pos = np.zeros(3)
        ori = np.array([0.0, 0.0, 0.0, 1.0])
        barrier.wait()
        mine = []
        for k in range(args.steps):
            rgb2 = rgb + np.uint8(k % 7)           # fresh pixels per step
            t0 = time.perf_counter()
            res = server.step(sid, rgb2, dep, pos, ori)
            mine.append(time.perf_counter() - t0)
            if res["done"]:
                server.close_session(sid)
                sid = server.create_session(toks)
            else:
                g = res["action"].get("ghost_pos")
                if g is not None:
                    pos = np.asarray(g, np.float64)
        with lat_lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.sessions)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()

    lat_ms = np.sort(np.array(lat)) * 1e3
    total = args.sessions * args.steps
    print(json.dumps({
        "sessions": args.sessions, "steps_per_session": args.steps,
        "programs_warmed": n_programs,
        "steps_per_s": round(total / wall, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
