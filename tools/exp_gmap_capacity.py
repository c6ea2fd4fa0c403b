"""Measure topological-graph slot demand at reference episode shapes.

VERDICT r3 #5: the reference lets graphs grow unboundedly
(graph_utils.py:193-257; max_action_steps=100, vlnbert_init.py:41) while
this repo caps [stop]+nodes+ghosts at PLANNER.max_gmap_len=64. This probe
runs train-mode rollouts at reference graph shapes (T=20 planner steps,
K=5 NMS candidates/step, merge/consume as configured) with a LARGE cap so
emit() never drops, and records the true per-episode peak slot demand —
answering "would G=64 have evicted?" with a histogram instead of an
assertion.

Model dims are tiny (untrained) so the probe runs on CPU; capacity
dynamics are driven by the env geometry, the NMS candidate stream, the
teacher, and sample_ratio, all of which run at production settings.
sample_ratio=0.75 is the production schedule-sampling start point
(run_r2r/main.bash); --sample-ratio 0.0 gives the wandering worst case
(pure untrained policy, episodes hit the T cap).

Usage: python tools/exp_gmap_capacity.py [--intervals 6] [--num-envs 8]
       [--traj-len 20] [--cap 256] [--sample-ratio 0.75]
"""

import argparse
import dataclasses
import json

import numpy as np


def run_setting(cfg_base, *, consume, merge, sample_ratio, intervals,
                num_envs, seed=0):
    import jax
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.agent import JittedAgent, init_agent_params
    from etpnav_tpu.training.rollout import RolloutEngine

    cfg = dataclasses.replace(
        cfg_base,
        graph=dataclasses.replace(cfg_base.graph, consume_ghost=consume,
                                  merge_ghost=merge))
    envs = GeometricNavEnv(
        num_envs=num_envs, seed=seed, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    params = init_agent_params(jax.random.PRNGKey(seed), cfg)
    agent = JittedAgent(cfg, params)
    engine = RolloutEngine(cfg, agent, envs, seed=seed)
    peaks, ev_g, ev_n = [], 0, 0
    for _ in range(intervals):
        engine.run("train", sample_ratio=sample_ratio)
        for s in engine.last_gmap_stats:
            peaks.append(s["peak_slots"])
            ev_g += s["evicted_ghosts"]
            ev_n += s["evicted_nodes"]
    peaks = np.asarray(peaks)
    return {
        "consume_ghost": consume, "merge_ghost": merge,
        "sample_ratio": sample_ratio, "episodes": len(peaks),
        "peak_min": int(peaks.min()), "peak_mean": float(peaks.mean()),
        "peak_p50": int(np.percentile(peaks, 50)),
        "peak_p90": int(np.percentile(peaks, 90)),
        "peak_max": int(peaks.max()),
        "over_48": int((peaks > 48).sum()),
        "over_64": int((peaks > 64).sum()),
        "evicted_ghosts": ev_g, "evicted_nodes": ev_n,
        "hist": {str(lo): int(((peaks > lo) & (peaks <= lo + 8)).sum())
                 for lo in range(0, int(peaks.max()) + 1, 8)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--intervals", type=int, default=6)
    ap.add_argument("--num-envs", type=int, default=8)
    ap.add_argument("--traj-len", type=int, default=20)
    ap.add_argument("--cap", type=int, default=256,
                    help="oversized max_gmap_len so nothing evicts and "
                         "peak_slots records true demand")
    ap.add_argument("--sample-ratio", type=float, default=None,
                    help="single sample_ratio (default: sweep .75 and 0)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from etpnav_tpu.config import tiny_config

    base = tiny_config()
    base = dataclasses.replace(
        base,
        planner=dataclasses.replace(base.planner, max_gmap_len=args.cap,
                                    gmap_len_buckets=()),
        il=dataclasses.replace(base.il, max_traj_len=args.traj_len),
    )
    ratios = ([args.sample_ratio] if args.sample_ratio is not None
              else [0.75, 0.0])
    for ratio in ratios:
        for consume, merge in [(True, True), (False, True), (True, False)]:
            out = run_setting(base, consume=consume, merge=merge,
                              sample_ratio=ratio,
                              intervals=args.intervals,
                              num_envs=args.num_envs, seed=args.seed)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
