"""Train-path benchmark: the fused learn_step and the full rollout+learn
iteration (sequential vs pipelined), at r2r shapes.

The product is a trainer; BENCH_r02 only timed inference-side programs.
This probe times the training side (reference unit of progress: one train
iteration, ss_trainer_ETP.py:482-506):

1. learn-step: K iterations of the fused replay train step chained under
   one jitted lax.scan — params/opt-state thread the carry, so XLA cannot
   hoist the body (CLAUDE.md benchmarking gotcha); the synthetic batch is
   shape/dtype-exact for an r2r rollout interval (B envs x T steps).
   Also A/Bs the sparse provenance aggregation against the legacy dense
   (B,T,G,T*P) matrix at identical shapes.
2. iteration: FinetuneTrainer.train over GeometricNavEnv pools —
   sequential (one pool of 2N) vs PipelinedRollout (2 pools of N) — wall
   time per iteration and the rollout/learn phase split.

Emits each measurement as it lands (tunnel sessions die; partial output
must survive).
"""

import argparse
import json
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def synth_batch(cfg, B, rng):
    """Shape/dtype-exact synthetic rollout record batch (sparse agg)."""
    p = cfg.planner
    T = cfg.il.max_traj_len
    P = cfg.waypoint.max_predictions + 12
    K = cfg.waypoint.max_predictions
    G = p.max_gmap_len
    L = cfg.il.max_text_len
    M = T * K
    g = np.random.default_rng(rng)
    txt_ids = g.integers(0, p.vocab_size, (B, L)).astype(np.int32)
    txt_masks = np.ones((B, L), bool)
    vp_mask = g.random((B, T, P)) < 0.8
    vp_mask[..., 0] = True
    step_valid = np.ones((B, T), bool)
    # node slots: slot 1+t aggregates step t (realistic: one node/step)
    agg_node_step = np.full((B, T, G), -1, np.int32)
    for t in range(T):
        agg_node_step[:, t, 1:t + 2] = np.arange(t + 1)
    # ghost entries: fill ~K entries per step into ghost slots
    agg_ent_slot = g.integers(T + 2, G, (B, T, M)).astype(np.int32)
    agg_ent_tok = g.integers(0, T * P, (B, T, M)).astype(np.int32)
    agg_ent_val = (g.random((B, T, M)) < 0.5).astype(np.float32) * 0.25
    gmap_mask = np.zeros((B, T, G), bool)
    gmap_mask[:, :, :G // 2] = True
    teacher = g.integers(0, G // 2, (B, T)).astype(np.int32)
    return {
        "txt_ids": txt_ids, "txt_masks": txt_masks,
        "vp_rgb": g.standard_normal((B, T, P, p.image_feat_size))
            .astype(np.float32),
        "vp_dep": g.standard_normal((B, T, P, p.depth_feat_size))
            .astype(np.float32),
        "vp_loc": g.standard_normal((B, T, P, 4)).astype(np.float32),
        "vp_nav": g.integers(0, 2, (B, T, P)).astype(np.int32),
        "vp_mask": vp_mask,
        "agg_node_step": agg_node_step,
        "agg_ent_slot": agg_ent_slot,
        "agg_ent_tok": agg_ent_tok,
        "agg_ent_val": agg_ent_val,
        "gmap_step_ids": g.integers(0, T, (B, T, G)).astype(np.int32),
        "gmap_pos_fts": g.standard_normal((B, T, G, 7)).astype(np.float32),
        "gmap_mask": gmap_mask,
        "gmap_visited": np.zeros((B, T, G), bool),
        "gmap_pair": np.abs(g.standard_normal((B, T, G, G)))
            .astype(np.float32),
        "teacher": teacher, "step_valid": step_valid,
    }


def dense_from_sparse(batch, P):
    """Legacy dense agg_w equivalent of the sparse fields (for the A/B)."""
    B, T, G = batch["agg_node_step"].shape
    S = T * P
    w = np.zeros((B, T, G, S), np.float32)
    for b in range(B):
        for t in range(T):
            for si in range(G):
                ts = batch["agg_node_step"][b, t, si]
                if ts >= 0:
                    valid = batch["vp_mask"][b, ts]
                    w[b, t, si, ts * P:(ts + 1) * P][valid] = \
                        1.0 / max(valid.sum(), 1)
            np.add.at(w[b, t], (batch["agg_ent_slot"][b, t],
                                batch["agg_ent_tok"][b, t]),
                      batch["agg_ent_val"][b, t])
    return w


def time_learn_step(cfg, B, chain, repeats, dense=False, dropout=True):
    import jax
    import jax.numpy as jnp
    import optax

    from etpnav_tpu.models import planner as planner_lib
    from etpnav_tpu.training.finetune import (apply_il_runtime_flags,
                                              compute_il_loss,
                                              make_il_optimizer,
                                              replay_logits)

    apply_il_runtime_flags(cfg)
    host = synth_batch(cfg, B, rng=0)
    if dense:
        P = cfg.waypoint.max_predictions + 12
        host["agg_w"] = dense_from_sparse(host, P)
        for k in ("agg_node_step", "agg_ent_slot", "agg_ent_tok",
                  "agg_ent_val"):
            del host[k]
    params = planner_lib.init_planner_params(
        jax.random.PRNGKey(0), cfg.planner)
    tx = make_il_optimizer(cfg, params)
    opt_state = tx.init(params)
    batch = jax.device_put(host)
    nbytes = sum(v.nbytes for v in host.values())

    if dropout:
        loss_fn = compute_il_loss
    else:
        # dropout/RNG cost bound: same differentiable path, train=False
        # replay (no dropout masks, no threefry traffic)
        def loss_fn(planner_params, cfg_, batch_, rng_):
            import jax.numpy as jnp
            logits = replay_logits(planner_params, cfg_, batch_, rng=None,
                                   train=False)
            teacher = batch_["teacher"]
            valid = (teacher >= 0) & batch_["step_valid"]
            safe_t = jnp.maximum(teacher, 0)
            logp = jax.nn.log_softmax(
                jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1)
            nll = -jnp.take_along_axis(
                logp, safe_t[..., None], axis=-1)[..., 0]
            total = jnp.maximum(batch_["step_valid"].sum(), 1)
            return cfg_.il.ml_weight * jnp.where(
                valid, nll, 0.0).sum() / total

    def chained(params, opt_state, batch, rngs):
        def body(carry, rng):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, cfg, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), rngs)
        return losses

    fn = jax.jit(chained)
    # production dropout-key impl (cfg.il.rng_impl, rbg by default)
    rngs = jax.random.split(
        jax.random.key(1, impl=cfg.il.rng_impl), chain)
    t0 = time.perf_counter()
    losses = np.asarray(fn(params, opt_state, batch, rngs))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(losses).all()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(params, opt_state, batch, rngs))
        times.append(time.perf_counter() - t0)
    ms = min(times) / chain * 1e3
    log(section="learn_step", agg="dense" if dense else "sparse",
        dropout=dropout, B=B,
        T=cfg.il.max_traj_len, G=cfg.planner.max_gmap_len,
        ms_per_step=round(ms, 2), steps_per_sec=round(1e3 / ms, 2),
        samples_per_sec=round(B * 1e3 / ms, 1),
        record_mbytes=round(nbytes / 2**20, 2),
        compile_s=round(compile_s, 1), chain=chain)
    return ms


def time_iteration(cfg, num_envs, iters, pipelined):
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.finetune import FinetuneTrainer

    def mkenv(n, seed):
        return GeometricNavEnv(
            n, seed=seed, vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)

    if pipelined:
        envs = [mkenv(num_envs // 2, 0), mkenv(num_envs // 2, 1)]
    else:
        envs = mkenv(num_envs, 0)
    tr = FinetuneTrainer(cfg, envs, seed=0)
    t0 = time.perf_counter()
    tr.train(iters=1)                       # compile warmup
    warm = time.perf_counter() - t0
    log(section="iteration_warmup", pipelined=pipelined,
        warmup_s=round(warm, 1))
    t0 = time.perf_counter()
    tr.train(iters=iters)
    dt = (time.perf_counter() - t0) / iters
    phases = {k: round(v, 3) for k, v in tr.timer.means().items()}
    log(section="iteration", pipelined=pipelined, num_envs=num_envs,
        sec_per_iter=round(dt, 3), iters_per_sec=round(1 / dt, 4),
        phase_means_s=phases)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--mode", default="all",
                    choices=["all", "learn", "iter"])
    ap.add_argument("--skip-dense", action="store_true")
    ap.add_argument("--fp32", action="store_true",
                    help="planner use_bf16=False A/B")
    ap.add_argument("--nav-fp32", action="store_true",
                    help="nav_use_bf16=False A/B (nav stack only)")
    ap.add_argument("--quick", action="store_true",
                    help="learn: sparse+dropout program only")
    args = ap.parse_args()

    import jax

    import dataclasses

    from etpnav_tpu.config import r2r_config
    cfg = r2r_config()
    if args.fp32:
        cfg = dataclasses.replace(
            cfg, planner=dataclasses.replace(cfg.planner, use_bf16=False))
    if args.nav_fp32:
        cfg = dataclasses.replace(
            cfg, planner=dataclasses.replace(cfg.planner,
                                             nav_use_bf16=False))
    log(section="env", devices=str(jax.devices()),
        backend=jax.default_backend(), fp32=args.fp32,
        nav_fp32=args.nav_fp32)

    if args.mode in ("all", "learn"):
        sparse_ms = time_learn_step(cfg, args.batch, args.chain,
                                    args.repeats)
        if args.quick:
            return
        if not args.skip_dense:
            dense_ms = time_learn_step(cfg, args.batch, args.chain,
                                       args.repeats, dense=True)
            log(section="learn_ab",
                sparse_vs_dense=round(dense_ms / sparse_ms, 3))
        nodrop_ms = time_learn_step(cfg, args.batch, args.chain,
                                    args.repeats, dropout=False)
        log(section="dropout_cost",
            ms_with=round(sparse_ms, 2), ms_without=round(nodrop_ms, 2),
            dropout_overhead=round(sparse_ms / nodrop_ms - 1, 3))
    if args.mode in ("all", "iter"):
        seq = time_iteration(cfg, args.envs, args.iters, pipelined=False)
        pip = time_iteration(cfg, args.envs, args.iters, pipelined=True)
        log(section="pipeline_ab", speedup=round(seq / pip, 3))


if __name__ == "__main__":
    sys.exit(main())
