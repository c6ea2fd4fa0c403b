"""Open up the learn step's BACKWARD at r2r learn shapes (VERDICT r4 #2).

BENCH_r04 learn_step_ms = 137.1 at (T=20, G=64); the r3 bisect put the
forward (loss only, threefry) at 44.5 ms and AdamW moments at ~4.6 ms,
leaving ~90 ms in backward — vs an ideal ~2x-forward. This probe
decomposes where that backward time goes and A/Bs the candidate levers:

  fwd          loss only (production rbg keys)       -> fwd floor
  grad_sgd     value_and_grad + p -= lr*g            -> fwd+bwd, no Adam
  full         value_and_grad + AdamW (= learn_step) -> the headline
  opt_only     AdamW update on fixed grads           -> optimizer cost
  no_dropout   train=False grad                      -> dropout bwd cost
  components   per-block fwd AND grad at replay shapes:
                 txt (B,L)  pano (B*T,P)  nav (B*T,G)  agg (gather path)
  agg_dense    aggregation grad with IL.agg_dense_device: dense W built
               on device -> d(pano) is one MXU matmul, not scatter-add
  full_dense   full step under IL.agg_dense_device
  remat        full step with per-layer nav remat forced ON at this G
  remat_dots   remat with policy=dots_with_no_batch_dims_saveable
               (backward keeps matmul outputs, recomputes elementwise)
  cost         XLA cost_analysis (flops / bytes) of fwd vs grad programs
               -> roofline: is the backward compute- or HBM-bound?

Methodology: every variant chains its program under one jitted lax.scan
whose body depends on the carry (params threaded / loss accumulated) and
on the xs stream (per-iteration rng or input perturbation), so XLA
cannot hoist the body (CLAUDE.md benchmarking gotcha). min-of-repeats
wall time over a host fetch.

Reference unit being decomposed: one train iteration's backward+step,
ss_trainer_ETP.py:502-506; the nav stack is vilmodel_cmt.py:721-750.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_train_bench import synth_batch  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def _time(fn, args, chain, repeats):
    t0 = time.perf_counter()
    out = np.asarray(fn(*args))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(out).all(), out
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / chain * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gmap", type=int, default=64)
    ap.add_argument("--traj", type=int, default=20)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--variants",
                    default="fwd,grad_sgd,full,opt_only,no_dropout,"
                            "components,agg_dense,full_dense,remat,"
                            "remat_dots,cost")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (probe smoke test)")
    args = ap.parse_args()
    variants = set(args.variants.split(","))

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from etpnav_tpu.config import r2r_config, tiny_config
    from etpnav_tpu.models import planner as planner_lib
    from etpnav_tpu.training.finetune import (compute_il_loss,
                                              dense_w_from_sparse,
                                              make_il_optimizer,
                                              replay_logits)

    cfg = tiny_config() if args.tiny else r2r_config()
    gmap = min(args.gmap, cfg.planner.max_gmap_len)
    traj = min(args.traj, cfg.il.max_traj_len)
    cfg = dataclasses.replace(
        cfg, planner=dataclasses.replace(cfg.planner, max_gmap_len=gmap),
        il=dataclasses.replace(cfg.il, max_traj_len=traj))
    B = args.batch
    p = cfg.planner
    T, G, L = cfg.il.max_traj_len, p.max_gmap_len, cfg.il.max_text_len
    P = cfg.waypoint.max_predictions + 12
    log(shapes={"B": B, "T": T, "G": G, "L": L, "P": P},
        backend=jax.default_backend())

    from etpnav_tpu.training.finetune import apply_il_runtime_flags
    apply_il_runtime_flags(cfg)   # 'full' measures the production path

    host = synth_batch(cfg, B, rng=0)
    params = planner_lib.init_planner_params(jax.random.PRNGKey(0), p)
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(params))
    log(planner_params=n_params)
    tx = make_il_optimizer(cfg, params)
    opt_state = tx.init(params)
    batch = jax.device_put(host)
    rngs = jax.random.split(jax.random.key(1, impl=cfg.il.rng_impl),
                            args.chain)
    chain, repeats = args.chain, args.repeats

    # ---------------- whole-step variants -----------------------------
    def chained_loss(cfg_, train=True):
        def chained(params, batch, rngs):
            def body(acc, rng):
                loss = (compute_il_loss(params, cfg_, batch, rng) if train
                        else _eval_loss(params, cfg_, batch))
                # acc-dependence chains iterations; rng comes from xs
                return acc + loss, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), rngs)
            return acc
        return jax.jit(chained)

    def _eval_loss(params_, cfg_, batch_):
        logits = replay_logits(params_, cfg_, batch_, None, train=False)
        teacher = batch_["teacher"]
        valid = (teacher >= 0) & batch_["step_valid"]
        safe_t = jnp.maximum(teacher, 0)
        logp = jax.nn.log_softmax(
            jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_t[..., None], -1)[..., 0]
        return (jnp.where(valid, nll, 0.0).sum()
                / jnp.maximum(batch_["step_valid"].sum(), 1))

    def chained_grad(cfg_, update, train=True):
        def chained(params, opt_state, batch, rngs):
            def body(carry, rng):
                params, opt_state = carry
                fn = (compute_il_loss if train
                      else lambda pr, c, b, r: _eval_loss(pr, c, b))
                loss, grads = jax.value_and_grad(fn)(
                    params, cfg_, batch, rng)
                params, opt_state = update(params, opt_state, grads)
                return (params, opt_state), loss
            _, losses = jax.lax.scan(body, (params, opt_state), rngs)
            return losses
        return jax.jit(chained)

    def sgd(params_, opt_state_, grads):
        return jax.tree_util.tree_map(
            lambda pp, g: pp - 1e-9 * g, params_, grads), opt_state_

    def adamw(params_, opt_state_, grads):
        updates, opt_state_ = tx.update(grads, opt_state_, params_)
        return optax.apply_updates(params_, updates), opt_state_

    if "fwd" in variants:
        ms, cs = _time(chained_loss(cfg), (params, batch, rngs),
                       chain, repeats)
        log(variant="fwd", ms=round(ms, 2), compile_s=round(cs, 1))
    if "grad_sgd" in variants:
        ms, cs = _time(chained_grad(cfg, sgd),
                       (params, opt_state, batch, rngs), chain, repeats)
        log(variant="grad_sgd", ms=round(ms, 2), compile_s=round(cs, 1))
    if "full" in variants:
        ms, cs = _time(chained_grad(cfg, adamw),
                       (params, opt_state, batch, rngs), chain, repeats)
        log(variant="full", ms=round(ms, 2), compile_s=round(cs, 1))
    if "no_dropout" in variants:
        ms, cs = _time(chained_grad(cfg, sgd, train=False),
                       (params, opt_state, batch, rngs), chain, repeats)
        log(variant="no_dropout_grad", ms=round(ms, 2),
            compile_s=round(cs, 1))
    if "opt_only" in variants:
        fixed_grads = jax.tree_util.tree_map(
            lambda v: jnp.full(v.shape, 1e-6, v.dtype), params)

        def chained_opt(params, opt_state, xs):
            def body(carry, x):
                params, opt_state = carry
                g = jax.tree_util.tree_map(
                    lambda v: v * (1.0 + x * 1e-6), fixed_grads)
                updates, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), None
            (params, _), _ = jax.lax.scan(body, (params, opt_state), xs)
            return params["global_sap_head"]["dense2"]["b"]
        xs = jnp.arange(chain, dtype=jnp.float32)
        ms, cs = _time(jax.jit(chained_opt), (params, opt_state, xs),
                       chain, repeats)
        log(variant="opt_only_adamw", ms=round(ms, 2),
            compile_s=round(cs, 1))

    # ---------------- per-component fwd/grad --------------------------
    if "components" in variants:
        rng0 = np.random.default_rng(3)
        txt_ids = batch["txt_ids"]
        txt_masks = batch["txt_masks"]
        gmap_img = jnp.asarray(
            rng0.standard_normal((B * T, G, p.hidden_size)), jnp.float32)
        txt_tiled = jnp.asarray(
            rng0.standard_normal((B * T, L, p.hidden_size)), jnp.float32)
        txt_m_tiled = jnp.ones((B * T, L), bool)

        def txt_fn(params_, rng_):
            return planner_lib.forward_txt(
                params_, p, txt_ids, txt_masks, rng=rng_,
                train=True).astype(jnp.float32).sum()

        def pano_fn(params_, rng_):
            out, _ = planner_lib.forward_panorama(
                params_, p, batch["vp_rgb"].reshape(B * T, P, -1),
                batch["vp_dep"].reshape(B * T, P, -1),
                batch["vp_loc"].reshape(B * T, P, -1),
                batch["vp_nav"].reshape(B * T, P),
                batch["vp_mask"].reshape(B * T, P), rng=rng_, train=True)
            return out.astype(jnp.float32).sum()

        def nav_fn(params_, rng_):
            out = planner_lib.forward_navigation(
                params_, p, txt_tiled, txt_m_tiled, gmap_img,
                batch["gmap_step_ids"].reshape(B * T, G),
                batch["gmap_pos_fts"].reshape(B * T, G, -1),
                batch["gmap_mask"].reshape(B * T, G),
                batch["gmap_visited"].reshape(B * T, G),
                batch["gmap_pair"].reshape(B * T, G, G),
                rng=rng_, train=True)
            lg = out["global_logits"]
            return jnp.where(jnp.isfinite(lg), lg, 0.0).sum()

        for name, fn in (("txt", txt_fn), ("pano", pano_fn),
                         ("nav", nav_fn)):
            def chained_f(params, batch_rngs, fn=fn):
                def body(acc, rng):
                    return acc + fn(params, rng), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), batch_rngs)
                return acc
            ms, _ = _time(jax.jit(chained_f), (params, rngs),
                          chain, repeats)
            log(variant=f"{name}_fwd", ms=round(ms, 2))

            def chained_g(params, batch_rngs, fn=fn):
                def body(carry, rng):
                    val, grads = jax.value_and_grad(fn)(carry, rng)
                    carry = jax.tree_util.tree_map(
                        lambda pp, g: pp - 1e-12 * g, carry, grads)
                    return carry, val
                _, vals = jax.lax.scan(body, params, batch_rngs)
                return vals
            ms, _ = _time(jax.jit(chained_g), (params, rngs),
                          chain, repeats)
            log(variant=f"{name}_grad", ms=round(ms, 2))

    # ---------------- aggregation block A/B ---------------------------
    def agg_loss_gather(scale, batch_):
        """The sparse-path aggregation exactly as replay_logits runs it;
        grads w.r.t. `scale` force d(pano_flat) through the gather's
        scatter-add transpose."""
        pano_flat = batch_["vp_rgb"].reshape(B, T * P, -1)[..., :1] \
            * jnp.zeros((1,)) + scale   # (B,S,1)-ish: cheap, shaped
        pano_flat = jnp.broadcast_to(
            pano_flat, (B, T * P, p.hidden_size)) \
            * batch_["vp_dep"].reshape(B, T * P, -1)[..., :1]
        pano32 = pano_flat.astype(jnp.float32)
        pano_bt = pano32.reshape(B, T, P, -1)
        vmask = batch_["vp_mask"] & batch_["step_valid"][..., None]
        cnt = jnp.maximum(vmask.sum(-1), 1).astype(jnp.float32)
        step_mean = ((pano_bt * vmask[..., None]).sum(2) / cnt[..., None])
        node_oh = (batch_["agg_node_step"][..., None]
                   == jnp.arange(T, dtype=jnp.int32))
        gmap_node = jnp.einsum("btgu,bud->btgd",
                               node_oh.astype(jnp.float32), step_mean)
        ent_feat = pano32[jnp.arange(B)[:, None, None],
                          batch_["agg_ent_tok"]]
        ent_feat = ent_feat * batch_["agg_ent_val"][..., None]
        slot_oh = (batch_["agg_ent_slot"][..., None]
                   == jnp.arange(G, dtype=jnp.int32))
        gmap_ghost = jnp.einsum("btmg,btmd->btgd",
                                slot_oh.astype(jnp.float32), ent_feat)
        return ((gmap_node + gmap_ghost) ** 2).sum()

    def agg_loss_dense(scale, batch_):
        pano_flat = batch_["vp_rgb"].reshape(B, T * P, -1)[..., :1] \
            * jnp.zeros((1,)) + scale
        pano_flat = jnp.broadcast_to(
            pano_flat, (B, T * P, p.hidden_size)) \
            * batch_["vp_dep"].reshape(B, T * P, -1)[..., :1]
        w = dense_w_from_sparse(batch_, P)
        gmap = jnp.einsum("btgs,bsd->btgd", w,
                          pano_flat.astype(jnp.float32))
        return (gmap ** 2).sum()

    if "agg_dense" in variants:
        for name, fn in (("agg_gather", agg_loss_gather),
                         ("agg_dense", agg_loss_dense)):
            def chained_af(scale0, batch_, xs, fn=fn):
                def body(acc, x):
                    return acc + fn(jnp.float32(1.0) + x * 1e-9,
                                    batch_), None
                acc, _ = jax.lax.scan(body, scale0, xs)
                return acc
            xs = jnp.arange(chain, dtype=jnp.float32)
            ms, _ = _time(jax.jit(chained_af),
                          (jnp.float32(0), batch, xs), chain, repeats)
            log(variant=f"{name}_fwd", ms=round(ms, 2))

            def chained_ag(scale0, batch_, xs, fn=fn):
                def body(carry, x):
                    val, g = jax.value_and_grad(fn)(
                        carry + x * 1e-12, batch_)
                    return carry - 1e-12 * g, val
                _, vals = jax.lax.scan(body, scale0, xs)
                return vals
            ms, _ = _time(jax.jit(chained_ag),
                          (jnp.float32(1), batch, xs), chain, repeats)
            log(variant=f"{name}_grad", ms=round(ms, 2))

    if "full_dense" in variants:
        cfg_d = dataclasses.replace(
            cfg, il=dataclasses.replace(cfg.il, agg_dense_device=True))
        ms, cs = _time(chained_grad(cfg_d, adamw),
                       (params, opt_state, batch, rngs), chain, repeats)
        log(variant="full_dense", ms=round(ms, 2), compile_s=round(cs, 1))

    if "remat" in variants:
        cfg_r = dataclasses.replace(
            cfg, il=dataclasses.replace(cfg.il, remat_nav_min_gmap=0))
        ms, cs = _time(chained_grad(cfg_r, adamw),
                       (params, opt_state, batch, rngs), chain, repeats)
        log(variant="remat_full", ms=round(ms, 2), compile_s=round(cs, 1))

    if "probs_bf16" in variants:
        from etpnav_tpu.ops import attention as attn_mod
        attn_mod.PROBS_BF16 = True
        try:
            ms, cs = _time(chained_grad(cfg, adamw),
                           (params, opt_state, batch, rngs),
                           chain, repeats)
            log(variant="probs_bf16_full", ms=round(ms, 2),
                compile_s=round(cs, 1))
        finally:
            attn_mod.PROBS_BF16 = False

    if "no_remat" in variants:
        # relevant at G >= remat_nav_min_gmap (the G=96 bucket runs
        # remat by default for HBM fit — measure whether it still must)
        cfg_nr = dataclasses.replace(
            cfg, il=dataclasses.replace(cfg.il, remat_nav=False))
        try:
            ms, cs = _time(chained_grad(cfg_nr, adamw),
                           (params, opt_state, batch, rngs),
                           chain, repeats)
            log(variant="no_remat_full", ms=round(ms, 2),
                compile_s=round(cs, 1))
        except Exception as e:  # noqa: BLE001 — expected OOM at G=96
            log(variant="no_remat_full", error=str(e)[:160])

    if "best" in variants:
        # candidate production setting: bf16 probs chain + no forced
        # remat (the two measured wins combined)
        from etpnav_tpu.ops import attention as attn_mod
        cfg_b = dataclasses.replace(
            cfg, il=dataclasses.replace(cfg.il, remat_nav=False))
        attn_mod.PROBS_BF16 = True
        try:
            ms, cs = _time(chained_grad(cfg_b, adamw),
                           (params, opt_state, batch, rngs),
                           chain, repeats)
            log(variant="best_full", ms=round(ms, 2),
                compile_s=round(cs, 1))
        except Exception as e:  # noqa: BLE001
            log(variant="best_full", error=str(e)[:160])
        finally:
            attn_mod.PROBS_BF16 = False

    if "remat_dots" in variants:
        cfg_rd = dataclasses.replace(
            cfg,
            planner=dataclasses.replace(
                p, remat_policy="dots_with_no_batch_dims_saveable"),
            il=dataclasses.replace(cfg.il, remat_nav_min_gmap=0))
        ms, cs = _time(chained_grad(cfg_rd, adamw),
                       (params, opt_state, batch, rngs), chain, repeats)
        log(variant="remat_dots_full", ms=round(ms, 2),
            compile_s=round(cs, 1))

    # ---------------- XLA cost analysis -------------------------------
    if "cost" in variants:
        def one_loss(params, batch, rng):
            return compute_il_loss(params, cfg, batch, rng)

        def one_grad(params, batch, rng):
            return jax.value_and_grad(compute_il_loss)(
                params, cfg, batch, rng)
        for name, f in (("fwd", one_loss), ("grad", one_grad)):
            try:
                c = (jax.jit(f).lower(params, batch, rngs[0])
                     .compile().cost_analysis())
                if isinstance(c, list):
                    c = c[0]
                log(variant=f"cost_{name}",
                    gflops=round(c.get("flops", 0) / 1e9, 1),
                    gbytes=round(c.get("bytes accessed", 0) / 1e9, 3),
                    transcendentals=c.get("transcendentals", 0))
            except Exception as e:  # noqa: BLE001 — probe must not die
                log(variant=f"cost_{name}", error=str(e)[:200])


if __name__ == "__main__":
    main()
