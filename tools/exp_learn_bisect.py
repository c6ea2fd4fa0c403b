"""Bisect the fused learn_step (training/finetune.py:162) at r2r shapes.

BENCH_r03 put the learn step at ~147 ms (=20% MFU at ~5.9e12 fwd+bwd
FLOPs per B=16 interval). This probe splits that time the way
exp_perceive_bisect/exp_nav_bisect split the inference programs:

  full        value_and_grad + AdamW update under threefry keys (the
              pre-adoption step; production now defaults to rbg keys —
              ILConfig.rng_impl — after this probe's rbg variant measured
              147.6 -> 133.2 ms on v5e-1)
  sgd         value_and_grad + plain p-=lr*g   -> AdamW moment cost
  fwd         loss only, no grad               -> fwd vs bwd split
  no_dropout  train=False replay (no threefry) -> dropout/RNG cost
  rbg         full step under the rbg PRNG     -> threefry-specific cost
  components  txt/pano/nav forwards alone at replay shapes

Every variant threads params through the scan carry (perturbed by the
variant's own output where it would otherwise be loop-invariant), so XLA
cannot hoist a body out of the chain (CLAUDE.md benchmarking gotcha).
Reference unit being decomposed: one train iteration's backward+step,
ss_trainer_ETP.py:502-506.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "tools")
from exp_train_bench import synth_batch  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def _time(fn, args, chain, repeats):
    t0 = time.perf_counter()
    out = np.asarray(fn(*args))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(out).all()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / chain * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--variants", default="full,sgd,fwd,no_dropout,rbg,"
                    "bits8,unroll,components")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (probe smoke test)")
    args = ap.parse_args()
    variants = set(args.variants.split(","))

    import jax
    import jax.numpy as jnp
    import optax

    from etpnav_tpu.config import r2r_config, tiny_config
    from etpnav_tpu.models import planner as planner_lib
    from etpnav_tpu.training.finetune import compute_il_loss, \
        make_il_optimizer, replay_logits

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = tiny_config()
    else:
        cfg = r2r_config()
    p = cfg.planner
    log(section="env", devices=str(jax.devices()),
        backend=jax.default_backend())

    host = synth_batch(cfg, args.batch, rng=0)
    batch = jax.device_put(host)
    params = planner_lib.init_planner_params(jax.random.PRNGKey(0), p)
    tx = make_il_optimizer(cfg, params)
    opt_state = tx.init(params)

    def eval_loss(params_, cfg_, batch_, rng_):
        # train=False replay: same differentiable path, no dropout masks
        logits = replay_logits(params_, cfg_, batch_, rng=None, train=False)
        teacher = batch_["teacher"]
        valid = (teacher >= 0) & batch_["step_valid"]
        logp = jax.nn.log_softmax(
            jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.maximum(teacher, 0)[..., None], axis=-1)[..., 0]
        total = jnp.maximum(batch_["step_valid"].sum(), 1)
        return cfg_.il.ml_weight * jnp.where(valid, nll, 0.0).sum() / total

    def chained_train(loss_fn, update):
        def chained(params, opt_state, batch, rngs):
            def body(carry, rng):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, cfg, batch, rng)
                params, opt_state = update(params, opt_state, grads)
                return (params, opt_state), loss
            (_, _), losses = jax.lax.scan(body, (params, opt_state), rngs)
            return losses
        return jax.jit(chained)

    def adamw_update(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def sgd_update(params, opt_state, grads):
        return jax.tree_util.tree_map(
            lambda x, g: x - 1e-7 * g, params, grads), opt_state

    rngs = jax.random.split(jax.random.PRNGKey(1), args.chain)
    results = {}

    if "full" in variants:
        fn = chained_train(compute_il_loss, adamw_update)
        ms, cs = _time(fn, (params, opt_state, batch, rngs),
                       args.chain, args.repeats)
        results["full"] = ms
        log(section="learn_bisect", variant="full", ms=round(ms, 2),
            compile_s=round(cs, 1))

    if "sgd" in variants:
        fn = chained_train(compute_il_loss, sgd_update)
        ms, cs = _time(fn, (params, opt_state, batch, rngs),
                       args.chain, args.repeats)
        results["sgd"] = ms
        log(section="learn_bisect", variant="sgd", ms=round(ms, 2),
            compile_s=round(cs, 1))

    if "fwd" in variants:
        # loss only; params perturbed by the loss so the chain is live
        def chained_fwd(params, batch, rngs):
            def body(params, rng):
                loss = compute_il_loss(params, cfg, batch, rng)
                params = jax.tree_util.tree_map(
                    lambda x: x + (1e-12 * loss).astype(x.dtype), params)
                return params, loss
            _, losses = jax.lax.scan(body, params, rngs)
            return losses
        fn = jax.jit(chained_fwd)
        ms, cs = _time(fn, (params, batch, rngs), args.chain, args.repeats)
        results["fwd"] = ms
        log(section="learn_bisect", variant="fwd", ms=round(ms, 2),
            compile_s=round(cs, 1))

    if "no_dropout" in variants:
        fn = chained_train(eval_loss, adamw_update)
        ms, cs = _time(fn, (params, opt_state, batch, rngs),
                       args.chain, args.repeats)
        results["no_dropout"] = ms
        log(section="learn_bisect", variant="no_dropout", ms=round(ms, 2),
            compile_s=round(cs, 1))

    if "rbg" in variants:
        # same full step driven by rbg typed keys: every jax.random call
        # downstream inherits the cheap counter-based generator instead of
        # threefry (the TPU-classic dropout-mask cost)
        try:
            rbg_keys = jax.random.split(jax.random.key(1, impl="rbg"),
                                        args.chain)
            fn = chained_train(compute_il_loss, adamw_update)
            ms, cs = _time(fn, (params, opt_state, batch, rbg_keys),
                           args.chain, args.repeats)
            results["rbg"] = ms
            log(section="learn_bisect", variant="rbg", ms=round(ms, 2),
                compile_s=round(cs, 1))
        except Exception as e:   # pragma: no cover - depends on jaxlib
            log(section="learn_bisect", variant="rbg", error=repr(e))

    if "bits8" in variants:
        # uint8-bits dropout masks under the production (rbg) keys: 4x
        # fewer random bits per mask element than bernoulli's uniform-f32
        # threshold (ops/basic.py DROPOUT_BITS8)
        from etpnav_tpu.ops import basic as basic_ops
        rbg_keys = jax.random.split(jax.random.key(1, impl="rbg"),
                                    args.chain)
        basic_ops.DROPOUT_BITS8 = True
        try:
            fn = chained_train(compute_il_loss, adamw_update)
            ms, cs = _time(fn, (params, opt_state, batch, rbg_keys),
                           args.chain, args.repeats)
            results["bits8"] = ms
            log(section="learn_bisect", variant="bits8", ms=round(ms, 2),
                compile_s=round(cs, 1))
        finally:
            basic_ops.DROPOUT_BITS8 = False

    if "unroll" in variants:
        # fully unrolled transformer stacks (bert_core.SCAN_UNROLL): the
        # ViT won +4.4% from straight-line blocks (exp_scan_unroll.py);
        # does the scanned 9/2/4-layer planner train step?
        from etpnav_tpu.models import bert_core
        bert_core.SCAN_UNROLL = 16
        try:
            fn = chained_train(compute_il_loss, adamw_update)
            ms, cs = _time(fn, (params, opt_state, batch, rngs),
                           args.chain, args.repeats)
            results["unroll"] = ms
            log(section="learn_bisect", variant="unroll", ms=round(ms, 2),
                compile_s=round(cs, 1))
        finally:
            bert_core.SCAN_UNROLL = 1

    if "components" in variants:
        B = args.batch
        T, L, G = cfg.il.max_traj_len, cfg.il.max_text_len, p.max_gmap_len
        P = cfg.waypoint.max_predictions + 12
        BT = B * T
        g = np.random.default_rng(0)
        comp_inputs = {
            "txt": (batch["txt_ids"], batch["txt_masks"]),
            "pano": tuple(jax.device_put(x) for x in (
                g.standard_normal((BT, P, p.image_feat_size))
                    .astype(np.float32),
                g.standard_normal((BT, P, p.depth_feat_size))
                    .astype(np.float32),
                g.standard_normal((BT, P, 4)).astype(np.float32),
                g.integers(0, 2, (BT, P)).astype(np.int32),
                np.ones((BT, P), bool))),
            "nav": tuple(jax.device_put(x) for x in (
                g.standard_normal((BT, L, p.hidden_size))
                    .astype(np.float32),
                np.ones((BT, L), bool),
                g.standard_normal((BT, G, p.hidden_size))
                    .astype(np.float32),
                g.integers(0, T, (BT, G)).astype(np.int32),
                g.standard_normal((BT, G, 7)).astype(np.float32),
                np.asarray(host["gmap_mask"]).reshape(BT, G),
                np.zeros((BT, G), bool),
                np.abs(g.standard_normal((BT, G, G))).astype(np.float32))),
        }

        def comp_fn(name):
            # scalar carry perturbs a float input; output mean feeds the
            # carry back, so every scan iteration runs live
            if name == "txt":
                # int inputs can't take the scalar carry: perturb the ids
                # from the xs stream instead (bench.py hoisting guard)
                def f(c, a, x=None):
                    ids = (a[0] + x.astype(jnp.int32)) % p.vocab_size
                    emb = planner_lib.forward_txt(
                        params, p, ids, a[1], train=False)
                    return (emb + c).mean()
            elif name == "pano":
                def f(c, a):
                    out, _ = planner_lib.forward_panorama(
                        params, p, a[0] + c, *a[1:], train=False)
                    return out.mean()
            else:
                def f(c, a):
                    out = planner_lib.forward_navigation(
                        params, p, a[0], a[1], a[2] + c, *a[3:],
                        train=False)
                    gl = out["global_logits"]
                    return jnp.where(jnp.isfinite(gl), gl, 0.0).mean()
            return f

        for name in ("txt", "pano", "nav"):
            f = comp_fn(name)
            ins = comp_inputs[name]

            def chained_c(c0, ins, f=f, name=name):
                def body(carry, x):
                    if name == "txt":
                        m = f(carry * 1e-12, ins, x)
                    else:
                        m = f(carry * 1e-12, ins)
                    return m, m
                _, outs = jax.lax.scan(body, c0, jnp.arange(args.chain))
                return outs
            fn = jax.jit(chained_c)
            ms, cs = _time(fn, (jnp.float32(0.0), ins),
                           args.chain, args.repeats)
            log(section="learn_bisect", variant=f"component_{name}_fwd",
                ms=round(ms, 2), compile_s=round(cs, 1))

    if "full" in results:
        summary = {k: round(v, 2) for k, v in results.items()}
        if "fwd" in results:
            summary["bwd_plus_opt_ms"] = round(
                results["full"] - results["fwd"], 2)
        if "sgd" in results:
            summary["adamw_moments_ms"] = round(
                results["full"] - results["sgd"], 2)
        if "no_dropout" in results:
            summary["dropout_rng_ms"] = round(
                results["full"] - results["no_dropout"], 2)
        log(section="learn_bisect_summary", **summary)


if __name__ == "__main__":
    sys.exit(main())
