"""EXPERIMENT: bisect the navigation-scoring program (VERDICT r2 Next #3).

planner-path MFU is ~45% (5.17 GF/step at 17.3k steps/s on v5e-1);
nothing ever attributed the other 55%. Decompose forward_navigation the
way perception was bisected (tools/exp_perceive_bisect.py):

- full           : score_navigation (embeds + sprel bias + 4 x-layers +
                   SAP head + masking) — the bench program
- stack_only     : the 4 scanned x-layers on precomputed embeddings
                   (difference vs full = embedding/sprel/sap overhead)
- cross_only /
  self_only /
  ffn_only       : 4 layers of just one sublayer kind
- no_sprel       : graph_sprels=False (bias add + its (B,G,G) operand)
- fp32           : use_bf16=False (casting + MXU dtype)
- fused=on/off   : Pallas biased-attention toggle at these shapes
- G sweep        : padding sensitivity (eval buckets 16/32/48 vs the
                   fixed G=64 bench/train shape)
- B sweep        : dispatch-size sensitivity
- --learn-shapes : rerun the decomposition at the replay's B*T=320-row
                   shapes (VERDICT r3 #7) — the learn phase scores all
                   B=16 envs x T=20 steps as one flattened nav batch
                   (finetune.compute_il_loss), so serving-shape (B=16)
                   pipeline-gap conclusions may not transfer. Adds a
                   full_grad variant (value_and_grad through the nav
                   stack) to probe backward headroom at those rows.

Harness: chained lax.scan, per-iteration input perturbation from the xs
stream, host fetch as sync (CLAUDE.md benchmarking rules). Emits each
measurement as it lands.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_nav_bisect.py
"""

import argparse
import dataclasses
import functools
import json
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def make_inputs(cfg, B, G=None, L=None):
    p = cfg.planner
    G = G or p.max_gmap_len
    L = L or p.max_txt_len
    D = p.hidden_size
    g = np.random.default_rng(1)
    txt = g.standard_normal((B, L, D)).astype(np.float32)
    txt_m = np.ones((B, L), bool)
    gmap = {
        "img_fts": g.standard_normal((B, G, D)).astype(np.float32),
        "step_ids": np.zeros((B, G), np.int32),
        "pos_fts": g.standard_normal((B, G, 7)).astype(np.float32),
        "mask": np.ones((B, G), bool),
        "visited": np.zeros((B, G), bool),
        "pair_dists": np.abs(g.standard_normal((B, G, G))).astype(
            np.float32),
    }
    return txt, txt_m, gmap


def time_chained(fn, args, iters, repeats=3):
    import jax.numpy as jnp
    np.asarray(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1e3


def measure_variant(name, cfg, params, B, iters, variant="full", G=None,
                    L=None):
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.models import planner as planner_lib
    from etpnav_tpu.models.bert_core import bert_ffn
    from etpnav_tpu.ops.attention import (
        cross_attention_block,
        self_attention_block,
    )
    from etpnav_tpu.training import agent as agent_lib

    p = cfg.planner
    txt, txt_m, gmap = make_inputs(cfg, B, G=G, L=L)
    dtype = jnp.bfloat16 if p.use_bf16 else jnp.float32

    if variant in ("full", "full_txt_only", "full_grad"):
        # full: EVERY production-varying input is perturbed from the xs
        # stream — in the real rollout the gmap changes every step, so
        # the embed/sprel construction must not be scan-hoisted.
        # full_txt_only: the (flawed) txt-only perturbation that lets
        # XLA hoist the gmap-side work — kept to quantify the hoisting
        # error of the original bench formulation.
        # full_grad: value_and_grad of the scored sum wrt the planner
        # params — the learn phase's backward through this same stack.
        perturb_gmap = variant != "full_txt_only"
        def once(params, txt, gmap):
            return agent_lib.score_navigation(
                params, cfg, txt, txt_m, gmap)["global_logits"]
        def perturbed(txt, gmap, x):
            eps = x.astype(jnp.float32) * 1e-6
            t = txt + eps
            g = gmap
            if perturb_gmap:
                g = dict(gmap,
                         img_fts=gmap["img_fts"] + eps,
                         pair_dists=gmap["pair_dists"] + eps,
                         pos_fts=gmap["pos_fts"] + eps)
            return t, g
        if variant == "full_grad":
            def loss_fn(planner_params, t, g):
                out = once(params._replace(planner=planner_params), t, g)
                return jnp.where(jnp.isfinite(out), out,
                                 0.0).astype(jnp.float32).sum()
            def chained(params, txt, gmap, xs):
                def body(c, x):
                    t, g = perturbed(txt, gmap, x)
                    val, grads = jax.value_and_grad(loss_fn)(
                        params.planner, t, g)
                    gsum = sum(jnp.sum(l.astype(jnp.float32)) for l in
                               jax.tree_util.tree_leaves(grads))
                    return c + val + gsum, None
                c, _ = jax.lax.scan(body, jnp.float32(0), xs)
                return c
        else:
            def chained(params, txt, gmap, xs):
                def body(c, x):
                    t, g = perturbed(txt, gmap, x)
                    out = once(params, t, g)
                    return c + jnp.where(jnp.isfinite(out), out,
                                         0.0).sum(), None
                c, _ = jax.lax.scan(body, jnp.float32(0), xs)
                return c
        args3 = (params, jax.device_put(txt), jax.device_put(gmap))
    else:
        ge = params.planner["global_encoder"]
        stack = ge["encoder"]
        Gn = gmap["img_fts"].shape[1]
        visn0 = jnp.asarray(gmap["img_fts"], dtype)
        txt_d = jnp.asarray(txt, dtype)
        zero_txt_bias = jnp.zeros((B, 1, 1, txt.shape[1]), jnp.float32)
        zero_visn_bias = jnp.zeros((B, 1, 1, Gn), jnp.float32)
        full_visn_bias = jnp.zeros((B, 1, Gn, Gn), jnp.float32)

        if variant == "stack_only":
            def once(stack, visn, txt_d):
                return planner_lib._x_stack(stack, p, visn, txt_d,
                                            zero_txt_bias, zero_visn_bias)
        elif variant == "cross_only":
            def once(stack, visn, txt_d):
                def body(h, lp):
                    return cross_attention_block(
                        lp["visual_attention"], h, txt_d, p.num_heads,
                        zero_txt_bias, p.vis_layer_norm_eps), None
                h, _ = jax.lax.scan(body, visn, stack)
                return h
        elif variant == "self_only":
            def once(stack, visn, txt_d):
                def body(h, lp):
                    return self_attention_block(
                        lp["visn_self_att"], h, p.num_heads,
                        full_visn_bias, p.vis_layer_norm_eps), None
                h, _ = jax.lax.scan(body, visn, stack)
                return h
        elif variant == "ffn_only":
            def once(stack, visn, txt_d):
                def body(h, lp):
                    return bert_ffn(lp["visn_ffn"], h,
                                    p.vis_layer_norm_eps), None
                h, _ = jax.lax.scan(body, visn, stack)
                return h
        else:
            raise ValueError(variant)

        def chained(stack, visn0, txt_d, xs):
            def body(c, x):
                v = visn0 + x.astype(dtype) * 1e-6
                return c + once(stack, v, txt_d).astype(
                    jnp.float32).sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c
        args3 = (stack, visn0, txt_d)

    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7
    fn = jax.jit(chained)
    ms = time_chained(fn, args3 + (xs,), iters)
    log(variant=name, B=B, G=G or p.max_gmap_len, L=L or p.max_txt_len,
        ms_per_dispatch=round(ms, 3),
        steps_per_sec=round(B * 1e3 / ms, 1))
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--learn-shapes", action="store_true",
                    help="decompose at the replay's B*T=320-row shapes "
                         "(B=16 envs x T=20 steps; VERDICT r3 #7)")
    args = ap.parse_args()

    import jax

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.training import agent as agent_lib
    import etpnav_tpu.ops.attention as attn

    cfg = r2r_config()
    params = agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg)
    B, iters = args.batch, args.iters
    log(section="env", devices=str(jax.devices()),
        backend=jax.default_backend())

    if args.learn_shapes:
        # the replay flattens (B=16 envs, T=20 steps) into one 320-row
        # nav batch (finetune.compute_il_loss); decompose fwd + bwd there
        B = 320
        full = measure_variant("full", cfg, params, B, iters)
        measure_variant("stack_only", cfg, params, B, iters,
                        variant="stack_only")
        measure_variant("cross_only", cfg, params, B, iters,
                        variant="cross_only")
        measure_variant("self_only", cfg, params, B, iters,
                        variant="self_only")
        measure_variant("ffn_only", cfg, params, B, iters,
                        variant="ffn_only")
        measure_variant("full_grad", cfg, params, B, iters,
                        variant="full_grad")
        for G in (48, 96):   # the production replay buckets around G=64
            measure_variant(f"G={G}", cfg, params, B, iters, G=G)
        log(section="done", full_ms=round(full, 3))
        return

    full = measure_variant("full", cfg, params, B, iters)
    measure_variant("full_txt_only", cfg, params, B, iters,
                    variant="full_txt_only")
    measure_variant("stack_only", cfg, params, B, iters,
                    variant="stack_only")
    measure_variant("cross_only", cfg, params, B, iters,
                    variant="cross_only")
    measure_variant("self_only", cfg, params, B, iters,
                    variant="self_only")
    measure_variant("ffn_only", cfg, params, B, iters, variant="ffn_only")

    nsp = dataclasses.replace(
        cfg, planner=dataclasses.replace(cfg.planner, graph_sprels=False))
    measure_variant("no_sprel", nsp, params, B, iters)

    f32 = dataclasses.replace(
        cfg, planner=dataclasses.replace(cfg.planner, use_bf16=False))
    measure_variant("fp32", f32, params, B, iters)

    if jax.default_backend() == "tpu":    # Pallas path needs hardware
        old = attn.USE_FUSED_ATTENTION
        for flag in (True, False):
            attn.USE_FUSED_ATTENTION = flag
            measure_variant(f"fused={flag}", cfg, params, B, iters)
        attn.USE_FUSED_ATTENTION = old

    if not args.quick:
        for G in (16, 32, 48):
            measure_variant(f"G={G}", cfg, params, B, iters, G=G)
        for Bs in (32, 64):
            measure_variant(f"B={Bs}", cfg, params, Bs, iters)
    log(section="done", full_ms=round(full, 3))


if __name__ == "__main__":
    main()
