"""CLI entry point: config -> seed -> trainer registry -> train/eval/infer.

Capability target: the reference's run.py:20-113 (argparse, config merge,
seeding, baseline_registry trainer lookup, mode dispatch). --run-type
serve has no reference counterpart: it exposes the SS-ETP policy as a
network service (serving.py + serving_http.py).

    python -m etpnav_tpu.run --exp-config cfg.yaml --run-type train \
        IL.lr=2e-5 MESH.mp=2
    python -m etpnav_tpu.run --exp-config cfg.yaml --run-type serve \
        --ckpt ckpt_iter12000 --port 8080
"""

from __future__ import annotations

import argparse
import logging
import os
import random
from typing import Callable, Dict

import numpy as np

logger = logging.getLogger("etpnav_tpu")


def hash_split(split: str) -> int:
    """Deterministic split hash (python hash() is process-salted)."""
    import zlib
    return zlib.crc32(split.encode())

TRAINER_REGISTRY: Dict[str, Callable] = {}


def register_trainer(name: str):
    def deco(factory):
        TRAINER_REGISTRY[name] = factory
        return factory
    return deco


@register_trainer("SS-ETP")
def _build_ss_etp(cfg, args):
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.env.habitat_adapter import make_habitat_envs, \
        habitat_available
    from etpnav_tpu.training.finetune import FinetuneTrainer

    halves = max(getattr(args, "pipeline_halves", 1), 1)
    num_envs = getattr(args, "num_envs", 0) or cfg.num_environments
    per_pool = num_envs // halves
    # split selection: train uses the train split; eval/infer use the
    # configured EVAL/INFERENCE split. The geometric world has no named
    # splits, so the split seeds disjoint procedural scenes instead.
    run_type = getattr(args, "run_type", "train")
    split = (cfg.eval.split if run_type == "eval"
             else cfg.inference.split if run_type == "inference"
             else "train")
    split_seed = cfg.seed + (0 if split == "train"
                             else 10_000 + abs(hash_split(split)) % 10_000)

    def make_pool(i):
        if habitat_available():
            return make_habitat_envs(cfg, num_envs=per_pool, split=split,
                                     seed=cfg.seed + i)
        if getattr(args, "workers", False):
            from etpnav_tpu.env.vector import construct_geometric_envs
            return construct_geometric_envs(
                per_pool, workers=True, seed=split_seed + i,
                restart_on_crash=cfg.restart_crashed_workers,
                shm_obs=cfg.shm_observations,
                vocab_size=cfg.planner.vocab_size,
                max_instr_len=cfg.il.max_text_len,
                image_size=cfg.clip.image_size,
                depth_size=cfg.depth.input_size,
                pad_id=cfg.planner.pad_token_id)
        return GeometricNavEnv(
            num_envs=per_pool, seed=split_seed + i,
            vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)

    if not habitat_available():
        logger.warning("habitat-sim not available; using GeometricNavEnv")
    envs = make_pool(0) if halves == 1 else [make_pool(i)
                                             for i in range(halves)]
    mesh = None
    if cfg.mesh.mp > 1 or cfg.mesh.dp > 1:
        from etpnav_tpu.parallel import mesh as meshlib
        mesh = meshlib.make_mesh(dp=cfg.mesh.dp, mp=cfg.mesh.mp)
    return FinetuneTrainer(cfg, envs, ckpt_dir=args.ckpt_dir,
                           seed=cfg.seed, mesh=mesh)


@register_trainer("DAgger")
def _build_dagger(cfg, args):
    """Legacy DAgger path: frozen-encoder features + oracle teacher over
    either policy family (dagger_trainer.py:187-629). The feature and
    candidate functions run the real CLIP/depth towers and waypoint
    predictor; set DAGGER.encoder_ckpt to a released fine-tune checkpoint
    to load converted frozen-tower weights (otherwise they are randomly
    initialized, which is only useful for pipeline tests — a warning is
    logged)."""
    import functools

    import jax
    import jax.numpy as jnp

    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.models import clip_vit, depth_resnet
    from etpnav_tpu.training import agent as agent_mod
    from etpnav_tpu.training.dagger import (
        DaggerConfig,
        DaggerTrainer,
        RecVLNBertDagger,
    )

    from etpnav_tpu.env.habitat_adapter import (
        habitat_available,
        make_habitat_envs,
    )

    num_envs = getattr(args, "num_envs", 0) or cfg.num_environments
    if habitat_available():
        # same simulator selection as the SS-ETP builder above: the
        # legacy path drives the real simulator when one is present
        envs = make_habitat_envs(cfg, num_envs=num_envs, seed=cfg.seed)
    else:
        logger.warning("habitat-sim not available; using GeometricNavEnv")
        envs = GeometricNavEnv(
            num_envs=num_envs, seed=cfg.seed,
            vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)
    d = cfg.dagger
    dcfg = DaggerConfig(
        iterations=d.iterations, episodes_per_iter=d.episodes_per_iter,
        epochs=d.epochs, batch_size=d.batch_size, lr=d.lr, p=d.p,
        max_steps=d.max_steps)
    params = agent_mod.init_agent_params(jax.random.PRNGKey(cfg.seed), cfg)
    if d.encoder_ckpt:
        import torch
        from etpnav_tpu.models.convert import convert_full_policy
        trees = convert_full_policy(
            torch.load(d.encoder_ckpt, map_location="cpu"),
            planner_cfg=cfg.planner, clip_cfg=cfg.clip,
            depth_cfg=cfg.depth)
        params = params._replace(
            **{k: trees[k] for k in ("clip", "depth") if k in trees})
        logger.info("DAgger frozen towers loaded from %s", d.encoder_ckpt)
    else:
        logger.warning("DAGGER.encoder_ckpt unset: frozen towers are "
                       "randomly initialized (pipeline-test mode)")

    if d.policy == "cma":
        from etpnav_tpu.models.cma import CMAConfig
        s = cfg.depth.input_size // 32
        depth_channels = cfg.depth.output_size // (s * s)

        # pooled forward-view features, the quantities the reference
        # captures via space_pool_{rgb,depth} forward hooks
        # (dagger_trainer.py:255-266)
        @jax.jit
        def _feats(rgb, depth):
            r = clip_vit.encode_image_uint8(params.clip, cfg.clip, rgb)
            dd = depth_resnet.encode_depth(params.depth, cfg.depth, depth)
            return r, dd.mean((1, 2))

        def feature_fn(obs):
            rgb = np.stack([o["rgb"][0] for o in obs])
            dep = np.stack([o["depth"][0] for o in obs])
            r, dd = _feats(jnp.asarray(rgb), jnp.asarray(dep))
            return (np.asarray(r, np.float32), np.asarray(dd, np.float32))

        ccfg = CMAConfig(vocab_size=cfg.planner.vocab_size,
                         rgb_dim=cfg.clip.output_dim,
                         depth_dim=depth_channels,
                         pad_token_id=cfg.planner.pad_token_id)
        return DaggerTrainer(envs, ccfg, dcfg, feature_fn, d.store_dir,
                             seed=cfg.seed)

    if d.policy != "rec_vlnbert":
        raise ValueError(f"unknown DAGGER.policy {d.policy!r}")
    from etpnav_tpu.models.rec_vlnbert import RecVLNBertConfig
    enc = jax.jit(functools.partial(agent_mod.encode_panorama, cfg=cfg))
    K = cfg.waypoint.max_predictions

    def candidate_fn(obs):
        rgb = np.stack([o["rgb"] for o in obs])
        dep = np.stack([o["depth"] for o in obs])
        wp = enc(params, rgb=jnp.asarray(rgb), depth=jnp.asarray(dep))
        return {
            "rgb": np.asarray(wp["rgb_fts"][:, :K], np.float32),
            "depth": np.asarray(wp["dep_fts"][:, :K], np.float32),
            "ang": np.asarray(wp["loc_fts"][:, :K], np.float32),
            "angles": np.asarray(wp["cand_angles"], np.float64),
            "dists": np.asarray(wp["cand_distances"], np.float64),
            "mask": np.asarray(wp["cand_valid"]),
        }

    p = cfg.planner
    rcfg = RecVLNBertConfig(
        vocab_size=p.vocab_size, hidden=p.hidden_size, heads=p.num_heads,
        intermediate=p.intermediate_size,
        la_layers=(d.la_layers if d.la_layers > 0 else p.num_l_layers),
        vl_layers=(d.vl_layers if d.vl_layers > 0 else p.num_x_layers),
        max_pos=p.max_position_embeddings, eps=p.lang_layer_norm_eps,
        rgb_dim=p.image_feat_size, depth_dim=p.depth_feat_size,
        angle_dim=p.angle_feat_size, max_cands=K + 1,
        hidden_dropout=p.hidden_dropout, attn_dropout=p.attn_dropout,
        pad_token_id=p.pad_token_id)
    trainer = RecVLNBertDagger(envs, rcfg, dcfg, candidate_fn,
                               d.store_dir, seed=cfg.seed)
    if d.policy_ckpt:
        # PREVALENT pytorch_model.bin -> policy transformer weights
        # (vlnbert_init.py:10-18 equivalent)
        import torch
        from etpnav_tpu.models.convert import convert_rec_vlnbert
        trainer.params = convert_rec_vlnbert(
            torch.load(d.policy_ckpt, map_location="cpu"),
            trainer.params, rcfg.la_layers, rcfg.vl_layers)
        trainer.opt_state = trainer.tx.init(trainer.params)
        logger.info("DAgger policy loaded from %s", d.policy_ckpt)
    return trainer


@register_trainer("Pretrain")
def _build_pretrain(cfg, args):
    from etpnav_tpu.data.pretrain_data import PretrainShapes
    from etpnav_tpu.training.pretrain import PretrainTrainer
    shapes = PretrainShapes(
        max_txt_len=cfg.planner.max_txt_len,
        max_traj_steps=cfg.pretrain.max_traj_steps,
        num_views=cfg.pretrain.views_per_step,
        image_feat_size=cfg.planner.image_feat_size,
        depth_feat_size=cfg.planner.depth_feat_size,
        vocab_size=cfg.planner.vocab_size,
        pad_token_id=cfg.planner.pad_token_id,
        # keep the sampler's MRC/OG layout in lockstep with the heads
        image_prob_size=cfg.pretrain.image_prob_size,
        mrc_mask_prob=cfg.pretrain.mrc_mask_prob,
        num_objs=cfg.pretrain.num_objs)
    return PretrainTrainer(cfg, shapes, seed=cfg.seed)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="etpnav_tpu runner")
    ap.add_argument("--exp-config", required=True)
    ap.add_argument("--run-type",
                    choices=["train", "eval", "inference", "serve"],
                    default="train")
    ap.add_argument("--host", default="0.0.0.0",
                    help="serve: bind address")
    ap.add_argument("--port", type=int, default=8080,
                    help="serve: bind port (0 = ephemeral)")
    ap.add_argument("--serve-max-batch", type=int, default=8,
                    help="serve: device batch slots per dispatch")
    ap.add_argument("--serve-nonblocking", action="store_true",
                    help="serve: return (httpd, nav) instead of "
                         "blocking (programmatic use / tests)")
    ap.add_argument("--trainer", default="SS-ETP",
                    choices=sorted(TRAINER_REGISTRY))
    ap.add_argument("--num-envs", type=int, default=0,
                    help="0 = cfg NUM_ENVIRONMENTS (reference keeps "
                         "IL.batch_size equal to it)")
    ap.add_argument("--workers", action="store_true",
                    help="multi-process env workers (env/vector.py)")
    ap.add_argument("--pipeline-halves", type=int, default=1,
                    help="split envs into N threaded rollout pools "
                         "(training/pipeline.py)")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--ckpt", default=None, help="checkpoint to load")
    ap.add_argument("--episode-count", type=int, default=-1)
    ap.add_argument("--predictions-file", default="",
                    help="defaults to INFERENCE.predictions_file")
    ap.add_argument("--video", action="store_true",
                    help="write per-episode navigator videos to "
                         "cfg.video_dir during eval (VIDEO_DIR pipeline)")
    ap.add_argument("--gt-path", default=None,
                    help="{split}_gt.json.gz with reference locations "
                         "(ndtw supervision / eval)")
    ap.add_argument("opts", nargs="*", help="SECTION.key=value overrides")
    return ap


def serving_config(cfg):
    """Config adjustments for the inference-only serving surface.

    The nav stack runs fp32 at serving shapes (B<=16, G<=64): measured
    12% faster than bf16 on v5e (tools/exp_nav_bisect.py: 0.884 vs
    1.001 ms) — the bf16 casts don't pay at <=1024x768 GEMM sizes.
    Training keeps bf16 (learn-phase replay at B*T rows measured 11%
    slower in fp32, tools/exp_train_bench.py --nav-fp32); the reference
    likewise autocasts only the train rollout (ss_trainer_ETP.py:502)
    and evaluates fp32. An explicit PLANNER.nav_use_bf16 wins."""
    import dataclasses
    if cfg.planner.nav_use_bf16 is None:
        cfg = dataclasses.replace(cfg, planner=dataclasses.replace(
            cfg.planner, nav_use_bf16=False))
    return cfg


def run(args=None):
    from etpnav_tpu.config_yaml import load_config, parse_cli_opts
    args = build_parser().parse_args(args)
    cfg = load_config(args.exp_config, parse_cli_opts(args.opts))

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    logging.basicConfig(level=logging.INFO)

    if args.run_type == "serve":
        if args.trainer != "SS-ETP":
            raise ValueError("serving exposes the SS-ETP policy; "
                             f"--trainer {args.trainer} has no session "
                             "surface")
        cfg = serving_config(cfg)
        # no envs: the service's clients own their simulators/cameras
        from etpnav_tpu.training.finetune import FinetuneTrainer
        trainer = FinetuneTrainer(cfg, None, ckpt_dir=args.ckpt_dir,
                                  seed=cfg.seed)
    else:
        trainer = TRAINER_REGISTRY[args.trainer](cfg, args)
    if hasattr(trainer, "collect") and args.run_type == "inference":
        raise ValueError("the DAgger trainer has no leaderboard "
                         "inference mode; use --run-type train or eval")
    if (hasattr(trainer, "collect") and args.run_type == "eval"
            and not hasattr(trainer, "evaluate")):
        raise ValueError("this DAgger policy has no eval loop; "
                         "use DAGGER.policy=rec_vlnbert")
    ckpt = args.ckpt or (cfg.inference.ckpt_path
                         if args.run_type in ("inference", "serve")
                         else None)
    if ckpt:
        if not hasattr(trainer, "load_checkpoint"):
            raise ValueError(
                f"trainer {args.trainer!r} cannot load checkpoints; "
                "for DAgger use DAGGER.encoder_ckpt for the frozen towers")
        trainer.load_checkpoint(ckpt)
    elif cfg.pretrained_path and hasattr(trainer, "_refresh_agent"):
        if os.path.isdir(cfg.pretrained_path):
            # JAX-native two-stage recipe: a PretrainTrainer orbax ckpt
            # directory (training/warm_start.py surgery)
            trainer.load_pretrained(cfg.pretrained_path)
            logger.info("warm-started planner from JAX pretrain ckpt %s",
                        cfg.pretrained_path)
        else:
            # MODEL.pretrained_path: convert + load a torch pretrain ckpt
            # into the planner (vlnbert_init.py:21-30 key surgery)
            import torch
            from etpnav_tpu.models.convert import convert_planner, \
                strip_prefixes
            sd = torch.load(cfg.pretrained_path, map_location="cpu")
            sd = sd.get("state_dict", sd.get("model", sd))
            planner_params = convert_planner(
                strip_prefixes(sd), num_l_layers=cfg.planner.num_l_layers,
                num_x_layers=cfg.planner.num_x_layers)
            trainer.params = trainer.params._replace(planner=planner_params)
            trainer._refresh_agent()
            trainer.opt_state = trainer.tx.init(trainer.params.planner)
            logger.info("loaded pretrained planner from %s",
                        cfg.pretrained_path)

    gt_paths = None
    if args.gt_path:
        from etpnav_tpu.data.episodes import load_gt_paths
        gt_paths = load_gt_paths(args.gt_path)

    if args.run_type == "serve":
        from etpnav_tpu.serving import NavServer
        from etpnav_tpu.serving_http import make_http_server, serve
        nav = NavServer(cfg, trainer.agent,
                        max_batch=args.serve_max_batch)
        if args.serve_nonblocking:
            import threading
            httpd = make_http_server(nav, args.host, args.port)
            threading.Thread(target=httpd.serve_forever,
                             daemon=True).start()
            logger.info("serving (nonblocking) on %s:%d",
                        *httpd.server_address[:2])
            return httpd, nav
        logger.info("warming device programs, then serving on %s:%d",
                    args.host, args.port)
        return serve(nav, args.host, args.port)

    if args.run_type == "train":
        if hasattr(trainer, "train_steps"):   # pretrain
            if (cfg.pretrain.resume
                    and trainer.resume_latest(cfg.checkpoint_folder)):
                logger.info("resumed pretraining at step %d", trainer.step)
            os.makedirs(cfg.checkpoint_folder, exist_ok=True)
            logs = trainer.train_steps(
                cfg.pretrain.num_train_steps - trainer.step,
                ckpt_dir=cfg.checkpoint_folder)
        elif hasattr(trainer, "collect"):     # legacy DAgger path
            logs = trainer.train()
        else:
            # IL.is_requeue gates auto-resume (ss_trainer_ETP.py:216-236)
            if (cfg.il.is_requeue and not args.ckpt
                    and trainer.resume_latest(args.ckpt_dir)):
                logger.info("requeue: resumed at iteration %d",
                            trainer.iteration)
            remaining = max(cfg.il.iters - trainer.iteration, 0)
            logs = trainer.train(remaining, gt_paths=gt_paths,
                                 save_every=cfg.il.log_every)
            os.makedirs(args.ckpt_dir, exist_ok=True)
            trainer.save_checkpoint(os.path.join(
                args.ckpt_dir, f"ckpt_iter{trainer.iteration}"))
        logger.info("train done: %s", logs)
        return logs
    elif args.run_type == "eval":
        if hasattr(trainer, "collect"):      # legacy DAgger greedy eval
            n = args.episode_count if args.episode_count > 0 else 24
            stats = trainer.evaluate(n,
                                     success_distance=cfg.il.success_distance)
            logger.info("dagger eval: %s", stats)
            return stats
        n = (args.episode_count if args.episode_count > 0
             else cfg.eval.episode_count if cfg.eval.episode_count > 0
             else getattr(trainer.envs, "num_episodes", None) or 100)
        if cfg.eval.fast_eval:
            # every-5th-episode subsample (ss_trainer_ETP.py:569). Envs
            # with explicit episode lists are subset via
            # data/episodes.fast_eval_subset; the procedural world has
            # no fixed list, so the count shrinks by the same factor.
            n = max(1, -(-n // 5))
            logger.info("fast_eval: evaluating %d episodes", n)
        if cfg.eval.ckpt_path_dir:
            # reference eval mode: poll the checkpoint folder, evaluate
            # every ckpt once, skip already-evaluated
            # (base_il_trainer.py:874-889)
            from etpnav_tpu.training.eval_loop import eval_checkpoint_loop
            results = eval_checkpoint_loop(
                trainer, cfg.eval.ckpt_path_dir, cfg.results_dir,
                episode_count=n, split=cfg.eval.split, gt_paths=gt_paths)
            logger.info("eval loop: %d checkpoints", len(results))
            return results
        stats = trainer.evaluate(
            n, gt_paths=gt_paths,
            video_dir=cfg.video_dir if args.video else None)
        logger.info("eval: %s", stats)
        return stats
    else:
        n = (args.episode_count if args.episode_count > 0
             else cfg.inference.episode_count
             if cfg.inference.episode_count > 0 else 100)
        preds = (args.predictions_file if args.predictions_file
                 else cfg.inference.predictions_file)
        fmt = cfg.inference.format or cfg.task_type
        return trainer.inference(n, preds, fmt=fmt)


if __name__ == "__main__":
    run()
