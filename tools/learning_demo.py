"""End-to-end learning validation on the geometric world.

Usage: python tools/learning_demo.py [--iters 400] [--eval-every 100]
       [--num-envs 8] [--eval-episodes 24] [--ckpt-dir runs/conv]

Trains the full-size model (CLIP ViT-B/32 + depth ResNet + waypoint TRM
+ cross-modal planner) with schedule-sampled IL on the synthetic
instruction language and evaluates on a held-out env seed, printing one
JSON line per eval point. This is the sim-free analogue of the
reference's fine-tuning run (ss_trainer_ETP.py:440-512): it validates
that the entire TPU stack learns instruction-following end to end, not
that it reaches R2R numbers (the synthetic language is much simpler).

--ckpt-dir makes the run durable across sessions: it resumes from the
newest checkpoint in the directory, saves on SIGTERM/exit (so a
`timeout`-bounded run keeps its progress) and every --save-every
iterations (VM-teardown insurance), and prunes old checkpoints to
bound disk. Iteration numbers in the output are global, so appending
successive sessions' output yields one monotone curve.
"""

import argparse
import glob
import json
import os
import re
import shutil
import signal
import time


def prune_checkpoints(ckpt_dir: str, keep: int = 1):
    cands = [p for p in glob.glob(os.path.join(ckpt_dir, "ckpt_iter*"))
             if ".orbax-checkpoint-tmp" not in os.path.basename(p)]

    def it(p):
        m = re.search(r"iter(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    for p in sorted(cands, key=it)[:-keep]:
        shutil.rmtree(p, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--num-envs", type=int, default=8)
    ap.add_argument("--eval-episodes", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-dir", default="",
                    help="resume/save checkpoints here (cross-session runs)")
    ap.add_argument("--save-every", type=int, default=100,
                    help="mid-run checkpoint interval (0 = exit-save only)")
    ap.add_argument("--depth-u16", action="store_true",
                    help="uint16 depth transport (halves depth upload)")
    ap.add_argument("--pretrained-ckpt", default="",
                    help="warm-start the planner from a PretrainTrainer "
                         "orbax checkpoint (training/warm_start.py — the "
                         "MODEL.pretrained_path two-stage recipe; see "
                         "tools/pretrain_synth.py for producing one)")
    args = ap.parse_args()

    import dataclasses

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.finetune import FinetuneTrainer

    cfg = r2r_config()
    if args.depth_u16:
        cfg = dataclasses.replace(
            cfg, il=dataclasses.replace(cfg.il, depth_transport_uint16=True))

    def make_envs(seed):
        return GeometricNavEnv(
            num_envs=args.num_envs, seed=seed,
            vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)

    trainer = FinetuneTrainer(cfg, make_envs(args.seed), seed=args.seed,
                              ckpt_dir=args.ckpt_dir or "checkpoints")
    if args.pretrained_ckpt:
        trainer.load_pretrained(args.pretrained_ckpt)
        print(json.dumps({"warm_started_from": args.pretrained_ckpt}),
              flush=True)
    if args.ckpt_dir and trainer.resume_latest():
        print(json.dumps({"resumed_at": trainer.iteration}), flush=True)
        # fresh episode stream per session: the env pool's rng is not
        # part of the checkpoint, so resuming with the same seed would
        # re-train on the same early episodes of the seed-0 stream every
        # session — with short OOM-guarded sessions that repetition
        # visibly overfits (iter-350 eval: IL_loss down, SR down, agent
        # wanders; see NOTES_ROUND5). Offset the seed by the resume
        # iteration so each session sees new scenes.
        trainer.envs = make_envs(args.seed + trainer.iteration)
        trainer.engine.envs = trainer.envs
    heldout = make_envs(args.seed + 1000)   # unseen scenes/episodes

    def evaluate():
        train_envs = trainer.envs
        trainer.engine.envs = heldout
        stats = trainer.evaluate(args.eval_episodes)
        trainer.engine.envs = train_envs
        return stats

    def emit(payload, stats):
        payload.update({k: round(v, 3) for k, v in stats.items()})
        # SR standard error on n Bernoulli episodes: the curve's noise floor
        sr, n = stats.get("success", 0.0), max(stats.get("n_episodes", 1), 1)
        payload["sr_sem"] = round((sr * (1.0 - sr) / n) ** 0.5, 3)
        if trainer.bucket_counts:
            # realized (T, G) learn-program mix, cumulative this session
            payload["buckets"] = {f"T{t}_G{g}": c for (t, g), c in
                                  sorted(trainer.bucket_counts.items())}
        print(json.dumps(payload), flush=True)

    if trainer.iteration == 0:
        emit({"iter": 0}, evaluate())
    t0 = time.time()
    start = trainer.iteration

    def _term(signum, frame):   # `timeout` sends SIGTERM: save, then exit
        raise KeyboardInterrupt
    signal.signal(signal.SIGTERM, _term)

    try:
        while trainer.iteration < args.iters:
            n = min(args.eval_every, args.iters - trainer.iteration)
            logs = trainer.train(
                n, save_every=(args.save_every or None) if args.ckpt_dir
                else None)
            emit({"iter": trainer.iteration,
                  "IL_loss": round(logs["IL_loss"], 3),
                  "sec_per_iter": round(
                      (time.time() - t0) / (trainer.iteration - start), 2)},
                 evaluate())
            if args.ckpt_dir:
                prune_checkpoints(args.ckpt_dir)
    except KeyboardInterrupt:
        print(json.dumps({"interrupted_at": trainer.iteration}), flush=True)
    finally:
        if args.ckpt_dir and trainer.iteration > start:
            path = os.path.join(args.ckpt_dir,
                                f"ckpt_iter{trainer.iteration}")
            if not os.path.exists(path):
                t = time.time()
                trainer.save_checkpoint(path)
                print(json.dumps({"saved": path,
                                  "save_s": round(time.time() - t, 1)}),
                      flush=True)
            prune_checkpoints(args.ckpt_dir)


if __name__ == "__main__":
    main()
