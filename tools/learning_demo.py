"""End-to-end learning validation on the geometric world.

Usage: python tools/learning_demo.py [--iters 400] [--eval-every 100]
       [--num-envs 8] [--eval-episodes 24]

Trains the full-size model (CLIP ViT-B/32 + depth ResNet + waypoint TRM
+ cross-modal planner) with schedule-sampled IL on the synthetic
instruction language and evaluates on a held-out env seed, printing one
JSON line per eval point. This is the sim-free analogue of the
reference's fine-tuning run (ss_trainer_ETP.py:440-512): it validates
that the entire TPU stack learns instruction-following end to end, not
that it reaches R2R numbers (the synthetic language is much simpler).
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--num-envs", type=int, default=8)
    ap.add_argument("--eval-episodes", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.finetune import FinetuneTrainer

    cfg = r2r_config()

    def make_envs(seed):
        return GeometricNavEnv(
            num_envs=args.num_envs, seed=seed,
            vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)

    trainer = FinetuneTrainer(cfg, make_envs(args.seed), seed=args.seed)
    heldout = make_envs(args.seed + 1000)   # unseen scenes/episodes

    def evaluate():
        train_envs = trainer.envs
        trainer.engine.envs = heldout
        stats = trainer.evaluate(args.eval_episodes)
        trainer.engine.envs = train_envs
        return stats

    s0 = evaluate()
    print(json.dumps({"iter": 0, **{k: round(v, 3) for k, v in
                                    s0.items()}}), flush=True)
    t0 = time.time()
    done = 0
    while done < args.iters:
        n = min(args.eval_every, args.iters - done)
        logs = trainer.train(n)
        done += n
        s = evaluate()
        print(json.dumps({
            "iter": done, "IL_loss": round(logs["IL_loss"], 3),
            "sec_per_iter": round((time.time() - t0) / done, 2),
            **{k: round(v, 3) for k, v in s.items()}}), flush=True)


if __name__ == "__main__":
    main()
