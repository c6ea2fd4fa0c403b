"""Warm-vs-cold: does the two-stage recipe's warm start help downstream
IL? (VERDICT r4 #3 — the reference composes pretrain -> fine-tune via
MODEL.pretrained_path, run_r2r/main.bash; this measures the JAX-native
handoff end to end.)

Usage:
  python tools/warm_vs_cold.py --tiny --cpu          # tiny-scale, CPU
  python tools/warm_vs_cold.py --pretrain-steps 500  # full r2r, TPU

Protocol: pretrain PretrainTrainer on synthetic scan graphs
(data/pretrain_data.py SyntheticNavWorld analogue), save the orbax
checkpoint, then train two FinetuneTrainers from the SAME seed on the
SAME GeometricNavEnv stream — one cold-initialized, one warm-started
via FinetuneTrainer.load_pretrained — and report IL-loss + held-out
SR/SPL at matched iterations. One JSON line per eval point per arm;
final line is a side-by-side summary.

Caveat recorded with the result: the pretrain distribution is the
synthetic sampler's, not MP3D — transfer to the geometric world may be
weak or negative; the point is that the recorded comparison exists
(a negative is a result)."""

import argparse
import dataclasses
import json
import os
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain-steps", type=int, default=300)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--eval-episodes", type=int, default=12)
    ap.add_argument("--num-envs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from etpnav_tpu.config import r2r_config, tiny_config
    from etpnav_tpu.data.pretrain_data import PretrainShapes
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.finetune import FinetuneTrainer
    from etpnav_tpu.training.pretrain import PretrainTrainer

    if args.tiny:
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, planner=dataclasses.replace(
                cfg.planner, max_txt_len=16, image_feat_size=32,
                depth_feat_size=16))
        shapes = PretrainShapes(
            max_txt_len=16, max_traj_steps=4, num_views=12, max_cands=4,
            max_gmap_len=24, image_feat_size=32, depth_feat_size=16,
            vocab_size=512, mask_token_id=3, mask_vocab_range=(10, 500))
    else:
        cfg = r2r_config()
        shapes = PretrainShapes()
    cfg = dataclasses.replace(
        cfg, pretrain=dataclasses.replace(
            cfg.pretrain, batch_size=args.batch,
            num_train_steps=args.pretrain_steps,
            warmup_steps=max(args.pretrain_steps // 10, 1)))

    t0 = time.time()
    pre = PretrainTrainer(cfg, shapes, seed=args.seed, num_scans=8,
                          scan_size=16)
    logs = pre.train_steps(args.pretrain_steps)
    val = pre.validate()
    ckpt = os.path.join(tempfile.mkdtemp(prefix="warmstart_"),
                        f"model_step_{args.pretrain_steps}")
    pre.save_checkpoint(ckpt)
    print(json.dumps({"pretrain_steps": args.pretrain_steps,
                      **{k: round(v, 4) for k, v in logs.items()},
                      **{k: round(v, 4) for k, v in val.items()},
                      "pretrain_s": round(time.time() - t0, 1)}),
          flush=True)

    def make_envs(seed):
        return GeometricNavEnv(
            num_envs=args.num_envs, seed=seed,
            vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)

    summary = {}
    for arm in ("cold", "warm"):
        tr = FinetuneTrainer(cfg, make_envs(args.seed), seed=args.seed)
        if arm == "warm":
            tr.load_pretrained(ckpt)
        heldout = make_envs(args.seed + 1000)
        curve = []
        done = 0
        while done < args.iters:
            n = min(args.eval_every, args.iters - done)
            logs = tr.train(n)
            done += n
            train_envs = tr.envs
            tr.engine.envs = heldout
            stats = tr.evaluate(args.eval_episodes)
            tr.engine.envs = train_envs
            point = {"arm": arm, "iter": done,
                     "IL_loss": round(logs["IL_loss"], 4),
                     **{k: round(v, 3) for k, v in stats.items()}}
            curve.append(point)
            print(json.dumps(point), flush=True)
        summary[arm] = {"IL_loss": curve[-1]["IL_loss"],
                        "success": curve[-1].get("success"),
                        "spl": curve[-1].get("spl")}
    summary["delta_IL_loss"] = round(
        summary["cold"]["IL_loss"] - summary["warm"]["IL_loss"], 4)
    print(json.dumps({"summary": summary,
                      "note": "synthetic pretrain distribution != the "
                              "geometric world; negative transfer is a "
                              "recorded result, not a bug"}), flush=True)


if __name__ == "__main__":
    main()
