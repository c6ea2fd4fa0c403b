"""Pretrain the planner on synthetic graph data and save an orbax
checkpoint for the two-stage warm-start demo.

Usage: python tools/pretrain_synth.py [--steps 500] [--out runs/pretrain]
       [--batch 32] [--num-scans 8] [--scan-size 24]

This is the JAX-native analogue of the reference's stage 1
(pretrain_src/train_r2r.py: 100k MLM+SAP steps on offline MP3D graphs)
at demo scale: PretrainSampler synthesizes scan graphs with the same
tensor layout the released HDF5 data has (data/pretrain_data.py), the
PretrainTrainer runs the task-mixed recipe, and the saved checkpoint
loads into FinetuneTrainer via --pretrained-ckpt on
tools/learning_demo.py (training/warm_start.py surgery — the
MODEL.pretrained_path seam of run_r2r/main.bash).

Prints one JSON line per log interval; the final line carries validate()
accuracies so the checkpoint's pretrain quality is recorded next to it.
"""

import argparse
import dataclasses
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="runs/pretrain")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num-scans", type=int, default=8)
    ap.add_argument("--scan-size", type=int, default=24)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs; in-code "
                         "override — env vars are too late on this image)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke of the full loop)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from etpnav_tpu.config import r2r_config, tiny_config
    from etpnav_tpu.data.pretrain_data import PretrainShapes
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
        # reference r2r pretrain shapes — matches the r2r planner dims,
        # so the checkpoint warm-starts FinetuneTrainer without surgery
        # errors
        shapes = PretrainShapes()
    cfg = dataclasses.replace(
        cfg, pretrain=dataclasses.replace(
            cfg.pretrain, batch_size=args.batch,
            num_train_steps=args.steps,
            warmup_steps=max(args.steps // 10, 1)))
    tr = PretrainTrainer(cfg, shapes, seed=args.seed,
                         num_scans=args.num_scans,
                         scan_size=args.scan_size)
    t0 = time.time()
    done = 0
    while done < args.steps:
        n = min(args.log_every, args.steps - done)
        logs = tr.train_steps(n)
        done += n
        print(json.dumps({"step": done,
                          **{k: round(v, 4) for k, v in logs.items()},
                          "sec_per_step": round((time.time() - t0) / done,
                                                3)}), flush=True)
    val = tr.validate()
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"model_step_{done}")
    tr.save_checkpoint(path)
    print(json.dumps({"saved": path,
                      **{k: round(v, 4) for k, v in val.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
