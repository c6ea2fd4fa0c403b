"""Checkpoint conversion CLI: released PyTorch weights -> orbax params.

    python -m etpnav_tpu.convert_cli --kind planner \
        --torch-ckpt model_step_82500.pt --out ckpt/planner
    python -m etpnav_tpu.convert_cli --kind waypoint \
        --torch-ckpt check_cwp_bestdist_hfov90 --out ckpt/waypoint
    python -m etpnav_tpu.convert_cli --kind clip \
        --torch-ckpt ViT-B-32.pt --out ckpt/clip
    python -m etpnav_tpu.convert_cli --kind depth \
        --torch-ckpt gibson-2plus-resnet50.pth --out ckpt/depth

Covers the reference's load-time key surgery (vlnbert_init.py:21-30,
ss_trainer_ETP.py:196-236, resnet_encoders.py:37-50).
"""

from __future__ import annotations

import argparse


def load_torch_state_dict(path: str, kind: str):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if kind == "depth":
        # ddppo checkpoints: {'state_dict': {'actor_critic.net.visual_encoder.*'}}
        sd = ckpt.get("state_dict", ckpt)
        out = {}
        for k, v in sd.items():
            parts = k.split(".")
            if "visual_encoder" in parts:
                i = parts.index("visual_encoder")
                out[".".join(parts[i + 1:])] = v
            else:
                out[k] = v
        return out
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    if hasattr(ckpt, "state_dict"):   # jit-scripted clip archives
        return ckpt.state_dict()
    if isinstance(ckpt, dict) and "predictor" in ckpt:
        return ckpt["predictor"]
    return ckpt


def convert(kind: str, torch_ckpt: str, task_type: str = "r2r"):
    from etpnav_tpu import config as C
    sd = load_torch_state_dict(torch_ckpt, kind)
    cfg = C.r2r_config() if task_type == "r2r" else C.rxr_config()
    if kind == "planner":
        from etpnav_tpu.models.convert import convert_planner
        p = cfg.planner
        return convert_planner(sd, p.num_l_layers, p.num_pano_layers,
                               p.num_x_layers)
    if kind == "waypoint":
        from etpnav_tpu.models.convert import convert_waypoint
        return convert_waypoint(sd, cfg.waypoint.num_layers)
    if kind == "clip":
        from etpnav_tpu.models.clip_vit import convert_openai_clip
        return convert_openai_clip(sd, cfg.clip)
    if kind == "depth":
        from etpnav_tpu.models.depth_resnet import convert_ddppo_depth
        return convert_ddppo_depth(sd, cfg.depth)
    raise ValueError(kind)


def main(args=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True,
                    choices=["planner", "waypoint", "clip", "depth"])
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--task-type", default="r2r", choices=["r2r", "rxr"])
    ns = ap.parse_args(args)
    params = convert(ns.kind, ns.torch_ckpt, ns.task_type)
    from etpnav_tpu.training.checkpoints import save_checkpoint
    save_checkpoint(ns.out, params)
    import jax
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {ns.kind}: {n / 1e6:.1f}M params -> {ns.out}")


if __name__ == "__main__":
    main()
