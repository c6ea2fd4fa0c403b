"""Golden-activation capture harness (runs in a *reference* environment).

The BASELINE.md north star requires per-step action logits matching the
PyTorch reference within fp32 tolerance when loading released checkpoints.
The released .pth files are not available in this build image, so this
tool is the bridge: run it where torch + the reference package
(vlnce_baselines) + the released checkpoints exist; it records probe
inputs and the reference model's activations at the SURVEY.md §4 capture
points (forward_txt / forward_panorama / forward_navigation outputs and
the waypoint heatmap logits). Our CI then asserts parity via
tools/verify_goldens.py without needing torch or the reference.

    # reference environment:
    python tools/capture_goldens.py --planner-ckpt model_step_82500.pt \
        --waypoint-ckpt check_cwp_bestdist_hfov90 --out goldens/
    # this repo:
    python tools/verify_goldens.py --goldens goldens/ \
        --planner-ckpt model_step_82500.pt --waypoint-ckpt check_...
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_probes(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    B, L, P, G = 2, 80, 17, 24
    return {
        "txt_ids": rng.integers(0, 30522, (B, L)).astype(np.int64),
        "txt_mask": (np.arange(L)[None] < np.array([[32], [80]])),
        "rgb_fts": rng.standard_normal((B, P, 512)).astype(np.float32),
        "dep_fts": rng.standard_normal((B, P, 128)).astype(np.float32),
        "loc_fts": rng.standard_normal((B, P, 4)).astype(np.float32),
        "nav_types": (rng.random((B, P)) < 0.3).astype(np.int64),
        "view_len": np.array([14, 17]),
        "gmap_img_fts": rng.standard_normal((B, G, 768)).astype(np.float32),
        "gmap_step_ids": rng.integers(0, 10, (B, G)).astype(np.int64),
        "gmap_pos_fts": rng.standard_normal((B, G, 7)).astype(np.float32),
        "gmap_mask": (np.arange(G)[None] < np.array([[12], [24]])),
        "gmap_visited": (rng.random((B, G)) < 0.3)
        & (np.arange(G)[None] < np.array([[12], [24]])),
        "gmap_pair_dists": np.abs(rng.standard_normal((B, G, G))).astype(
            np.float32),
        "depth_feats": rng.standard_normal((24, 128, 4, 4)).astype(
            np.float32),
    }


def capture(planner_ckpt: str, waypoint_ckpt: str, out_dir: str,
            task_type: str = "r2r", seed: int = 0):
    """Runs the REFERENCE model over the probes. Only works where the
    reference package is importable; we call its public API (no vendored
    code)."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    probes = make_probes(seed)
    np.savez(os.path.join(out_dir, "probes.npz"), **probes)

    from types import SimpleNamespace
    from vlnce_baselines.models.etp.vlnbert_init import get_vlnbert_models
    from vlnce_baselines.waypoint_pred.TRM_net import BinaryDistPredictor_TRM

    model_cfg = SimpleNamespace(
        pretrained_path=planner_ckpt, task_type=task_type,
        use_depth_embedding=True, use_sprels=True,
        fix_lang_embedding=False, fix_pano_embedding=False)
    model = get_vlnbert_models(config=model_cfg).eval()

    t = {k: torch.from_numpy(v) for k, v in probes.items()}
    out = {}
    with torch.no_grad():
        out["txt_embeds"] = model.forward_txt(
            t["txt_ids"], t["txt_mask"]).numpy()
        pano_embeds, pano_masks = model.forward_panorama(
            t["rgb_fts"], t["dep_fts"], t["loc_fts"],
            t["nav_types"], torch.from_numpy(probes["view_len"]))
        out["pano_embeds"] = pano_embeds.numpy()
        nav = model.forward_navigation(
            torch.from_numpy(out["txt_embeds"]), t["txt_mask"],
            None, t["gmap_step_ids"], t["gmap_img_fts"],
            t["gmap_pos_fts"], t["gmap_mask"], t["gmap_visited"],
            t["gmap_pair_dists"])
        out["global_logits"] = nav["global_logits"].numpy()
        out["gmap_embeds"] = nav["gmap_embeds"].numpy()

        wp = BinaryDistPredictor_TRM(device="cpu").eval()
        sd = torch.load(waypoint_ckpt, map_location="cpu")
        sd = sd.get("predictor", sd)
        wp.load_state_dict({k.replace("predictor.", ""): v
                            for k, v in sd.items()}, strict=False)
        out["waypoint_heatmap"] = wp(
            None, t["depth_feats"]).numpy()

    np.savez(os.path.join(out_dir, "reference_activations.npz"), **out)
    print(f"captured {sorted(out)} -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--planner-ckpt", required=True)
    ap.add_argument("--waypoint-ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--task-type", default="r2r")
    ns = ap.parse_args()
    capture(ns.planner_ckpt, ns.waypoint_ckpt, ns.out, ns.task_type)


if __name__ == "__main__":
    main()
