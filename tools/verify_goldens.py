"""Assert fp32-tolerance parity against captured reference activations.

Counterpart of tools/capture_goldens.py: loads the released torch
checkpoints through etpnav_tpu.models.convert, replays the recorded
probes through the JAX models, and compares against the reference's
recorded outputs (BASELINE.md logit-parity north star).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def verify(goldens_dir: str, planner_ckpt: str, waypoint_ckpt: str,
           task_type: str = "r2r", atol: float = 5e-4) -> bool:
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch

    from etpnav_tpu import config as C
    from etpnav_tpu.models import planner, waypoint
    from etpnav_tpu.models.convert import convert_planner, convert_waypoint

    probes = dict(np.load(os.path.join(goldens_dir, "probes.npz")))
    ref = dict(np.load(os.path.join(goldens_dir,
                                    "reference_activations.npz")))

    cfg = (C.r2r_config() if task_type == "r2r" else C.rxr_config()).planner
    import dataclasses
    cfg = dataclasses.replace(cfg, use_bf16=False)
    ckpt = torch.load(planner_ckpt, map_location="cpu")
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        # released finetune files nest the weights ({'state_dict':
        # {'net.module.vln_bert.*'}}, ss_trainer_ETP.py:74-83); pretrain
        # files are flat 'bert.*' dicts — caught by the CI drill
        # (tests/test_artifact_drills.py)
        ckpt = ckpt["state_dict"]
    params = convert_planner(ckpt, cfg.num_l_layers, cfg.num_pano_layers,
                             cfg.num_x_layers)

    ok = True

    def check(name, ours, theirs, mask=None):
        nonlocal ok
        ours = np.asarray(ours)
        if mask is not None:
            ours, theirs = ours[mask], theirs[mask]
        finite = np.isfinite(theirs)
        err = np.abs(ours[finite] - theirs[finite]).max() if finite.any() \
            else 0.0
        status = "OK " if err <= atol else "FAIL"
        if err > atol:
            ok = False
        print(f"{status} {name}: max |err| = {err:.2e}")

    txt = planner.forward_txt(params, cfg, jnp.asarray(probes["txt_ids"]),
                              jnp.asarray(probes["txt_mask"]))
    check("txt_embeds", txt, ref["txt_embeds"], probes["txt_mask"])

    view_mask = (np.arange(probes["rgb_fts"].shape[1])[None]
                 < probes["view_len"][:, None])
    pano, _ = planner.forward_panorama(
        params, cfg, jnp.asarray(probes["rgb_fts"]),
        jnp.asarray(probes["dep_fts"]), jnp.asarray(probes["loc_fts"]),
        jnp.asarray(probes["nav_types"]), jnp.asarray(view_mask))
    check("pano_embeds", pano, ref["pano_embeds"], view_mask)

    nav = planner.forward_navigation(
        params, cfg, txt, jnp.asarray(probes["txt_mask"]),
        jnp.asarray(probes["gmap_img_fts"]),
        jnp.asarray(probes["gmap_step_ids"]),
        jnp.asarray(probes["gmap_pos_fts"]),
        jnp.asarray(probes["gmap_mask"]),
        jnp.asarray(probes["gmap_visited"]),
        jnp.asarray(probes["gmap_pair_dists"]))
    check("global_logits", nav["global_logits"], ref["global_logits"],
          probes["gmap_mask"])

    wcfg = C.r2r_config().waypoint
    wp_params = convert_waypoint(
        torch.load(waypoint_ckpt, map_location="cpu"), wcfg.num_layers)
    B = probes["depth_feats"].shape[0] // 12
    hm = waypoint.waypoint_heatmap(
        wp_params, wcfg,
        jnp.asarray(probes["depth_feats"]).reshape(B, 12, -1))
    check("waypoint_heatmap", hm, ref["waypoint_heatmap"])
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--goldens", required=True)
    ap.add_argument("--planner-ckpt", required=True)
    ap.add_argument("--waypoint-ckpt", required=True)
    ap.add_argument("--task-type", default="r2r")
    ns = ap.parse_args()
    sys.exit(0 if verify(ns.goldens, ns.planner_ckpt, ns.waypoint_ckpt,
                         ns.task_type) else 1)


if __name__ == "__main__":
    main()
