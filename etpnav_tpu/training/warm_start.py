"""JAX-native pretrain -> finetune warm start (the two-stage recipe).

The reference's training story is two-stage: pretrain the planner on
offline graph data (pretrain_src), then fine-tune from
MODEL.pretrained_path (run_r2r/main.bash). The torch checkpoint is loaded
with key surgery — vlnbert_init.py:21-30 renames 'bert.*' -> 'vln_bert.*',
keeps the SAP head, and drops pretrain-only heads via strict=False.

Here both stages are the same JAX param tree, so the surgery is
subtree-level and exact:

- the trunk (embeddings, lang_encoder, img_embeddings, global_encoder,
  global_sap_head) is IDENTICAL between PretrainTrainer
  (init_pretrain_params, training/pretrain.py) and the finetune planner
  (init_planner_params, models/planner.py) — forward_sap IS
  forward_navigation, so the SAP head transfers by construction;
- pretrain-only top-level heads (mlm_head, local_encoder,
  image_classifier, og_head) are dropped — the finetune model has no use
  for them (same as the reference's strict=False drop);
- inside global_encoder/encoder, the lang2visn branch (lang_self_att,
  lang_ffn per x-layer — used only by the MLM path,
  pretrain vilmodel.py:400-411) is dropped.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

#: top-level param subtrees that exist only in the pretrain model
PRETRAIN_ONLY_HEADS = ("mlm_head", "local_encoder", "image_classifier",
                       "og_head")
#: per-x-layer subtrees used only by the MLM lang2visn path
LANG2VISN_KEYS = ("lang_self_att", "lang_ffn")


def pretrain_to_planner(pretrain_params: dict) -> dict:
    """Drop the pretrain-only heads + lang2visn branch; everything else
    transfers one-to-one (vlnbert_init.py:21-30 surgery, in-tree)."""
    out = {k: v for k, v in pretrain_params.items()
           if k not in PRETRAIN_ONLY_HEADS}
    ge = dict(out["global_encoder"])
    ge["encoder"] = {k: v for k, v in ge["encoder"].items()
                     if k not in LANG2VISN_KEYS}
    out["global_encoder"] = ge
    return out


def load_pretrained_planner(path: str, like_planner: dict) -> dict:
    """Read a PretrainTrainer orbax checkpoint (training/pretrain.py
    save_checkpoint layout: {params, opt_state, step, rng}) and return
    finetune planner params validated leaf-by-leaf against the target
    template — a dim mismatch between the two stages' PlannerConfigs is a
    hard error, not a silent partial load."""
    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    params = restored.get("params", restored)
    trunk = pretrain_to_planner(params)

    def merge(like, val):
        val = jnp.asarray(val)
        if val.shape != like.shape:
            raise ValueError(
                f"pretrain ckpt leaf shape {val.shape} != finetune "
                f"planner template {like.shape} — the two stages were "
                "built from different PlannerConfigs")
        return val.astype(like.dtype)

    # tree_map also raises if the surgered structure doesn't match the
    # finetune template (missing/extra subtrees)
    return jax.tree_util.tree_map(merge, like_planner, trunk)
