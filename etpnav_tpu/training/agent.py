"""ETP agent runtime: jitted device functions for the rollout loop.

Capability target: the mode-multiplexed policy forward of the reference
(models/Policy_ViewSelection_ETP.py:157-358) — language / waypoint /
panorama / navigation — recast as three fixed-shape jitted programs:

- `encode_text`      : instruction ids -> text memory
- `encode_panorama`  : raw 12-view RGB-D -> CLIP/depth features, waypoint
                       heatmap, NMS candidates, fused pano token embeddings
                       (the reference's 'waypoint' + 'panorama' modes fused
                       into ONE device program — no host round-trip between
                       them)
- `score_navigation` : padded graph arrays -> per-node action logits

The pano token layout is fixed-size: K candidate slots followed by 12 view
slots, with validity masks instead of the reference's ragged
pad_tensors_wgrad assembly (ss_trainer_ETP.py:308-342). Token k<K is
candidate k (nav_type 1); token K+v is pano view v, valid iff no candidate
claimed view v. Masked attention makes this equivalent to the reference's
compact packing because the pano encoder has no positional embeddings.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from etpnav_tpu.config import ExperimentConfig
from etpnav_tpu.models import clip_vit, depth_resnet, planner, waypoint


class AgentParams(NamedTuple):
    planner: dict
    clip: dict
    depth: dict
    waypoint: dict


def init_agent_params(key: jax.Array, cfg: ExperimentConfig) -> AgentParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return AgentParams(
        planner=planner.init_planner_params(k1, cfg.planner),
        clip=clip_vit.init_clip_params(k2, cfg.clip),
        depth=depth_resnet.init_depth_params(k3, cfg.depth),
        waypoint=waypoint.init_waypoint_params(k4, cfg.waypoint),
    )


# ---------------------------------------------------------------------------
# device programs
# ---------------------------------------------------------------------------

def encode_text(params: AgentParams, cfg: ExperimentConfig,
                txt_ids: jax.Array, txt_masks: jax.Array,
                rng: Optional[jax.Array] = None,
                train: bool = False) -> jax.Array:
    return planner.forward_txt(params.planner, cfg.planner, txt_ids,
                               txt_masks, rng=rng, train=train)


def encode_panorama(params: AgentParams, cfg: ExperimentConfig,
                    rgb: jax.Array, depth: jax.Array,
                    sample_rng: Optional[jax.Array] = None,
                    train_sampling: bool = False) -> dict:
    """One fused device program for the hot path.

    rgb   : (B, 12, H, W, 3) uint8, counter-clockwise views, view 0 forward
    depth : (B, 12, Hd, Wd, 1) float in [0,1]

    Returns pano token features + waypoint candidates (fixed K slots) +
    raw per-view pooled features. All shapes static.
    """
    wcfg = cfg.waypoint
    B, V = rgb.shape[:2]
    K = wcfg.max_predictions
    dtype = jnp.bfloat16 if cfg.planner.use_bf16 else jnp.float32

    if depth.dtype == jnp.uint16:
        # uint16 transport (ILConfig.depth_transport_uint16): the host
        # quantized [0,1] depth; dequantize on device. Static dtype =>
        # a separate compiled program, same math to within 1/65535.
        depth = depth.astype(jnp.float32) * (1.0 / 65535.0)

    # ---- frozen visual encoders over B*12 images (MXU-batched) ----
    rgb_flat = rgb.reshape((B * V,) + rgb.shape[2:])
    if rgb_flat.dtype == jnp.uint8:
        # normalization folded into the patch matmul: no fp32 image copies
        rgb_feats = clip_vit.encode_image_uint8(
            params.clip, cfg.clip, rgb_flat, dtype=dtype)
    else:
        rgb_feats = clip_vit.encode_image(
            params.clip, cfg.clip, clip_vit.preprocess_rgb(rgb_flat),
            dtype=dtype)
    rgb_feats = rgb_feats.reshape(B, V, -1)                  # (B,12,512)

    dep_flat = depth.reshape((B * V,) + depth.shape[2:])
    dep_spatial = depth_resnet.encode_depth(
        params.depth, cfg.depth, dep_flat, dtype=dtype)      # (B*V,s,s,C)
    s = dep_spatial.shape[1]
    c = dep_spatial.shape[-1]
    # waypoint predictor consumes CHW-flattened depth features, clockwise
    # view order (Policy_ViewSelection_ETP.py:179-205)
    dep_chw = dep_spatial.transpose(0, 3, 1, 2).reshape(B, V, c, s, s)
    cw = jnp.concatenate([dep_chw[:, :1], dep_chw[:, 1:][:, ::-1]], axis=1)
    heatmap = waypoint.waypoint_heatmap(
        params.waypoint, wcfg, cw.reshape(B, V, -1))          # (B,120,12)

    # pooled per-view features (ccw order), space_pool = spatial mean
    dep_pooled = dep_spatial.reshape(B, V, s * s, c).mean(2)  # (B,12,C)

    # ---- heatmap -> candidates (argmax + optional sampling) ----
    cands = waypoint.heatmap_to_candidates(wcfg, heatmap)
    if train_sampling:
        cands = waypoint.sample_candidates(wcfg, heatmap, cands["nms_map"],
                                           sample_rng)

    # gather candidate view features (ccw img idx)
    img_idx = cands["img_idx"]                                # (B,K)
    cand_rgb = jnp.take_along_axis(rgb_feats, img_idx[..., None], axis=1)
    cand_dep = jnp.take_along_axis(dep_pooled, img_idx[..., None], axis=1)

    # ---- fixed pano token layout: K cand slots + 12 view slots ----
    pano_loc = jnp.asarray(waypoint.pano_angle_features())    # (12,4)
    covered = jnp.zeros((B, V), bool)
    covered = covered.at[
        jnp.arange(B)[:, None], img_idx].max(cands["valid"])
    tok_rgb = jnp.concatenate([cand_rgb, rgb_feats], axis=1)
    tok_dep = jnp.concatenate([cand_dep, dep_pooled], axis=1)
    tok_loc = jnp.concatenate(
        [cands["angle_fts"],
         jnp.broadcast_to(pano_loc[None], (B, V, 4))], axis=1)
    tok_nav = jnp.concatenate(
        [cands["valid"].astype(jnp.int32),
         jnp.zeros((B, V), jnp.int32)], axis=1)
    tok_mask = jnp.concatenate([cands["valid"], ~covered], axis=1)

    return {
        "rgb_fts": tok_rgb, "dep_fts": tok_dep, "loc_fts": tok_loc,
        "nav_types": tok_nav, "view_masks": tok_mask,
        "cand_valid": cands["valid"], "cand_angles": cands["angles_ccw"],
        "cand_distances": cands["distances"], "cand_img_idx": img_idx,
        "heatmap": heatmap,
    }


def embed_panorama(params: AgentParams, cfg: ExperimentConfig,
                   vp_feats: dict, rng: Optional[jax.Array] = None,
                   train: bool = False, drop_env_rng=None) -> dict:
    """'panorama' mode: token features -> pano embeddings + masked average
    (ss_trainer_ETP.py:837-839). drop_env replicates the p=0.4 RGB feature
    dropout the policy applies before the pano encoder
    (Policy_ViewSelection_ETP.py:102,345)."""
    rgb = vp_feats["rgb_fts"]
    if train and drop_env_rng is not None:
        keep = 0.6
        mask = jax.random.bernoulli(drop_env_rng, keep, rgb.shape)
        rgb = jnp.where(mask, rgb / keep, 0.0)
    pano_embeds, pano_masks = planner.forward_panorama(
        params.planner, cfg.planner, rgb, vp_feats["dep_fts"],
        vp_feats["loc_fts"], vp_feats["nav_types"],
        vp_feats["view_masks"], rng=rng, train=train)
    m = pano_masks[..., None].astype(pano_embeds.dtype)
    avg = (pano_embeds * m).sum(1) / jnp.maximum(m.sum(1), 1e-6)
    return {"pano_embeds": pano_embeds, "avg_pano_embeds": avg,
            "pano_masks": pano_masks}


def score_navigation(params: AgentParams, cfg: ExperimentConfig,
                     txt_embeds: jax.Array, txt_masks: jax.Array,
                     gmap: dict, rng: Optional[jax.Array] = None,
                     train: bool = False) -> dict:
    return planner.forward_navigation(
        params.planner, cfg.planner, txt_embeds, txt_masks,
        gmap["img_fts"], gmap["step_ids"], gmap["pos_fts"], gmap["mask"],
        gmap["visited"], gmap["pair_dists"], rng=rng, train=train)


def perceive(params: AgentParams, cfg: ExperimentConfig, rgb: jax.Array,
             depth: jax.Array, sample_rng: Optional[jax.Array] = None,
             train_sampling: bool = False) -> dict:
    """The whole per-step perception path in ONE device program: frozen
    encoders + waypoint heatmap + NMS candidates + pano-token embedding
    (the reference's 'waypoint' and 'panorama' policy modes, which take a
    host hop between them at ss_trainer_ETP.py:825-839)."""
    wp = encode_panorama(params, cfg, rgb, depth, sample_rng,
                         train_sampling)
    emb = embed_panorama(params, cfg, {
        k: wp[k] for k in ("rgb_fts", "dep_fts", "loc_fts", "nav_types",
                           "view_masks")})
    wp.update(emb)
    return wp


class JittedAgent:
    """Convenience wrapper holding jitted closures over a config."""

    def __init__(self, cfg: ExperimentConfig, params: AgentParams):
        self.cfg = cfg
        self.params = params

        self._encode_text = jax.jit(
            functools.partial(encode_text, cfg=cfg, train=False))
        self._perceive_eval = jax.jit(functools.partial(
            perceive, cfg=cfg, train_sampling=False))
        self._perceive_train = jax.jit(functools.partial(
            perceive, cfg=cfg, train_sampling=True))
        self._embed_pano = jax.jit(
            functools.partial(embed_panorama, cfg=cfg, train=False))
        self._score_nav = jax.jit(
            functools.partial(score_navigation, cfg=cfg, train=False))

    def encode_text(self, txt_ids, txt_masks):
        return self._encode_text(self.params, txt_ids=jnp.asarray(txt_ids),
                                 txt_masks=jnp.asarray(txt_masks))

    def perceive(self, rgb, depth, sample_rng=None):
        """Fused waypoint + panorama step (single device dispatch)."""
        if sample_rng is None:
            return self._perceive_eval(self.params, rgb=jnp.asarray(rgb),
                                       depth=jnp.asarray(depth))
        return self._perceive_train(self.params, rgb=jnp.asarray(rgb),
                                    depth=jnp.asarray(depth),
                                    sample_rng=sample_rng)

    def embed_panorama(self, vp_feats):
        return self._embed_pano(self.params, vp_feats=vp_feats)

    def score_navigation(self, txt_embeds, txt_masks, gmap_arrays):
        return self._score_nav(self.params, txt_embeds=txt_embeds,
                               txt_masks=txt_masks, gmap=gmap_arrays)
