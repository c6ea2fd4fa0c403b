"""Candidate waypoint predictor TRM + heatmap post-processing.

Parity targets:
- BinaryDistPredictor_TRM (waypoint_pred/TRM_net.py:9-88): depth features
  -> 2-layer BERT with circular neighbor attention mask -> 120x12 heatmap
  with a 5-slot rotation offset.
- Heatmap -> candidate pipeline (Policy_ViewSelection_ETP.py:220-318):
  softmax over the full map, wrap rows, NMS, candidate angles/distances,
  image-index mapping, angle features.

Everything below runs in one jit with static shapes; the reference's
host-side .nonzero() loops become fixed-slot masked arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from etpnav_tpu.config import WaypointConfig
from etpnav_tpu.models.bert_core import BertDims, bert_stack, bert_stack_init
from etpnav_tpu.ops.basic import (
    linear,
    linear_init,
    mask_to_bias,
)
from etpnav_tpu.ops.nms import extract_candidates, heatmap_nms


def circular_neighbor_mask(num_imgs: int, neighbor: int) -> np.ndarray:
    """(num_imgs, num_imgs) 0/1 mask where each view attends to itself and
    `neighbor` views on each side (waypoint_pred/utils.py:90-102)."""
    row = np.zeros(num_imgs)
    row[: neighbor + 1] = 1
    if neighbor:
        row[-neighbor:] = 1
    mask = np.stack([np.roll(row, i) for i in range(num_imgs)], 0)
    return mask


def init_waypoint_params(key: jax.Array, cfg: WaypointConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    depth_flat = int(np.prod(cfg.depth_feat_shape))
    per_img_out = int(cfg.num_distances * (cfg.num_angles / cfg.num_images))
    return {
        "visual_fc_depth": linear_init(k1, depth_flat, cfg.hidden_size),
        "waypoint_trm": bert_stack_init(
            k2, cfg.num_layers, cfg.hidden_size, cfg.hidden_size * 4),
        "vis_classifier": {
            "dense1": linear_init(k3, cfg.hidden_size, cfg.hidden_size),
            "dense2": linear_init(k4, cfg.hidden_size, per_img_out),
        },
    }


def waypoint_heatmap(params: dict, cfg: WaypointConfig,
                     depth_feats: jax.Array) -> jax.Array:
    """depth_feats (B, 12, *depth_feat_shape) -> (B, 120, 12) logits,
    rotated so each image points at the middle of its sector
    (TRM_net.py:62-88)."""
    B = depth_feats.shape[0]
    x = depth_feats.reshape(B, cfg.num_images, -1)
    x = jax.nn.relu(linear(params["visual_fc_depth"], x))

    mask = jnp.asarray(circular_neighbor_mask(cfg.num_images, cfg.neighbor))
    bias = mask_to_bias(mask.astype(bool))[None, None, :, :]
    dims = BertDims(cfg.hidden_size, cfg.num_heads, cfg.hidden_size * 4,
                    cfg.layer_norm_eps, 0.0, 0.0)  # predictor runs frozen
    x = bert_stack(params["waypoint_trm"], x, bias, dims)

    h = jax.nn.relu(linear(params["vis_classifier"]["dense1"], x))
    h = linear(params["vis_classifier"]["dense2"], h)
    logits = h.reshape(B, cfg.num_angles, cfg.num_distances)
    # heatmap offset rotation (TRM_net.py:84-87)
    return jnp.roll(logits, -cfg.heatmap_offset, axis=1)


def heatmap_to_candidates(cfg: WaypointConfig, heatmap_logits: jax.Array
                          ) -> dict:
    """Softmax -> wrap -> NMS -> fixed-slot candidates
    (Policy_ViewSelection_ETP.py:220-318, argmax/eval path).

    Returns dict of fixed-shape arrays, K = cfg.max_predictions slots:
      angle_idx (B,K) int in [0,120), dist_idx (B,K) int in [0,12),
      valid (B,K) bool, img_idx (B,K) int counter-clockwise view index,
      angles_ccw (B,K) float rad, distances (B,K) float meters,
      angle_fts (B,K,4) clockwise angle features.
    """
    B = heatmap_logits.shape[0]
    A, D = cfg.num_angles, cfg.num_distances
    if jax.default_backend() == "tpu":
        # one fused kernel for softmax+wrap+NMS: the XLA chain spends
        # ~0.6 ms at B=16 in op overhead on 94 KB of data
        from etpnav_tpu.ops.pallas_nms import fused_heatmap_nms
        nms_map = fused_heatmap_nms(
            heatmap_logits.astype(jnp.float32), cfg.max_predictions,
            cfg.nms_sigma)[:, 1:-1, :]
    else:
        prob = jax.nn.softmax(
            heatmap_logits.reshape(B, A * D).astype(jnp.float32), axis=1
        ).reshape(B, A, D)
        wrapped = jnp.concatenate([prob[:, -1:], prob, prob[:, :1]],
                                  axis=1)
        nms_map = heatmap_nms(wrapped, cfg.max_predictions,
                              cfg.nms_sigma)
        nms_map = nms_map[:, 1:-1, :]
    angle_idx, dist_idx, valid = extract_candidates(
        nms_map, cfg.max_predictions)

    af = angle_idx.astype(jnp.float32)
    angles_cw = af / A * 2.0 * math.pi
    angles_ccw = 2.0 * math.pi - angles_cw
    distances = (dist_idx.astype(jnp.float32) + 1.0) * 0.25
    # counter-clockwise image index (Policy_ViewSelection_ETP.py:313-314)
    img_idx = (12 - (angle_idx + 5) // 10) % 12
    angle_fts = angle_feature(angles_cw)
    return {
        "angle_idx": angle_idx, "dist_idx": dist_idx, "valid": valid,
        "img_idx": img_idx, "angles_ccw": angles_ccw,
        "distances": distances, "angle_fts": angle_fts,
        "nms_map": nms_map,
    }


def sample_candidates(cfg: WaypointConfig, heatmap_logits: jax.Array,
                      nms_map: jax.Array, rng: jax.Array) -> dict:
    """Train-time waypoint augmentation: re-sample each candidate's
    (angle, distance) from its source image's 10x12 heatmap region
    (Policy_ViewSelection_ETP.py:247-283).

    Keeps the NMS-selected image sectors but draws the in-sector cell from
    a categorical over the region logits.
    """
    B = heatmap_logits.shape[0]
    A, D = cfg.num_angles, cfg.num_distances
    K = cfg.max_predictions
    per_img = A // cfg.num_images  # 10

    angle_idx, dist_idx, valid = extract_candidates(nms_map, K)
    # clockwise image index of each candidate (:263-264)
    img_idx_cw = ((angle_idx + 5) // 10) % 12

    # undo the heatmap offset then carve per-image regions (:250-255)
    regional = jnp.roll(heatmap_logits, cfg.heatmap_offset, axis=1)
    regional = regional.reshape(B, cfg.num_images, per_img * D)
    region_logits = jnp.take_along_axis(
        regional, img_idx_cw[:, :, None], axis=1)      # (B,K,120)
    draw = jax.random.categorical(rng, region_logits, axis=-1)  # (B,K)

    # map back to absolute angle (:274-280)
    angle_ptr = jnp.where(img_idx_cw != 0, (img_idx_cw - 1) * per_img + 5, 0)
    s_angle = draw // D + angle_ptr
    s_dist = draw % D

    af = s_angle.astype(jnp.float32)
    angles_cw = af / A * 2.0 * math.pi
    img_idx = (12 - (s_angle + 5) // 10) % 12
    return {
        "angle_idx": s_angle, "dist_idx": s_dist, "valid": valid,
        "img_idx": img_idx,
        "angles_ccw": 2.0 * math.pi - angles_cw,
        "distances": (s_dist.astype(jnp.float32) + 1.0) * 0.25,
        "angle_fts": angle_feature(angles_cw),
        "nms_map": nms_map,
    }


def angle_feature(headings: jax.Array) -> jax.Array:
    """(...,) heading rad -> (..., 4) [sin h, cos h, sin 0, cos 0]
    (models/utils.py:49-57)."""
    z = jnp.zeros_like(headings)
    return jnp.stack([jnp.sin(headings), jnp.cos(headings),
                      jnp.sin(z), jnp.cos(z)], axis=-1)


def pano_angle_features() -> np.ndarray:
    """Fixed 12-view counter-clockwise pano angle features
    (Policy_ViewSelection_ETP.py:141-143)."""
    idx = np.arange(12, dtype=np.float64)
    ang = (1.0 - idx / 12.0) * 2.0 * np.pi
    z = np.zeros_like(ang)
    return np.stack([np.sin(ang), np.cos(ang), np.sin(z), np.cos(z)],
                    axis=-1).astype(np.float32)
