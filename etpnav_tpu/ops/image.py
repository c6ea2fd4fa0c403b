"""Batched observation transforms on device.

Capability target: habitat_extensions/obs_transformers.py —
ResizerPerSensor (:93) and CenterCropperPerSensor (:20) applied to batched
GPU tensors — as jittable jax.image ops fused into the encoder program
(no separate host pass).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_batch(images: jax.Array, size: Tuple[int, int],
                 method: str = "bilinear") -> jax.Array:
    """(..., H, W, C) -> (..., h, w, C). uint8 inputs round-trip uint8."""
    h, w = size
    out_shape = images.shape[:-3] + (h, w, images.shape[-1])
    dtype = images.dtype
    x = images.astype(jnp.float32)
    y = jax.image.resize(x, out_shape, method=method)
    if jnp.issubdtype(dtype, jnp.integer):
        y = jnp.clip(jnp.round(y), 0, 255)
    return y.astype(dtype)


def center_crop_batch(images: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """(..., H, W, C) center crop (CenterCropperPerSensor semantics)."""
    h, w = size
    H, W = images.shape[-3], images.shape[-2]
    top = (H - h) // 2
    left = (W - w) // 2
    return images[..., top:top + h, left:left + w, :]


def apply_obs_transforms(obs: dict, rgb_size: Tuple[int, int] = (224, 224),
                         depth_size: Tuple[int, int] = (128, 128)) -> dict:
    """Resize-then-center-crop per sensor, batched (the reference's
    RL.POLICY.OBS_TRANSFORMS pipeline)."""
    out = dict(obs)
    if "rgb" in obs and obs["rgb"].shape[-3:-1] != rgb_size:
        out["rgb"] = center_crop_batch(
            resize_batch(obs["rgb"], _cover(obs["rgb"].shape[-3:-1],
                                            rgb_size)), rgb_size)
    if "depth" in obs and obs["depth"].shape[-3:-1] != depth_size:
        out["depth"] = center_crop_batch(
            resize_batch(obs["depth"], _cover(obs["depth"].shape[-3:-1],
                                              depth_size)), depth_size)
    return out


def _cover(cur: Tuple[int, int], target: Tuple[int, int]) -> Tuple[int, int]:
    """Smallest proportional resize covering target (resize shorter side)."""
    ch, cw = cur
    th, tw = target
    scale = max(th / ch, tw / cw)
    return max(int(round(ch * scale)), th), max(int(round(cw * scale)), tw)
