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


def panorama_to_equirect(views: jax.Array, out_size: Tuple[int, int],
                         hfov_deg: float = 90.0) -> jax.Array:
    """(..., V, H, W, C) ring of V horizontal views -> (..., h, w, C)
    equirectangular panorama (CubeMap2Equirect analogue,
    habitat_extensions/obs_transformers.py:213; here for a V-view ring rig
    rather than a 6-face cubemap).

    Batched gather: for each output pixel, pick the ring view whose yaw
    sector contains it and sample by perspective projection (nearest
    neighbor; jittable, static shapes).
    """
    import math
    V, H, W = views.shape[-4], views.shape[-3], views.shape[-2]
    oh, ow = out_size
    # output pixel -> (yaw, pitch)
    yaw = (jnp.arange(ow) + 0.5) / ow * 2 * jnp.pi - jnp.pi   # [-pi, pi)
    pitch = (0.5 - (jnp.arange(oh) + 0.5) / oh) * jnp.pi      # [pi/2,-pi/2)
    yaw_g, pitch_g = jnp.meshgrid(yaw, pitch, indexing="xy")
    yaw_g = yaw_g.T if yaw_g.shape != (oh, ow) else yaw_g
    pitch_g = pitch_g.T if pitch_g.shape != (oh, ow) else pitch_g

    sector = 2 * jnp.pi / V
    view_idx = jnp.round(yaw_g / sector).astype(jnp.int32) % V
    rel_yaw = yaw_g - view_idx * sector
    f = (W / 2) / math.tan(math.radians(hfov_deg) / 2)
    x = f * jnp.tan(rel_yaw) + W / 2
    y = -f * jnp.tan(pitch_g) / jnp.cos(rel_yaw) + H / 2
    xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    return views[..., view_idx, yi, xi, :]


def _cover(cur: Tuple[int, int], target: Tuple[int, int]) -> Tuple[int, int]:
    """Smallest proportional resize covering target (resize shorter side)."""
    ch, cw = cur
    th, tw = target
    scale = max(th / ch, tw / cw)
    return max(int(round(ch * scale)), th), max(int(round(cw * scale)), tw)
