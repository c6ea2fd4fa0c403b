"""Batched observation transforms on device.

Capability target: habitat_extensions/obs_transformers.py —
ResizerPerSensor (:93) and CenterCropperPerSensor (:20) applied to batched
GPU tensors — as jittable jax.image ops fused into the encoder program
(no separate host pass).
"""

from __future__ import annotations

import functools
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


# cubemap face order of the reference transformer
# (habitat_extensions/obs_transformers.py:213-245): Back Down Front Left
# Right Up, each a 90-degree-FOV pinhole. Vectors in habitat world frame
# (forward = -z, up = +y, right = +x): (forward, right, up) per face.
_CUBE_FACES = (
    ((0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), (0.0, 1.0, 0.0)),    # Back
    ((0.0, -1.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, -1.0)),   # Down
    ((0.0, 0.0, -1.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)),    # Front
    ((-1.0, 0.0, 0.0), (0.0, 0.0, -1.0), (0.0, 1.0, 0.0)),   # Left
    ((1.0, 0.0, 0.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0)),     # Right
    ((0.0, 1.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)),     # Up
)


def equirect_directions(out_size: Tuple[int, int]) -> "np.ndarray":
    """(h, w, 3) unit view directions of the equirectangular grid;
    column 0.5w looks at the Front face (-z)."""
    import numpy as np
    oh, ow = out_size
    theta = (np.arange(ow) + 0.5) / ow * 2 * np.pi - np.pi
    phi = (0.5 - (np.arange(oh) + 0.5) / oh) * np.pi
    t, p = np.meshgrid(theta, phi)                  # (oh, ow)
    return np.stack([np.cos(p) * np.sin(t), np.sin(p),
                     -np.cos(p) * np.cos(t)], axis=-1)


@functools.lru_cache(maxsize=8)
def _cube_sampling_plan(face_hw: Tuple[int, int],
                        out_size: Tuple[int, int]):
    """Static gather plan for cubemap -> equirect: per output pixel the
    4 bilinear source indices into the flattened (6*Hf*Wf) face stack and
    their weights. Computed once per shape pair (numpy, trace-time)."""
    import numpy as np
    Hf, Wf = face_hw
    d = equirect_directions(out_size).reshape(-1, 3)        # (N, 3)
    best_dot = np.full(len(d), -np.inf)
    face = np.zeros(len(d), np.int64)
    u = np.zeros(len(d))
    v = np.zeros(len(d))
    for fi, (fwd, right, up) in enumerate(_CUBE_FACES):
        dot = d @ np.asarray(fwd)
        sel = dot > best_dot
        with np.errstate(divide="ignore", invalid="ignore"):
            uu = (d @ np.asarray(right)) / dot
            vv = -(d @ np.asarray(up)) / dot
        best_dot = np.where(sel, dot, best_dot)
        face = np.where(sel, fi, face)
        u = np.where(sel, uu, u)
        v = np.where(sel, vv, v)
    # face coords [-1,1] -> continuous pixel coords
    x = (u + 1.0) * 0.5 * Wf - 0.5
    y = (v + 1.0) * 0.5 * Hf - 0.5
    x0 = np.clip(np.floor(x), 0, Wf - 1).astype(np.int64)
    y0 = np.clip(np.floor(y), 0, Hf - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, Wf - 1)
    y1 = np.minimum(y0 + 1, Hf - 1)
    wx = np.clip(x - x0, 0.0, 1.0)
    wy = np.clip(y - y0, 0.0, 1.0)
    base = face * (Hf * Wf)
    idx = np.stack([base + y0 * Wf + x0, base + y0 * Wf + x1,
                    base + y1 * Wf + x0, base + y1 * Wf + x1])  # (4, N)
    w = np.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                  wy * (1 - wx), wy * wx]).astype(np.float32)   # (4, N)
    return idx, w


def cubemap_to_equirect(faces: jax.Array, out_size: Tuple[int, int]
                        ) -> jax.Array:
    """(..., 6, Hf, Wf, C) cubemap (face order Back, Down, Front, Left,
    Right, Up — habitat_extensions/obs_transformers.py:213-245) ->
    (..., h, w, C) equirectangular projection.

    TPU-native formulation: the reference builds per-pixel grids and
    runs grid_sample per frame on GPU; here the (face, bilinear-corner,
    weight) plan is precomputed once per shape (static), so the whole
    transform is 4 gathers + a weighted sum that jit/pjit fuses into the
    surrounding program. uint8 inputs round-trip uint8 (rgb); float
    passes through (depth)."""
    *lead, six, Hf, Wf, C = faces.shape
    assert six == 6, f"expected 6 cube faces, got {six}"
    oh, ow = out_size
    idx, w = _cube_sampling_plan((Hf, Wf), (oh, ow))
    idx = jnp.asarray(idx)
    w = jnp.asarray(w)
    flat = faces.reshape((-1, 6 * Hf * Wf, C))
    dtype = faces.dtype
    out = jnp.zeros((flat.shape[0], idx.shape[1], C), jnp.float32)
    for corner in range(4):
        out = out + w[corner][None, :, None] * jnp.take(
            flat, idx[corner], axis=1).astype(jnp.float32)
    if jnp.issubdtype(dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(dtype).reshape(tuple(lead) + (oh, ow, C))


def _cover(cur: Tuple[int, int], target: Tuple[int, int]) -> Tuple[int, int]:
    """Smallest proportional resize covering target (resize shorter side)."""
    ch, cw = cur
    th, tw = target
    scale = max(th / ch, tw / cw)
    return max(int(round(ch * scale)), th), max(int(round(cw * scale)), tw)
