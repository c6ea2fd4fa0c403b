"""Geometry helpers for the topological map.

Numpy replacements for the reference's quaternion/angle helpers
(models/graph_utils.py:13-71) without the habitat dependency. Semantics are
replicated exactly, including the reference's convention of computing
"elevation" from the z-delta (graph_utils.py:41) — kept for checkpoint/logit
parity.
"""

from __future__ import annotations

import numpy as np


def position_distance(a, b) -> float:
    return float(np.linalg.norm(np.asarray(b, np.float64)
                                - np.asarray(a, np.float64)))


def quat_rotate_vector(quat_xyzw: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate v by the quaternion (x, y, z, w coeff order)."""
    x, y, z, w = quat_xyzw
    q = np.array([x, y, z], np.float64)
    v = np.asarray(v, np.float64)
    t = 2.0 * np.cross(q, v)
    return v + w * t + np.cross(q, t)


def heading_from_quaternion(quat_xyzw) -> float:
    """Agent heading angle from an (x,y,z,w) orientation quaternion
    (graph_utils.py:54-59): rotate [0,0,-1] by the inverse quaternion and
    take atan2(x, -z), wrapped to [0, 2pi)."""
    x, y, z, w = np.asarray(quat_xyzw, np.float64)
    inv = np.array([-x, -y, -z, w])
    hv = quat_rotate_vector(inv, np.array([0.0, 0.0, -1.0]))
    phi = np.arctan2(hv[0], -hv[2])
    return float(phi % (2.0 * np.pi))


def rel_pos_features(a, b, base_heading: float = 0.0,
                     base_elevation: float = 0.0, to_clock: bool = False):
    """(heading, elevation, dist) of b relative to a
    (graph_utils.py:21-44). Habitat frame: y up, -z forward, -x left."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    dx, dy, dz = b - a
    xz_dist = max(np.sqrt(dx * dx + dz * dz), 1e-8)
    xyz_dist = max(np.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
    heading = np.arcsin(-dx / xz_dist)
    if b[2] > a[2]:
        heading = np.pi - heading
    heading -= base_heading
    if to_clock:
        heading = 2.0 * np.pi - heading
    # note: reference derives elevation from dz, not dy (graph_utils.py:41)
    elevation = np.arcsin(dz / xyz_dist) - base_elevation
    return float(heading), float(elevation), float(xyz_dist)


def angle_features(headings: np.ndarray, elevations: np.ndarray,
                   angle_feat_size: int = 4) -> np.ndarray:
    """[sin h, cos h, sin e, cos e] tiled to angle_feat_size
    (graph_utils.py:46-52)."""
    f = np.stack([np.sin(headings), np.cos(headings),
                  np.sin(elevations), np.cos(elevations)], -1)
    reps = angle_feat_size // 4
    if reps > 1:
        f = np.concatenate([f] * reps, -1)
    return f.astype(np.float32)


def estimate_candidate_positions(pos, ori_xyzw, angles_ccw, distances
                                 ) -> np.ndarray:
    """Project candidate waypoints into world coordinates
    (graph_utils.py:61-71)."""
    ang = (heading_from_quaternion(ori_xyzw)
           + np.asarray(angles_ccw, np.float64)) % (2.0 * np.pi)
    dis = np.asarray(distances, np.float64)
    out = np.zeros((len(ang), 3))
    out[:, 0] = pos[0] - dis * np.sin(ang)
    out[:, 1] = pos[1]
    out[:, 2] = pos[2] - dis * np.cos(ang)
    return out
