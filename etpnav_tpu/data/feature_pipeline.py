"""Offline panorama feature extraction: render poses -> TPU-batched
CLIP/depth encoding -> HDF5 feature store.

Capability target: precompute_img_features/ (SURVEY.md §2 row 34) —
save_img.py's MatterSim pose walk, extract_rgb_features.py's
multiprocess CLIP extraction (mp.Queue workers -> single h5py writer),
extract_depth_features.py — redesigned TPU-first: one process, one big
device batch per chunk of viewpoints (the MXU eats 36-view panoramas in
bulk; no GPU worker fan-out needed), async double-buffered host staging,
single h5py writer.

The MatterSim pose enumeration (save_img.py:15-80) is replaced by a pure
pose walker over connectivity JSONs (no C++ MatterSim dependency).
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

DISCRETE_VIEWS_36 = [(math.radians(h), math.radians(e))
                     for e in (-30, 0, 30) for h in range(0, 360, 30)]
DISCRETE_VIEWS_12 = [(math.radians(h), 0.0) for h in range(0, 360, 30)]


def load_connectivity(connectivity_dir: str, scan: str) -> Dict[str, dict]:
    """MP3D connectivity JSON -> viewpoint_id -> {position, neighbors...}
    (the pose source save_img.py walks via MatterSim).

    The JSON's ``unobstructed`` booleans index the RAW FILE ORDER of the
    scan's entries — including excluded ones (reference
    pretrain_src/data/common.py:87-94 indexes ``data[j]``). Because this
    loader drops excluded entries (and callers may re-sort keys), raw
    indices are resolved to image_ids here: ``neighbors`` lists the
    included image_ids reachable from each viewpoint. The raw
    ``unobstructed`` list is kept verbatim for completeness; never index
    it into a filtered/sorted id list."""
    path = os.path.join(connectivity_dir, f"{scan}_connectivity.json")
    with open(path) as f:
        data = json.load(f)
    raw_ids = [e["image_id"] for e in data]
    included = {e["image_id"] for e in data if e.get("included", True)}
    out = {}
    for entry in data:
        if entry["image_id"] not in included:
            continue
        unob = entry.get("unobstructed", [])
        neighbors = [raw_ids[j] for j, ok in enumerate(unob)
                     if ok and j < len(raw_ids)
                     and raw_ids[j] in included
                     and raw_ids[j] != entry["image_id"]]
        # 4x4 row-major habitat-style pose matrix; translation in col 3
        m = np.asarray(entry["pose"], np.float64).reshape(4, 4)
        out[entry["image_id"]] = {
            "position": m[:3, 3],
            "neighbors": neighbors,
            "unobstructed": unob,
            "height": entry.get("height", 1.5),
        }
    return out


def pose_walk(connectivity_dir: str, scan: str,
              num_views: int = 36) -> Iterable[Tuple[str, List[Tuple]]]:
    """Yield (viewpoint_id, [(heading, elevation), ...]) pose tuples for
    every included viewpoint (save_img.py:25-80 without MatterSim)."""
    views = DISCRETE_VIEWS_36 if num_views == 36 else DISCRETE_VIEWS_12
    conn = load_connectivity(connectivity_dir, scan)
    for vp_id in sorted(conn):
        yield vp_id, views


class FeatureExtractor:
    """Batched TPU feature extraction over rendered panoramas.

    class_proj: optional (num_classes, clip_output_dim) class text-
    embedding matrix. When given, zero-shot class logits
    (100 * norm(img) @ norm(class).T, the CLIP logit convention) are
    appended after the feature columns, producing the prob-augmented
    store layout the MRC pretraining task reads
    (pretrain_src data/dataset.py:210 soft labels =
    softmax(row[image_feat_size:]))."""

    def __init__(self, cfg, agent_params, batch_panos: int = 8,
                 class_proj=None):
        import jax
        import jax.numpy as jnp
        from etpnav_tpu.models import clip_vit, depth_resnet
        self.cfg = cfg
        self.params = agent_params
        self.batch_panos = batch_panos
        self.num_classes = 0 if class_proj is None else class_proj.shape[0]
        if class_proj is not None:
            class_proj = np.asarray(class_proj, np.float32)
            class_proj = class_proj / np.linalg.norm(
                class_proj, axis=-1, keepdims=True)
            class_proj = jnp.asarray(class_proj)

        def _extract(params, rgb, depth):
            B, V = rgb.shape[:2]
            rgb_f = clip_vit.encode_image(
                params.clip, cfg.clip,
                clip_vit.preprocess_rgb(rgb.reshape((B * V,)
                                                    + rgb.shape[2:])))
            if class_proj is not None:
                normed = rgb_f / jnp.linalg.norm(rgb_f, axis=-1,
                                                 keepdims=True)
                logits = 100.0 * normed @ class_proj.T
                rgb_f = jnp.concatenate([rgb_f, logits], axis=-1)
            dep_sp = depth_resnet.encode_depth(
                params.depth, cfg.depth,
                depth.reshape((B * V,) + depth.shape[2:]))
            s, c = dep_sp.shape[1], dep_sp.shape[-1]
            dep_f = dep_sp.reshape(B * V, s * s, c).mean(1)
            return (rgb_f.reshape(B, V, -1), dep_f.reshape(B, V, -1))

        self._fn = jax.jit(_extract)

    def __call__(self, rgb: np.ndarray, depth: np.ndarray):
        """rgb (B, V, H, W, 3) uint8, depth (B, V, h, w, 1) -> numpy
        (B, V, img_ft), (B, V, dep_ft)."""
        import jax.numpy as jnp
        r, d = self._fn(self.params, jnp.asarray(rgb), jnp.asarray(depth))
        return np.asarray(r), np.asarray(d)


def extract_scan_features(scan: str, render_fn: Callable,
                          extractor: FeatureExtractor,
                          img_out: str, dep_out: str,
                          connectivity_dir: Optional[str] = None,
                          viewpoints: Optional[List[str]] = None,
                          num_views: int = 12):
    """Render + encode + write one scan's viewpoints.

    render_fn(scan, vp_id, views) -> (rgb (V,H,W,3) uint8,
    depth (V,h,w,1) float). Output layout matches the reference HDF5
    stores: key '{scan}_{vp}' -> (V, feat) float32
    (extract_rgb_features.py:111-129).
    """
    import h5py

    if viewpoints is None:
        assert connectivity_dir is not None
        viewpoints = [vp for vp, _ in pose_walk(connectivity_dir, scan,
                                                num_views)]
    views = DISCRETE_VIEWS_36 if num_views == 36 else DISCRETE_VIEWS_12

    with h5py.File(img_out, "a") as f_img, h5py.File(dep_out, "a") as f_dep:
        bp = extractor.batch_panos
        for i in range(0, len(viewpoints), bp):
            chunk = viewpoints[i:i + bp]
            rgb = []
            dep = []
            for vp in chunk:
                r, d = render_fn(scan, vp, views)
                rgb.append(r)
                dep.append(d)
            # pad the final partial chunk to the extractor's batch size:
            # a smaller B would compile a second device program (~40 s on
            # TPU) per distinct remainder across the dataset
            while len(rgb) < bp:
                rgb.append(rgb[-1])
                dep.append(dep[-1])
            rgb_f, dep_f = extractor(np.stack(rgb), np.stack(dep))
            for j, vp in enumerate(chunk):
                key = f"{scan}_{vp}"
                for f, data in ((f_img, rgb_f[j]), (f_dep, dep_f[j])):
                    if key in f:
                        del f[key]
                    f.create_dataset(key, data=data.astype(np.float32))


class HDF5FeatureStore:
    """Reader for the reference's precomputed feature HDF5 layout
    (pretrain dataset.py:375-388: key '{scan}_{vp}' -> (views, feat)),
    with in-memory caching."""

    def __init__(self, path: str, in_memory: bool = True):
        self.path = path
        self.in_memory = in_memory
        self._cache: Dict[str, np.ndarray] = {}
        self._file = None

    def _f(self):
        import h5py
        if self._file is None:
            self._file = h5py.File(self.path, "r")
        return self._file

    def get(self, scan: str, viewpoint: str) -> np.ndarray:
        key = f"{scan}_{viewpoint}"
        if key in self._cache:
            return self._cache[key]
        arr = self._f()[key][...].astype(np.float32)
        if self.in_memory:
            self._cache[key] = arr
        return arr

    def keys(self) -> List[str]:
        return list(self._f().keys())

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None
