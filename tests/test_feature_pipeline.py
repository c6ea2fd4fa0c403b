"""Offline feature pipeline: pose walk, batched extraction, HDF5 layout."""

import json
import os

import jax
import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.data.feature_pipeline import (
    FeatureExtractor,
    HDF5FeatureStore,
    extract_scan_features,
    load_connectivity,
    pose_walk,
)
from etpnav_tpu.training.agent import init_agent_params


def _write_connectivity(tmp_path, scan="scanA", n=3):
    entries = []
    for i in range(n):
        pose = np.eye(4)
        pose[:3, 3] = [i, 0, -i]
        entries.append({
            "image_id": f"vp{i}", "pose": pose.flatten().tolist(),
            "included": True, "unobstructed": [True] * n, "height": 1.5})
    entries.append({"image_id": "excluded", "included": False,
                    "pose": np.eye(4).flatten().tolist()})
    p = tmp_path / f"{scan}_connectivity.json"
    p.write_text(json.dumps(entries))
    return str(tmp_path)


def test_pose_walk(tmp_path):
    cdir = _write_connectivity(tmp_path)
    conn = load_connectivity(cdir, "scanA")
    assert set(conn) == {"vp0", "vp1", "vp2"}
    np.testing.assert_allclose(conn["vp1"]["position"], [1, 0, -1])
    walks = list(pose_walk(cdir, "scanA", num_views=12))
    assert len(walks) == 3 and len(walks[0][1]) == 12


def test_extract_and_read_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_agent_params(jax.random.PRNGKey(0), cfg)
    extractor = FeatureExtractor(cfg, params, batch_panos=2)
    cdir = _write_connectivity(tmp_path)

    def render_fn(scan, vp, views):
        g = np.random.default_rng(hash((scan, vp)) % (2**31))
        rgb = g.integers(0, 256, (len(views), cfg.clip.image_size,
                                  cfg.clip.image_size, 3)).astype(np.uint8)
        dep = g.random((len(views), cfg.depth.input_size,
                        cfg.depth.input_size, 1)).astype(np.float32)
        return rgb, dep

    img_out = str(tmp_path / "img.h5")
    dep_out = str(tmp_path / "dep.h5")
    extract_scan_features("scanA", render_fn, extractor, img_out, dep_out,
                          connectivity_dir=cdir, num_views=12)

    store = HDF5FeatureStore(img_out)
    keys = store.keys()
    assert sorted(keys) == ["scanA_vp0", "scanA_vp1", "scanA_vp2"]
    feats = store.get("scanA", "vp1")
    assert feats.shape == (12, cfg.clip.output_dim)
    assert np.isfinite(feats).all()
    dstore = HDF5FeatureStore(dep_out)
    dfeats = dstore.get("scanA", "vp1")
    assert dfeats.shape == (12, 16)   # compression channels of tiny depth
    store.close()
    dstore.close()


def test_visualization(tmp_path):
    from etpnav_tpu.utils.visualization import (
        TopDownRenderer, generate_video, navigator_video_frame)
    r = TopDownRenderer(size=128, extent=5.0)
    frame = r.render(agent_pos=[0, 0, 0], gt_path=[[0, 0, 0], [1, 0, -2]],
                     nodes=[[0, 0, 0]], ghosts=[[1, 0, -1]],
                     goal=[2, 0, -3])
    assert frame.shape == (128, 128, 3)
    obs = {"rgb": np.zeros((12, 16, 16, 3), np.uint8)}
    nav = navigator_video_frame(obs, renderer=r, agent_pos=[0, 0, 0])
    assert nav.shape[1] == 12 * 128
    path = generate_video([nav, nav], str(tmp_path / "vid"), "7",
                          {"spl": 0.5})
    assert os.path.exists(path)
