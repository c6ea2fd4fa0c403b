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


def test_connectivity_unobstructed_indexes_raw_file_order(tmp_path):
    """MP3D unobstructed booleans index RAW file order (incl. excluded
    entries), like the reference common.py:87-94 — resolving them into a
    sorted/filtered id list scrambles the graph."""
    entries = [
        # file order: vpB, excluded, vpA — sorted order differs and the
        # excluded entry shifts raw indices
        {"image_id": "vpB", "included": True,
         "unobstructed": [False, True, True],
         "pose": _pose_at([1.0, 0, 0]), "height": 1.5},
        {"image_id": "excl", "included": False,
         "unobstructed": [True, False, True],
         "pose": _pose_at([9.0, 0, 9.0]), "height": 1.5},
        {"image_id": "vpA", "included": True,
         "unobstructed": [True, True, False],
         "pose": _pose_at([0.0, 0, 0]), "height": 1.5},
    ]
    (tmp_path / "scanX_connectivity.json").write_text(json.dumps(entries))
    conn = load_connectivity(str(tmp_path), "scanX")
    assert set(conn) == {"vpA", "vpB"}
    # vpB's raw row: [self, excluded, vpA] -> only vpA survives
    assert conn["vpB"]["neighbors"] == ["vpA"]
    assert conn["vpA"]["neighbors"] == ["vpB"]

    from etpnav_tpu.data.mp3d_pretrain import ScanGraph
    g = ScanGraph(str(tmp_path), "scanX")
    a, b = g.index["vpA"], g.index["vpB"]
    assert g.adj[a] == [b] and g.adj[b] == [a]
    np.testing.assert_allclose(g.dist[a, b], 1.0)
    assert g.hops[a, b] == 1


def _pose_at(p):
    pose = np.eye(4)
    pose[:3, 3] = p
    return pose.flatten().tolist()


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


def test_planner_frame_with_graph_edges():
    """planner_video_frame (utils.py:647-668 analogue) renders the topo
    graph — edges from TopoMap.edge_list — plus predicted ghost."""
    from etpnav_tpu.graph.topo_map import TopoMap
    from etpnav_tpu.utils.visualization import (TopDownRenderer,
                                                planner_video_frame)
    m = TopoMap()
    n0 = m.update(None, 0, np.zeros(3), np.array([0, 0, 0, 1.0]),
                  np.zeros(8), np.array([0.0, 1.57]),
                  np.array([1.5, 1.5]), np.zeros((2, 8)),
                  np.zeros((2,), np.int32), 0)
    n1 = m.update(n0, 1, np.array([1.5, 0, 0]), np.array([0, 0, 0, 1.0]),
                  np.zeros(8), np.array([0.0]), np.array([1.5]),
                  np.zeros((1, 8)), np.zeros((1,), np.int32), 1)
    edges = m.edge_list()
    assert (min(n0, n1), max(n0, n1)) in edges
    frame = planner_video_frame(
        {"rgb": np.zeros((12, 16, 16, 3), np.uint8)},
        renderer=TopDownRenderer(size=128, extent=5.0),
        agent_pos=[0, 0, 0], nodes=list(m.node_pos),
        edges=[(m.node_pos[u], m.node_pos[v]) for u, v in edges],
        predict_ghost=next(iter(m.ghosts.values())).aug_pos
        if m.ghosts else None,
        ghosts=[g.aug_pos for g in m.ghosts.values()])
    # top-down square (w x w) over a 64-high pano strip of 12 views
    w = 12 * 64
    assert frame.shape == (w + 64, w, 3)
