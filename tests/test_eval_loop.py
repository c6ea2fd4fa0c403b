"""Elastic eval loop + requeue resume + metrics formulas."""

import json
import os

import numpy as np
import pytest

from etpnav_tpu.metrics import dtw, episode_metrics, ndtw
from etpnav_tpu.training.checkpoints import latest_checkpoint
from etpnav_tpu.training.eval_loop import (
    checkpoint_index,
    eval_checkpoint_loop,
    poll_checkpoint_folder,
)


def test_ndtw_formula():
    gt = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], float)
    assert ndtw(gt, gt) == pytest.approx(1.0)
    pred = gt + np.array([0, 0, 1.0])
    expect = np.exp(-dtw(pred, gt) / (len(gt) * 3.0))
    assert ndtw(pred, gt) == pytest.approx(expect)


def test_episode_metrics_reference_semantics():
    pred = np.array([[0, 0, 0], [2, 0, 0], [4, 0, 0]], float)
    dists = np.array([6.0, 4.0, 2.0])
    gt = np.array([[0, 0, 0], [3, 0, 0], [6, 0, 0]], float)
    m = episode_metrics(pred, dists, gt, steps_taken=10, collision_count=1)
    assert m["success"] == 1.0           # final dist 2 <= 3
    assert m["oracle_success"] == 1.0
    assert m["path_length"] == pytest.approx(4.0)
    # spl = success * gt_len / max(gt_len, path_len); gt_len = dists[0]
    assert m["spl"] == pytest.approx(6.0 / max(6.0, 4.0))
    assert m["collisions"] == pytest.approx(1 / 3)


def test_poll_and_latest(tmp_path):
    for i in (100, 300, 200):
        (tmp_path / f"ckpt_iter{i}").mkdir()
    assert checkpoint_index(str(tmp_path / "ckpt_iter300")) == 300
    assert poll_checkpoint_folder(str(tmp_path), set()).endswith("iter100")
    seen = {str(tmp_path / "ckpt_iter100")}
    assert poll_checkpoint_folder(str(tmp_path), seen).endswith("iter200")
    assert latest_checkpoint(str(tmp_path)).endswith("iter300")


class _FakeTrainer:
    def __init__(self):
        self.loaded = []

    def load_checkpoint(self, p):
        self.loaded.append(p)

    def evaluate(self, n, gt_paths=None):
        return {"spl": 0.5, "success": 0.6}


def test_eval_checkpoint_loop_with_skip_guard(tmp_path):
    ckpts = tmp_path / "ck"
    results = tmp_path / "res"
    ckpts.mkdir()
    for i in (10, 20):
        (ckpts / f"ckpt_iter{i}").mkdir()
    # pre-existing result for iter10 -> skip-if-evaluated
    results.mkdir()
    (results / "stats_ckpt_10_val_unseen.json").write_text(
        json.dumps({"spl": 0.9}))
    tr = _FakeTrainer()
    out = eval_checkpoint_loop(tr, str(ckpts), str(results),
                               episode_count=2)
    assert len(out) == 2
    assert tr.loaded == [str(ckpts / "ckpt_iter20")]   # iter10 skipped
    assert out[str(ckpts / "ckpt_iter10")]["spl"] == 0.9
    assert os.path.exists(results / "stats_ckpt_20_val_unseen.json")


def test_trajectory_utils():
    from etpnav_tpu.utils.trajectory import (camera_orientations_12,
                                             densify_path,
                                             unique_consecutive)
    path = np.array([[0, 0, 0], [1, 0, 0]], float)
    dense = densify_path(path, 0.25)
    assert len(dense) >= 5
    seg = np.linalg.norm(np.diff(dense, axis=0), axis=1)
    assert (seg <= 0.25 + 1e-9).all()
    rig = camera_orientations_12()
    assert len(rig) == 12 and rig[""][1] == 0.0
    assert unique_consecutive([[0, 0], [0, 0], [1, 1]]) == [[0, 0], [1, 1]]
