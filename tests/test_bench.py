"""bench.py: FLOP-model baselines and the dp-sharded measurement path.

The sharded path is how the >=5x north star gets measured the day real
multi-chip hardware appears (VERDICT r1 Next #6) — exercise it on the
virtual 8-device CPU mesh so it cannot rot.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

from etpnav_tpu.config import r2r_config, tiny_config  # noqa: E402
from etpnav_tpu.training import agent as agent_lib  # noqa: E402


def test_flop_model_baselines_auditable():
    cfg = r2r_config()
    # CLIP dominates: 12 views x ~8.8 GF + depth + TRM ~= 114 GF/pano
    assert 100e9 < bench.flops_per_pano(cfg) < 130e9
    # the derived baseline lands near the round-1 hand estimate (1000)
    assert 850 < bench.perception_baseline(cfg) < 1100
    # nav program ~5 GF/step at eval shapes
    assert 3e9 < bench.flops_per_nav_step(cfg) < 8e9
    assert 3000 < bench.planner_baseline(cfg) < 12000


def test_measure_single_device_cpu():
    cfg = tiny_config()
    params = agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg)
    panos = bench.measure_perception(cfg, params, batch_per_device=2,
                                     iters=2, devices=jax.devices()[:1])
    steps = bench.measure_planner(cfg, params, batch_per_device=2,
                                  iters=2, devices=jax.devices()[:1])
    assert np.isfinite(panos) and panos > 0
    assert np.isfinite(steps) and steps > 0


def test_measure_sharded_8dev_cpu_mesh():
    cfg = tiny_config()
    params = agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg)
    devs = jax.devices()
    assert len(devs) == 8, "conftest forces the virtual 8-device mesh"
    panos = bench.measure_perception(cfg, params, batch_per_device=1,
                                     iters=2, devices=devs)
    steps = bench.measure_planner(cfg, params, batch_per_device=1,
                                  iters=2, devices=devs)
    assert np.isfinite(panos) and panos > 0
    assert np.isfinite(steps) and steps > 0


def test_train_metrics_cpu():
    """The training-path bench sections must run on the CPU backend:
    learn-step timing at tiny shapes and one rollout+learn iteration."""
    cfg = tiny_config()
    ms = bench.measure_learn_step(cfg, batch=2, chain=2, repeats=1)
    assert np.isfinite(ms) and ms > 0
    assert 0 < bench.flops_per_trained_step(r2r_config()) < 5e10
    assert bench.train_baseline(r2r_config()) > 0
    sec, phases = bench.measure_train_iteration(cfg, num_envs=2, iters=1)
    assert np.isfinite(sec) and sec > 0
    assert "rollout" in phases and "learn" in phases
    # per-bucket learn-step shapes (G/T overrides)
    ms_b = bench.measure_learn_step(cfg, batch=2, chain=2, repeats=1,
                                    gmap_len=12, traj_len=3)
    assert np.isfinite(ms_b) and ms_b > 0
    # device-resident observation ring (RolloutEngine.device_obs)
    sec_d, phases_d = bench.measure_train_iteration(
        cfg, num_envs=2, iters=1, device_obs=True)
    assert np.isfinite(sec_d) and sec_d > 0
    assert "rollout" in phases_d


def test_pretrain_step_metric_cpu():
    import dataclasses

    import bench
    from etpnav_tpu.config import tiny_config
    from etpnav_tpu.data.pretrain_data import PretrainShapes

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        planner=dataclasses.replace(cfg.planner, max_txt_len=16,
                                    image_feat_size=32,
                                    depth_feat_size=16),
        pretrain=dataclasses.replace(cfg.pretrain, batch_size=2,
                                     warmup_steps=2, num_train_steps=10))
    shapes = PretrainShapes(
        max_txt_len=16, max_traj_steps=3, num_views=12, max_cands=4,
        max_gmap_len=16, image_feat_size=32, depth_feat_size=16,
        vocab_size=512, mask_token_id=3, mask_vocab_range=(10, 500))
    for task in ("mlm", "sap"):
        ms = bench.measure_pretrain_step(cfg, shapes, task, batch_size=2,
                                         chain=2, repeats=1)
        assert np.isfinite(ms) and ms > 0
        assert bench.flops_per_pretrain_example(cfg, shapes, task) > 0


def test_v5e8_projection_labeling():
    """The single-chip record carries an explicitly-labeled PROJECTION;
    real multi-device runs carry none (they measure the aggregate)."""
    p = bench.v5e8_projection(1000.0, 1)
    assert p["projected_v5e8_panos_per_sec"] == 8000.0
    assert "PROJECTION (not measured)" in p["projection_note"]
    assert bench.v5e8_projection(1000.0, 8) == {}
    # the floor argument ships inside the artifact (VERDICT r4 weak #2)
    assert bench.PERCEPTION_FLOOR["gn_stats_ms_of_pipeline"] == [0.68, 14.3]
    assert "floor" in bench.PERCEPTION_FLOOR["note"]


def test_load_convergence_summary(tmp_path):
    import json

    import bench
    assert bench.load_convergence_summary(str(tmp_path / "nope.json")) == {}
    p = tmp_path / "CONVERGENCE.json"
    p.write_text(json.dumps({"summary": {"sr_final": 0.4, "iters": 400}}))
    out = bench.load_convergence_summary(str(p))
    assert out == {"convergence": {"sr_final": 0.4, "iters": 400}}
