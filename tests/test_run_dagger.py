"""CLI integration for the legacy DAgger path: --trainer DAgger builds
the configured policy family with production frozen-encoder features /
waypoint-predictor candidates and trains (run.py; dagger_trainer.py
registration in the reference's baseline_registry)."""

import numpy as np
import pytest

from etpnav_tpu.run import run


def _write_cfg(tmp_path, extra=""):
    p = tmp_path / "exp.yaml"
    p.write_text("BASE: tiny\n" + extra)
    return str(p)


def test_cli_dagger_rec_vlnbert(tmp_path):
    cfg = _write_cfg(tmp_path)
    losses = run(["--exp-config", cfg, "--trainer", "DAgger",
                  "--num-envs", "2",
                  f"DAGGER.store_dir={tmp_path / 'store'}"])
    assert isinstance(losses, list) and len(losses) == 1
    assert np.isfinite(losses).all()


def test_cli_dagger_cma(tmp_path):
    cfg = _write_cfg(tmp_path)
    losses = run(["--exp-config", cfg, "--trainer", "DAgger",
                  "--num-envs", "2", "DAGGER.policy=cma",
                  f"DAGGER.store_dir={tmp_path / 'store_cma'}"])
    assert isinstance(losses, list) and len(losses) == 1
    assert np.isfinite(losses).all()


def test_cli_dagger_eval_rec_vlnbert(tmp_path):
    """--run-type eval drives the greedy legacy eval loop (forced stop
    at the step cap scores every episode)."""
    cfg = _write_cfg(tmp_path)
    stats = run(["--exp-config", cfg, "--trainer", "DAgger",
                 "--num-envs", "2", "--run-type", "eval",
                 "--episode-count", "2",
                 f"DAGGER.store_dir={tmp_path / 'store_ev'}"])
    assert stats and np.isfinite(stats["success"])
    assert "spl" in stats and "ndtw" in stats


def test_cli_dagger_cma_rejects_eval(tmp_path):
    cfg = _write_cfg(tmp_path)
    with pytest.raises(ValueError, match="rec_vlnbert"):
        run(["--exp-config", cfg, "--trainer", "DAgger", "--num-envs",
             "2", "--run-type", "eval", "DAGGER.policy=cma",
             f"DAGGER.store_dir={tmp_path / 'store2'}"])


def test_cli_dagger_rejects_inference(tmp_path):
    cfg = _write_cfg(tmp_path)
    with pytest.raises(ValueError, match="inference"):
        run(["--exp-config", cfg, "--trainer", "DAgger", "--num-envs",
             "2", "--run-type", "inference",
             f"DAGGER.store_dir={tmp_path / 'store3'}"])
