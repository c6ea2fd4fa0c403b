"""Failure handling: requeue resume, remat learn step, worker crash
surfacing, converter CLI."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.training.checkpoints import latest_checkpoint
from etpnav_tpu.training.finetune import FinetuneTrainer


def _envs(cfg, seed=0):
    return GeometricNavEnv(
        num_envs=2, seed=seed, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)


def test_requeue_resume(tmp_path):
    """is_requeue semantics (ss_trainer_ETP.py:216-236): newest ckpt by
    iter restores params + optimizer + iteration; training continues."""
    cfg = tiny_config()
    tr = FinetuneTrainer(cfg, _envs(cfg), seed=0)
    tr.train(iters=1)
    tr.save_checkpoint(str(tmp_path / "ckpt_iter1"))
    tr.train(iters=1)
    tr.save_checkpoint(str(tmp_path / "ckpt_iter2"))

    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("iter2")
    tr2 = FinetuneTrainer(cfg, _envs(cfg, seed=9), seed=5)
    tr2.load_checkpoint(latest)
    assert tr2.iteration == 2
    np.testing.assert_array_equal(
        np.asarray(tr.params.planner["global_sap_head"]["dense2"]["w"]),
        np.asarray(tr2.params.planner["global_sap_head"]["dense2"]["w"]))
    logs = tr2.train(iters=1)
    assert np.isfinite(logs["IL_loss"]) and tr2.iteration == 3
    # the trainer-level wrapper finds the same checkpoint
    tr3 = FinetuneTrainer(cfg, _envs(cfg, seed=11), seed=6,
                          ckpt_dir=str(tmp_path))
    assert tr3.resume_latest()
    assert tr3.iteration == 2
    # and periodic saving during train writes iterN checkpoints
    tr3.train(iters=2, save_every=1)
    assert latest_checkpoint(str(tmp_path)).endswith("iter4")


def test_remat_learn_step_matches_memoryful():
    cfg = tiny_config()
    cfg_remat = dataclasses.replace(
        cfg, il=dataclasses.replace(cfg.il, remat=True))
    tr1 = FinetuneTrainer(cfg, _envs(cfg), seed=0)
    rec = tr1.engine.run("train", sample_ratio=1.0)
    from etpnav_tpu.training.finetune import compute_il_loss, \
        record_to_batch
    batch = record_to_batch(rec)
    rng = jax.random.PRNGKey(7)
    l1 = compute_il_loss(tr1.params.planner, cfg, batch, rng)
    l2 = compute_il_loss(tr1.params.planner, cfg_remat, batch, rng)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(compute_il_loss)(tr1.params.planner, cfg, batch, rng)
    g2 = jax.grad(compute_il_loss)(tr1.params.planner, cfg_remat, batch,
                                   rng)
    a = jax.tree_util.tree_leaves(g1)[0]
    b = jax.tree_util.tree_leaves(g2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_worker_crash_surfaces():
    from etpnav_tpu.env.vector import ProcessVectorEnv, GeometricEnvFactory
    envs = ProcessVectorEnv([GeometricEnvFactory(0, dict(
        vocab_size=64, max_instr_len=8, image_size=16, depth_size=16))])
    try:
        envs.reset()
        with pytest.raises(RuntimeError, match="worker 0"):
            envs._call_workers([0], "nonexistent_method")
    finally:
        envs.close()


def test_convert_cli_roundtrip(tmp_path):
    """End-to-end: torch-save a reference-layout waypoint ckpt, convert via
    the CLI, restore, run the predictor."""
    import sys
    import torch
    sys.path.insert(0, "tests")
    import jax.numpy as jnp
    from etpnav_tpu import convert_cli
    from etpnav_tpu.config import WaypointConfig
    from etpnav_tpu.models import waypoint

    cfg = WaypointConfig(hidden_size=32, num_heads=4, num_layers=1,
                         depth_feat_shape=(8, 2, 2))
    g = np.random.default_rng(0)
    sd = {}

    def lin(key, din, dout):
        sd[f"{key}.weight"] = torch.from_numpy(
            g.standard_normal((dout, din)).astype(np.float32))
        sd[f"{key}.bias"] = torch.from_numpy(
            g.standard_normal(dout).astype(np.float32))

    def ln(key, d):
        sd[f"{key}.weight"] = torch.ones(d)
        sd[f"{key}.bias"] = torch.zeros(d)

    D = cfg.hidden_size
    lin("predictor.visual_fc_depth.1", 32, D)
    b = "predictor.waypoint_TRM.bert.encoder.layer.0"
    for qkv in ("query", "key", "value"):
        lin(f"{b}.attention.self.{qkv}", D, D)
    lin(f"{b}.attention.output.dense", D, D)
    ln(f"{b}.attention.output.LayerNorm", D)
    lin(f"{b}.intermediate.dense", D, 4 * D)
    lin(f"{b}.output.dense", 4 * D, D)
    ln(f"{b}.output.LayerNorm", D)
    lin("predictor.vis_classifier.0", D, D)
    lin("predictor.vis_classifier.2", D, 120)
    path = tmp_path / "wp.pth"
    torch.save({"predictor": sd}, str(path))

    from etpnav_tpu.models.convert import convert_waypoint
    params = convert_waypoint(
        convert_cli.load_torch_state_dict(str(path), "waypoint"),
        num_layers=1)
    feats = jnp.asarray(g.standard_normal((2, 12, 8, 2, 2)), jnp.float32)
    hm = waypoint.waypoint_heatmap(params, cfg, feats)
    assert hm.shape == (2, 120, 12)
    assert np.isfinite(np.asarray(hm)).all()


def test_eval_survives_worker_crash_midrollout():
    """A worker dying at step time mid-eval is recovered: the episode is
    dropped from stats and evaluate() completes with metrics from the
    surviving episodes (env/vector.py elastic recovery + rollout.py
    crashed-episode guard)."""
    from etpnav_tpu.config import tiny_config
    from etpnav_tpu.env.vector import construct_geometric_envs
    from etpnav_tpu.training.finetune import FinetuneTrainer

    cfg = tiny_config()
    envs = construct_geometric_envs(
        2, workers=True, seed=3, restart_on_crash=True,
        vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len,
        image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size,
        pad_id=cfg.planner.pad_token_id)

    class CrashOnFirstStep:
        """Kills worker 0 right before the first env step (the point
        where habitat-sim segfaults happen in practice)."""

        def __init__(self, inner):
            self._inner = inner
            self._armed = True

        def step(self, actions):
            if self._armed:
                self._armed = False
                self._inner.inject_worker_crash(0)
            return self._inner.step(actions)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    trainer = FinetuneTrainer(cfg, CrashOnFirstStep(envs), seed=0)
    try:
        stats = trainer.evaluate(episode_count=2)
        # the crashed episode was dropped but the guard loop re-rolled:
        # full metric set over >= 2 surviving episodes
        for key in ("success", "spl", "ndtw"):
            assert np.isfinite(stats[key])
    finally:
        envs.close()


def test_checkpoint_rng_impl_migration(tmp_path):
    """A checkpoint saved under one ILConfig.rng_impl restores into a
    trainer template built with another: _rekey infers the impl from the
    stored key data's width (threefry (2,) vs rbg (4,)) instead of
    failing in wrap_key_data (ADVICE r3). The restored key keeps its
    original stream; training continues."""
    from etpnav_tpu.training.checkpoints import (load_checkpoint,
                                                 save_checkpoint)
    for saved_impl, template_impl in [("threefry2x32", "rbg"),
                                      ("rbg", "threefry2x32")]:
        state = {"step": np.int64(7),
                 "rng": jax.random.key(3, impl=saved_impl)}
        path = str(tmp_path / f"ckpt_{saved_impl}")
        save_checkpoint(path, state)
        template = {"step": np.int64(0),
                    "rng": jax.random.key(0, impl=template_impl)}
        restored = load_checkpoint(path, template)
        assert int(restored["step"]) == 7
        # stream preserved under the original impl
        np.testing.assert_array_equal(
            jax.random.key_data(restored["rng"]),
            jax.random.key_data(state["rng"]))
        # and the restored key is usable (fold_in + draw)
        sub = jax.random.fold_in(restored["rng"], 1)
        assert np.isfinite(np.asarray(jax.random.uniform(sub, (3,)))).all()


def test_dagger_rng_impl_plumbed():
    """DaggerConfig.rng_impl steers the RecVLNBertDagger update key
    (ADVICE r3: the threefry escape hatch applies to DAgger too)."""
    from etpnav_tpu.training.dagger import DaggerConfig
    assert DaggerConfig().rng_impl == "rbg"
    assert DaggerConfig(rng_impl="threefry2x32").rng_impl == "threefry2x32"
