"""THE core invariant of rollout-replay training: the fused learn-phase
replay (deterministic mode) must reproduce the rollout-time navigation
logits exactly — same params, same recorded features, batched (B*T)
instead of per-step. Bucketed variants (IL.train_traj_buckets /
train_gmap_buckets) must preserve this at every sliced shape."""

import dataclasses

import jax
import numpy as np

from etpnav_tpu.config import r2r_config, tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.training.finetune import FinetuneTrainer, bucket_record, \
    record_to_batch, replay_logits


def _assert_replay_matches(cfg, seed, atol, expect_sliced=False):
    envs = GeometricNavEnv(
        num_envs=2, seed=seed, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    tr = FinetuneTrainer(cfg, envs, seed=0)
    rec_full = tr.engine.run("train", sample_ratio=1.0)

    rec = bucket_record(rec_full, cfg.il)
    if expect_sliced:
        assert (rec.step_valid.shape[1] < rec_full.step_valid.shape[1]
                or rec.gmap_mask.shape[2] < rec_full.gmap_mask.shape[2]), (
            rec.step_valid.shape, rec.gmap_mask.shape)
    # slicing must never cut live data
    assert rec.step_valid.sum() == rec_full.step_valid.sum()
    np.testing.assert_array_equal(
        rec.gmap_mask.sum(-1), rec_full.gmap_mask.sum(-1)
        [:, :rec.gmap_mask.shape[1]])

    batch = record_to_batch(rec)
    logits = np.asarray(replay_logits(tr.params.planner, cfg, batch,
                                      rng=None, train=False))
    valid = rec.step_valid
    assert valid.any()
    worst = 0.0
    for b in range(valid.shape[0]):
        for t in range(valid.shape[1]):
            if not valid[b, t]:
                continue
            mask = rec.gmap_mask[b, t]
            got = logits[b, t][mask]
            want = rec.logits[b, t][mask]
            # -inf slots (visited) must agree in position
            np.testing.assert_array_equal(np.isneginf(got),
                                          np.isneginf(want))
            finite = np.isfinite(want)
            np.testing.assert_allclose(got[finite], want[finite],
                                       atol=atol)
            if finite.any():
                worst = max(worst, np.abs(got[finite]
                                          - want[finite]).max())
    return worst


def test_replay_reproduces_rollout_logits():
    _assert_replay_matches(tiny_config(), seed=11, atol=2e-4)


def test_replay_reproduces_rollout_logits_bucketed():
    """T/G-bucketed replay (VERDICT r3 #2): slicing the record to demand
    buckets is exact — the sliced replay still reproduces the rollout
    logits (which were scored at the full max_gmap_len).

    G-slicing is guaranteed here by the demand bound (T=4 steps x K=5
    candidates -> at most 1+4+20=25 slots < the 48 cap); T-slicing is
    forced by invalidating the last step (whole-row padding semantics),
    which is exactly what early-finishing intervals look like."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        planner=dataclasses.replace(cfg.planner, max_gmap_len=48),
        il=dataclasses.replace(cfg.il, train_traj_buckets=(2, 3, 4),
                               train_gmap_buckets=(8, 16, 24, 32, 48)))
    envs = GeometricNavEnv(
        num_envs=2, seed=11, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    tr = FinetuneTrainer(cfg, envs, seed=0)
    rec_full = tr.engine.run("train", sample_ratio=1.0)
    # force T demand of 3 (early-finished interval)
    sv = rec_full.step_valid.copy()
    te = rec_full.teacher.copy()
    sv[:, 3:] = False
    te[:, 3:] = -100
    rec_full = dataclasses.replace(rec_full, step_valid=sv, teacher=te)

    rec = bucket_record(rec_full, cfg.il)
    assert rec.step_valid.shape[1] == 3
    assert rec.gmap_mask.shape[2] < 48
    assert rec.gmap_mask.shape[2] >= int(rec_full.gmap_mask.sum(-1).max())

    batch = record_to_batch(rec)
    logits = np.asarray(replay_logits(tr.params.planner, cfg, batch,
                                      rng=None, train=False))
    checked = 0
    for b in range(rec.step_valid.shape[0]):
        for t in range(rec.step_valid.shape[1]):
            if not rec.step_valid[b, t]:
                continue
            mask = rec.gmap_mask[b, t]
            got = logits[b, t][mask]
            want = rec.logits[b, t][mask]
            np.testing.assert_array_equal(np.isneginf(got),
                                          np.isneginf(want))
            finite = np.isfinite(want)
            np.testing.assert_allclose(got[finite], want[finite],
                                       atol=2e-4)
            checked += 1
    assert checked >= 4


def test_replay_reproduces_rollout_logits_full_size():
    """Full-size r2r config (hidden 768, 9/2/4 layers, G=96 emission with
    learn-phase G-bucket slicing, L=80, bf16 scanned stacks — the dims
    where the production numerics actually engage), trajectory shortened
    to keep CPU runtime bounded. bf16 activations round differently
    between the rollout's per-step batch and the replay's (B*T)-batch,
    hence the looser tolerance vs the fp32 tiny variant (logit scale here
    is ~1e1)."""
    cfg = r2r_config()
    cfg = dataclasses.replace(
        cfg, il=dataclasses.replace(cfg.il, max_traj_len=5))
    _assert_replay_matches(cfg, seed=7, atol=5e-2, expect_sliced=True)


def test_bucketed_train_step_runs():
    """FinetuneTrainer.train with bucketing enabled: the sliced batch
    compiles and the loss is finite."""
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, il=dataclasses.replace(
        cfg.il, train_traj_buckets=(2, 3, 4),
        train_gmap_buckets=(8, 12, 16)))
    envs = GeometricNavEnv(
        num_envs=2, seed=3, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    tr = FinetuneTrainer(cfg, envs, seed=0)
    logs = tr.train(iters=2)
    assert np.isfinite(logs["IL_loss"])


def test_remat_nav_forward_bit_identical():
    """PlannerConfig.remat_scan (per-layer jax.checkpoint on the x-layer
    scan, enabled by IL.remat_nav for big replay buckets) must not change
    forward values: remat only alters what backward saves. Pin bitwise
    equality of replay logits with it forced on vs off."""
    from etpnav_tpu.training.finetune import (bucket_record,
                                              record_to_batch,
                                              replay_logits)
    cfg = tiny_config()
    envs = GeometricNavEnv(
        num_envs=2, seed=11, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    tr = FinetuneTrainer(cfg, envs, seed=0)
    rec = tr.engine.run("train", sample_ratio=1.0)
    batch = record_to_batch(bucket_record(rec, cfg.il))

    def with_remat(on):
        c = dataclasses.replace(cfg, planner=dataclasses.replace(
            cfg.planner, remat_scan=on))
        return jax.jit(lambda pp, b: replay_logits(pp, c, b, train=False)
                       )(tr.params.planner, batch)

    np.testing.assert_array_equal(np.asarray(with_remat(False)),
                                  np.asarray(with_remat(True)))
