"""THE core invariant of rollout-replay training: the fused learn-phase
replay (deterministic mode) must reproduce the rollout-time navigation
logits exactly — same params, same recorded features, batched (B*T)
instead of per-step."""

import dataclasses

import jax
import numpy as np

from etpnav_tpu.config import r2r_config, tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.training.finetune import FinetuneTrainer, record_to_batch, \
    replay_logits


def _assert_replay_matches(cfg, seed, atol):
    envs = GeometricNavEnv(
        num_envs=2, seed=seed, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    tr = FinetuneTrainer(cfg, envs, seed=0)
    rec = tr.engine.run("train", sample_ratio=1.0)

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


def test_replay_reproduces_rollout_logits_full_size():
    """Full-size r2r config (hidden 768, 9/2/4 layers, G=64, L=80, bf16
    scanned stacks — the dims where the production numerics actually
    engage), trajectory shortened to keep CPU runtime bounded. bf16
    activations round differently between the rollout's per-step batch
    and the replay's (B*T)-batch, hence the looser tolerance vs the fp32
    tiny variant (logit scale here is ~1e1)."""
    cfg = r2r_config()
    cfg = dataclasses.replace(
        cfg, il=dataclasses.replace(cfg.il, max_traj_len=5))
    _assert_replay_matches(cfg, seed=7, atol=5e-2)
