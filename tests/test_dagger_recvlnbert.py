"""Candidate-space DAgger driving the recurrent VLN-BERT policy on the
geometric env: oracle candidate teacher, collection, supervised update
(dagger_trainer.py:187-629 candidate path; SURVEY.md §2 rows 23-24)."""

import math

import numpy as np
import pytest

from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.models.rec_vlnbert import RecVLNBertConfig
from etpnav_tpu.training.dagger import DaggerConfig, RecVLNBertDagger

CFG = RecVLNBertConfig(
    vocab_size=512, hidden=48, heads=4, intermediate=64, la_layers=2,
    vl_layers=2, max_pos=32, rgb_dim=8, depth_dim=4, angle_dim=4,
    max_cands=4, hidden_dropout=0.0, attn_dropout=0.0)

ANGLES = np.array([0.0, math.pi / 2, 3 * math.pi / 2])  # fwd, left, right


def _candidate_fn(obs):
    """Cheap waypoint-predictor stand-in: 3 fixed headings at 1 m, with
    pooled-pixel features made angle-dependent."""
    B = len(obs)
    rgb_pool = np.stack([o["rgb"][0].mean((0, 1)) for o in obs])
    dep_pool = np.stack([o["depth"][0].mean((0, 1)) for o in obs])
    K = len(ANGLES)
    rgb = np.tile(rgb_pool[:, None], (1, K, 3))[:, :, :8].astype(np.float32)
    dep = np.tile(dep_pool[:, None], (1, K, 4))[:, :, :4].astype(np.float32)
    ang = np.stack([np.stack([np.sin(ANGLES), np.cos(ANGLES),
                              np.zeros(K), np.ones(K)], -1)] * B)
    rgb += ang[:, :, :1]                      # differentiate slots
    return {
        "rgb": rgb, "depth": dep, "ang": ang.astype(np.float32),
        "angles": np.tile(ANGLES, (B, 1)),
        "dists": np.full((B, K), 1.0),
        "mask": np.ones((B, K), bool),
    }


@pytest.fixture
def envs():
    return GeometricNavEnv(num_envs=2, seed=3, vocab_size=CFG.vocab_size,
                           max_instr_len=12, image_size=16, depth_size=16)


def test_oracle_teacher_stops_at_goal(envs):
    trainer = RecVLNBertDagger(envs, CFG, DaggerConfig(max_steps=4),
                               _candidate_fn, "/tmp/_unused_store_rvb",
                               seed=0)
    envs.resume_all()
    obs = envs.reset()
    cand = _candidate_fn(obs)
    teach, cand_pos = trainer._teacher(cand)
    cur = envs.current_dist_to_goal()
    for i in range(envs.num_envs):
        if cur[i] < RecVLNBertDagger.STOP_TRIGGER_M:
            assert teach[i] == 0
        else:
            assert 1 <= teach[i] <= len(ANGLES)
            # the chosen motion candidate must not increase goal distance
            valid = np.flatnonzero(cand["mask"][i])
            pos = envs.cand_real_pos(i, cand["angles"][i][valid],
                                     cand["dists"][i][valid])
            np.testing.assert_allclose(pos, cand_pos[i][valid], atol=1e-9)
            dg = np.array([envs.point_dist_to_goal(i, p) for p in pos])
            assert dg[teach[i] - 1] == dg.min()


def test_oracle_teacher_stops_without_candidates(envs):
    """Zero valid motion candidates must fall back to STOP, not crash."""
    trainer = RecVLNBertDagger(envs, CFG, DaggerConfig(max_steps=4),
                               _candidate_fn, "/tmp/_unused_store_rvb2",
                               seed=0)
    envs.resume_all()
    obs = envs.reset()
    cand = _candidate_fn(obs)
    cand["mask"][:] = False
    teach, _ = trainer._teacher(cand)
    assert (teach == 0).all()


def test_collect_and_update(envs, tmp_path):
    dcfg = DaggerConfig(iterations=2, episodes_per_iter=2, epochs=1,
                        batch_size=2, lr=1e-3, max_steps=5)
    trainer = RecVLNBertDagger(envs, CFG, dcfg, _candidate_fn,
                               str(tmp_path / "store"), seed=0)
    losses = trainer.train()
    assert len(losses) == dcfg.iterations
    assert np.isfinite(losses).all()
    # trajectories were persisted with the full candidate record
    trajs = list(trainer.store)
    assert len(trajs) >= dcfg.episodes_per_iter
    t = trajs[0]
    K = 1 + len(ANGLES)
    assert t["rgb"].shape[1:] == (K, CFG.rgb_dim)
    assert t["cmask"].shape[1] == K
    assert t["cmask"][:, 0].all()             # STOP slot always valid
    assert (t["teacher"] >= 0).all() and (t["teacher"] < K).all()


def test_collect_drops_crashed_episodes(envs, tmp_path):
    """A worker crash (done + info={'crashed': True}) discards that
    env's partial trajectory instead of storing it (ADVICE round 1)."""
    from etpnav_tpu.env.protocol import StepResult

    class CrashFirstEnv:
        def __init__(self, inner):
            self._inner = inner
            self._fired = False

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def step(self, actions):
            results = self._inner.step(actions)
            if not self._fired and self._inner.num_envs > 1:
                self._fired = True
                r = results[0]
                results[0] = StepResult(r.observation, True,
                                        {"crashed": True})
            return results

    dcfg = DaggerConfig(episodes_per_iter=1, batch_size=2, max_steps=5)
    trainer = RecVLNBertDagger(CrashFirstEnv(envs), CFG, dcfg,
                               _candidate_fn, str(tmp_path / "store"),
                               seed=0)
    trainer.collect(beta=1.0, episodes=1)
    assert len(list(trainer.store)) == 1   # surviving env only


def test_update_single_compiled_shape(tmp_path):
    """Partial final batches are padded to the full batch size and
    token width comes from the whole store, so the jitted update
    compiles exactly one shape (static shapes invariant)."""
    envs3 = GeometricNavEnv(num_envs=3, seed=7, vocab_size=CFG.vocab_size,
                            max_instr_len=12, image_size=16,
                            depth_size=16)
    dcfg = DaggerConfig(iterations=1, episodes_per_iter=3, epochs=2,
                        batch_size=2, lr=1e-3, max_steps=5)
    trainer = RecVLNBertDagger(envs3, CFG, dcfg, _candidate_fn,
                               str(tmp_path / "store"), seed=0)
    trainer.collect(beta=1.0, episodes=3)
    loss = trainer.update()                # 2 epochs x (2+1) episodes
    assert np.isfinite(loss)
    assert trainer._jit_update._cache_size() == 1
    # collect must also run ONE compiled nav shape: envs finishing at
    # different steps ride as padding rows, the batch never shrinks
    assert trainer._jit_nav._cache_size() == 1
    # greedy eval shares the fixed-B program discipline
    trainer.evaluate(3, success_distance=3.0)
    assert trainer._jit_nav._cache_size() == 1


def test_update_learns_teacher(envs, tmp_path):
    """With beta=1 (pure teacher) collection, repeated supervised epochs
    drive the CE down — the policy imitates the oracle."""
    dcfg = DaggerConfig(iterations=1, episodes_per_iter=2, epochs=1,
                        batch_size=2, lr=3e-3, max_steps=5)
    trainer = RecVLNBertDagger(envs, CFG, dcfg, _candidate_fn,
                               str(tmp_path / "store"), seed=1)
    trainer.collect(beta=1.0, episodes=2)
    first = trainer.update(epochs=1)
    last = trainer.update(epochs=3)
    assert np.isfinite([first, last]).all()
    assert last < first


def test_evaluate_greedy_policy(envs, tmp_path):
    """The legacy-path eval loop: greedy policy rollout, env-side
    measures, SR/SPL/nDTW aggregation (base_il_trainer.py:774-889)."""
    import jax.numpy as jnp

    trainer = RecVLNBertDagger(envs, CFG,
                               DaggerConfig(max_steps=4, episodes_per_iter=2),
                               _candidate_fn, str(tmp_path / "store"),
                               seed=0)
    # force STOP from the second decision on, so episodes complete
    real = trainer._jit_nav
    calls = {"n": 0}

    def scripted(params, **kw):
        logits, state = real(params, **kw)
        calls["n"] += 1
        if calls["n"] >= 2:
            logits = jnp.full_like(logits, -1e9).at[:, 0].set(0.0)
        return logits, state

    trainer._jit_nav = scripted
    stats = trainer.evaluate(episodes=2)
    assert stats, "no episodes completed"
    for key in ("success", "spl", "ndtw", "distance_to_goal",
                "steps_taken"):
        assert key in stats and np.isfinite(stats[key]), key
