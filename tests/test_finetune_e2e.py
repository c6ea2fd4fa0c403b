"""End-to-end fine-tune slice on the geometric fake env (SURVEY.md §4:
sim-free integration tests): rollout -> record -> fused learn step ->
eval metrics -> inference writer."""

import json
import os

import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.training.finetune import FinetuneTrainer


@pytest.fixture(scope="module")
def trainer():
    cfg = tiny_config()
    envs = GeometricNavEnv(
        num_envs=2, seed=0, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len,
        image_size=cfg.clip.image_size, depth_size=cfg.depth.input_size,
        pad_id=cfg.planner.pad_token_id)
    return FinetuneTrainer(cfg, envs, seed=0)


def test_train_two_iters_decreases_or_runs(trainer):
    logs = trainer.train(iters=2)
    assert "IL_loss" in logs
    assert np.isfinite(logs["IL_loss"])
    assert trainer.iteration == 2


def dense_agg_from_record(rec, b, t):
    """Reconstruct the (G, T*P) aggregation matrix one recorded step's
    sparse agg_* fields encode (the round-2 dense layout, kept as the
    test oracle for the sparse record)."""
    T, P = rec.vp_mask.shape[1:3]
    G = rec.agg_node_step.shape[2]
    w = np.zeros((G, T * P), np.float32)
    for si in range(G):
        ts = rec.agg_node_step[b, t, si]
        if ts >= 0:
            valid = rec.vp_mask[b, ts]
            w[si, ts * P:(ts + 1) * P][valid] = 1.0 / max(valid.sum(), 1)
    for slot, tok, val in zip(rec.agg_ent_slot[b, t],
                              rec.agg_ent_tok[b, t],
                              rec.agg_ent_val[b, t]):
        if val > 0:
            w[slot, tok] += val
    return w


def test_rollout_record_consistency(trainer):
    rec = trainer.engine.run("train", sample_ratio=1.0)
    B, T = rec.step_valid.shape
    assert rec.step_valid[:, 0].all()          # every env took step 0
    # aggregation rows: every valid gmap slot (except stop) must have
    # weights summing to ~1 over recorded pano tokens
    for b in range(B):
        for t in range(T):
            if not rec.step_valid[b, t]:
                continue
            mask = rec.gmap_mask[b, t]
            w = dense_agg_from_record(rec, b, t)
            sums = w.sum(-1)
            # stop slot has zero weights; others sum to 1
            assert sums[0] == 0
            np.testing.assert_allclose(sums[mask][1:], 1.0, atol=1e-5)
            assert (sums[~mask] == 0).all()
            # node slots reference only recorded steps of this env
            ns = rec.agg_node_step[b, t]
            assert (rec.step_valid[b][ns[ns >= 0]]).all()
    # teacher indices point at ghost slots or 0/-100
    valid_t = rec.teacher[rec.step_valid]
    assert ((valid_t >= -100) & (valid_t < rec.gmap_mask.shape[2])).all()


def test_eval_produces_metrics(trainer):
    stats = trainer.evaluate(episode_count=2)
    for key in ("success", "spl", "ndtw", "sdtw", "oracle_success",
                "distance_to_goal", "path_length", "steps_taken"):
        assert key in stats, key
    assert 0.0 <= stats["spl"] <= 1.0
    assert 0.0 <= stats["ndtw"] <= 1.0


def test_inference_writes_predictions(trainer, tmp_path):
    out = tmp_path / "preds.json"
    trainer.inference(episode_count=2, predictions_file=str(out))
    data = json.loads(out.read_text())
    assert len(data) >= 2
    ep = next(iter(data.values()))
    assert ep[-1]["stop"] is True
    assert all(len(p["position"]) == 3 for p in ep)


def test_fix_embedding_freezes_subtrees():
    """MODEL.fix_lang_embedding / fix_pano_embedding must zero updates for
    embeddings+lang_encoder / img_embeddings (vilmodel_cmt.py:675-682)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from etpnav_tpu.training.agent import init_agent_params
    from etpnav_tpu.training.finetune import make_il_optimizer
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, il=dataclasses.replace(
        cfg.il, fix_lang_embedding=True, fix_pano_embedding=True))
    planner_params = init_agent_params(jax.random.PRNGKey(0), cfg).planner
    tx = make_il_optimizer(cfg, planner_params)
    state = tx.init(planner_params)
    grads = jax.tree_util.tree_map(jnp.ones_like, planner_params)
    updates, _ = tx.update(grads, state, planner_params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    froze = moved = 0
    for path, leaf in flat:
        root = path[0].key
        if root in ("embeddings", "lang_encoder", "img_embeddings"):
            assert not np.asarray(leaf).any(), path
            froze += 1
        else:
            moved += 1
    assert froze > 0 and moved > 0


def test_consume_ghost_off_keeps_ghosts(trainer):
    """MODEL.consume_ghost=False: visited ghosts stay in the graph."""
    import dataclasses
    cfg = dataclasses.replace(trainer.cfg, graph=dataclasses.replace(
        trainer.cfg.graph, consume_ghost=False))
    from etpnav_tpu.training.rollout import RolloutEngine
    engine = RolloutEngine(cfg, trainer.agent, trainer.envs, seed=3)
    stat: dict = {}
    engine.run("eval", stat_eps=stat)
    assert stat                            # episodes completed


def test_inference_sample_actions(trainer, tmp_path):
    out = tmp_path / "preds_sampled.json"
    trainer.inference(episode_count=1, predictions_file=str(out),
                      sample=True)
    assert json.loads(out.read_text())


def test_eval_writes_videos(trainer, tmp_path):
    vdir = tmp_path / "videos"
    trainer.evaluate(episode_count=1, video_dir=str(vdir))
    written = list(vdir.iterdir())
    assert written, "no video output produced"


def test_eval_gmap_bucketing_matches_full_size():
    """gmap_len_buckets must not change eval decisions: padded slots are
    fully masked, so per-slot logits are identical up to fp reduction
    order."""
    import dataclasses
    stats = {}
    for buckets in ((), (8, 16)):
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, planner=dataclasses.replace(
            cfg.planner, gmap_len_buckets=buckets))
        envs = GeometricNavEnv(
            num_envs=2, seed=0, vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)
        t = FinetuneTrainer(cfg, envs, seed=0)
        stats[buckets] = t.evaluate(episode_count=2)
    a, b = stats[()], stats[(8, 16)]
    for key in ("success", "spl", "ndtw", "steps_taken", "path_length"):
        assert a[key] == pytest.approx(b[key], abs=1e-6), (key, a, b)


def test_eval_warns_when_split_underdelivers(trainer, monkeypatch):
    """A split smaller than requested (or a crash-looping env) must warn
    with the achieved count instead of silently aggregating fewer episodes
    (VERDICT r2 weak #4)."""
    def fake_run(mode, **kw):
        kw["stat_eps"].setdefault("only_ep", {
            "success": 1.0, "spl": 1.0, "ndtw": 1.0, "sdtw": 1.0,
            "oracle_success": 1.0, "distance_to_goal": 0.0,
            "path_length": 1.0, "steps_taken": 1.0, "collisions": 0.0})
    monkeypatch.setattr(trainer.engine, "run", fake_run)
    with pytest.warns(RuntimeWarning, match=r"1/5 requested"):
        stats = trainer.evaluate(episode_count=5)
    assert stats["success"] == 1.0


def test_inference_warns_when_split_underdelivers(trainer, monkeypatch,
                                                  tmp_path):
    def fake_run(mode, **kw):
        kw["path_eps"].setdefault("ep0", {
            "path": [{"position": [0.0, 0.0, 0.0], "heading": 0.0,
                      "stop": True}],
            "instruction_id": 0})
    monkeypatch.setattr(trainer.engine, "run", fake_run)
    out = tmp_path / "short.json"
    with pytest.warns(RuntimeWarning, match=r"1/4 requested"):
        trainer.inference(episode_count=4, predictions_file=str(out))
    assert json.loads(out.read_text())


def test_rng_impl_knob(trainer):
    """ILConfig.rng_impl steers the dropout-key generator: rbg by default
    (threefry mask generation is ~16% of the fused learn step on v5e-1,
    tools/exp_learn_bisect.py), threefry restorable via config. Both must
    train. The module trainer (rbg) already ran iterations above."""
    import dataclasses
    import jax
    assert trainer.cfg.il.rng_impl == "rbg"
    impl = str(jax.random.key_impl(trainer.rng))
    assert "rbg" in impl, impl
    cfg = dataclasses.replace(trainer.cfg, il=dataclasses.replace(
        trainer.cfg.il, rng_impl="threefry2x32"))
    envs = GeometricNavEnv(
        num_envs=2, seed=0, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len,
        image_size=cfg.clip.image_size, depth_size=cfg.depth.input_size,
        pad_id=cfg.planner.pad_token_id)
    t = FinetuneTrainer(cfg, envs, seed=0)
    assert "threefry" in str(jax.random.key_impl(t.rng))
    logs = t.train(iters=1)
    assert np.isfinite(logs["IL_loss"])


def test_checkpoint_roundtrip(trainer, tmp_path):
    saved_iter = trainer.iteration
    path = tmp_path / f"ckpt_iter{saved_iter}"
    trainer.save_checkpoint(str(path))
    before = trainer.params.planner["global_sap_head"]["dense2"]["w"]
    trainer.iteration = saved_iter + 7          # must be restored below
    trainer.load_checkpoint(str(path))
    after = trainer.params.planner["global_sap_head"]["dense2"]["w"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert trainer.iteration == saved_iter
