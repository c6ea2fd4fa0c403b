"""Pipelined (threaded half-batch) rollout: equivalence of record shapes
and learn-step consumption; async env stepping API."""

import dataclasses

import jax
import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.training.agent import JittedAgent, init_agent_params
from etpnav_tpu.training.finetune import learn_step, record_to_batch
from etpnav_tpu.training.pipeline import PipelinedRollout, concat_records
from etpnav_tpu.training.rollout import RolloutEngine


def _engine(cfg, agent, seed):
    envs = GeometricNavEnv(
        num_envs=2, seed=seed, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    return RolloutEngine(cfg, agent, envs, seed=seed)


def test_pipelined_rollout_trains():
    cfg = tiny_config()
    params = init_agent_params(jax.random.PRNGKey(0), cfg)
    agent = JittedAgent(cfg, params)
    pipe = PipelinedRollout([_engine(cfg, agent, 1),
                             _engine(cfg, agent, 2)])
    rec = pipe.run("train", sample_ratio=1.0)
    assert rec.step_valid.shape[0] == 4          # 2 halves x 2 envs
    # consume through the standard learn step
    import optax
    tx = optax.adamw(1e-4)
    opt = tx.init(params.planner)
    new_p, opt, loss = learn_step(params.planner, opt, cfg, tx,
                                  record_to_batch(rec),
                                  jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_pipelined_eval_dedup():
    cfg = tiny_config()
    params = init_agent_params(jax.random.PRNGKey(0), cfg)
    agent = JittedAgent(cfg, params)
    pipe = PipelinedRollout([_engine(cfg, agent, 5),
                             _engine(cfg, agent, 6)])
    stats = {}
    pipe.run("eval", stat_eps=stats)
    assert len(stats) >= 2
    for m in stats.values():
        assert 0.0 <= m["spl"] <= 1.0


def test_async_step_api():
    from etpnav_tpu.env.vector import construct_geometric_envs
    envs = construct_geometric_envs(2, workers=True, seed=3, vocab_size=64,
                                    max_instr_len=8, image_size=16,
                                    depth_size=16)
    try:
        envs.reset()
        pos0, _ = envs.get_pos_ori()
        acts = [{"act": 4, "front_pos": pos0[i],
                 "ghost_pos": pos0[i] + np.array([0, 0, -1.0]),
                 "back_path": None, "tryout": True} for i in range(2)]
        envs.step_async(acts)
        res = envs.step_wait()
        assert len(res) == 2
        pos1, _ = envs.get_pos_ori()
        assert not np.allclose(pos0, pos1)
    finally:
        envs.close()


def test_rollout_engine_over_process_workers():
    """Full eval rollout through the multi-process env pool (engine ->
    batched RPC -> workers)."""
    from etpnav_tpu.env.vector import construct_geometric_envs
    cfg = tiny_config()
    envs = construct_geometric_envs(
        2, workers=True, seed=31, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    try:
        params = init_agent_params(jax.random.PRNGKey(0), cfg)
        agent = JittedAgent(cfg, params)
        eng = RolloutEngine(cfg, agent, envs, seed=0)
        stats = {}
        eng.run("eval", stat_eps=stats)
        assert len(stats) >= 2
        # train mode exercises the batched candidate oracle fan-out
        rec = eng.run("train", sample_ratio=1.0)
        assert rec.step_valid[:, 0].all()
    finally:
        envs.close()
