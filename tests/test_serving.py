"""NavServer: session-based serving with dynamic batching.

Covers: concurrent client threads each driving their own episode against
the geometric world; request coalescing into fixed-slot device batches;
action-dict compatibility with the env layer; session lifecycle.
"""

import threading

import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.serving import NavServer
from etpnav_tpu.training.agent import (JittedAgent, init_agent_params)

import jax


@pytest.fixture(scope="module")
def server_and_cfg():
    cfg = tiny_config()
    agent = JittedAgent(cfg, init_agent_params(jax.random.PRNGKey(0), cfg))
    server = NavServer(cfg, agent, max_batch=4, max_wait_ms=100.0,
                       max_steps=4)
    yield server, cfg
    server.shutdown()


def _make_env(cfg, seed):
    return GeometricNavEnv(
        num_envs=1, seed=seed, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)


def _run_episode(server, cfg, seed, out):
    env = _make_env(cfg, seed)
    obs = env.reset()[0]
    sid = server.create_session(obs["instruction"])
    steps = 0
    try:
        while True:
            pos, ori = env.get_pos_ori()
            res = server.step(sid, obs["rgb"], obs["depth"],
                              pos[0], ori[0])
            steps += 1
            assert res["action"]["act"] in (0, 4)
            assert np.isfinite(res["stop_prob"])
            assert res["num_nodes"] >= 1
            r = env.step([res["action"]])[0]
            obs = r.observation
            if res["done"] or r.done:
                break
        info = server.close_session(sid)
        out[seed] = {"steps": steps, "closed": info["steps"],
                     "history": len(info["history"])}
    except Exception as e:          # surface thread failures to pytest
        out[seed] = e


def test_concurrent_sessions_complete(server_and_cfg):
    server, cfg = server_and_cfg
    out = {}
    threads = [threading.Thread(target=_run_episode,
                                args=(server, cfg, s, out))
               for s in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(out) == 3
    for seed, r in out.items():
        assert not isinstance(r, Exception), r
        assert 1 <= r["steps"] <= 5
        assert r["closed"] == r["history"] == r["steps"]


def test_simultaneous_steps_coalesce(server_and_cfg):
    """Three steps submitted together run as ONE perceive dispatch."""
    server, cfg = server_and_cfg
    calls = []
    orig = server.agent.perceive

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    server.agent.perceive = counting
    try:
        envs = [_make_env(cfg, 10 + i) for i in range(3)]
        obs = [e.reset()[0] for e in envs]
        sids = [server.create_session(o["instruction"]) for o in obs]
        barrier = threading.Barrier(3)
        results = {}

        def one(i):
            barrier.wait()
            pos, ori = envs[i].get_pos_ori()
            results[i] = server.step(sids[i], obs[i]["rgb"],
                                     obs[i]["depth"], pos[0], ori[0])

        ts = [threading.Thread(target=one, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert len(results) == 3
        # all three coalesced into one (or at most two, if the batcher
        # woke between arrivals) device dispatches
        assert len(calls) <= 2
        for sid in sids:
            server.close_session(sid)
    finally:
        server.agent.perceive = orig


def test_concurrent_same_session_step_rejected(server_and_cfg):
    """At most one in-flight step per session: a second concurrent call
    fails fast instead of double-applying the observation."""
    server, cfg = server_and_cfg
    env = _make_env(cfg, 42)
    obs = env.reset()[0]
    sid = server.create_session(obs["instruction"])
    pos, ori = env.get_pos_ori()
    errs = []
    started = threading.Event()

    def first():
        started.set()
        server.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])

    t = threading.Thread(target=first)
    t.start()
    started.wait()
    import time
    time.sleep(0.02)            # let the first call mark in_flight
    try:
        server.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])
    except RuntimeError as e:
        errs.append(str(e))
    t.join(timeout=300)
    assert errs and "in flight" in errs[0]
    server.close_session(sid)


def test_warmup_compiles_all_buckets(server_and_cfg):
    server, cfg = server_and_cfg
    n = server.warmup()
    buckets = {*(cfg.planner.gmap_len_buckets or ()),
               cfg.planner.max_gmap_len}
    assert n == 2 + len(buckets)


def test_step_after_shutdown_rejected():
    import jax as _jax
    cfg = tiny_config()
    agent = JittedAgent(cfg, init_agent_params(_jax.random.PRNGKey(1),
                                               cfg))
    server = NavServer(cfg, agent, max_batch=2, max_wait_ms=5.0)
    server.shutdown()
    with pytest.raises(RuntimeError):
        server.step(0, np.zeros((12, 16, 16, 3), np.uint8),
                    np.zeros((12, 16, 16, 1), np.float32),
                    np.zeros(3), np.array([0, 0, 0, 1.0]))


def test_step_after_stop_rejected(server_and_cfg):
    server, cfg = server_and_cfg
    env = _make_env(cfg, 99)
    obs = env.reset()[0]
    sid = server.create_session(obs["instruction"])
    done = False
    for _ in range(6):
        pos, ori = env.get_pos_ori()
        res = server.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])
        if res["done"]:
            done = True
            break
        obs = env.step([res["action"]])[0].observation
    assert done                      # max_steps=4 forces a stop
    with pytest.raises(RuntimeError):
        server.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])
    server.close_session(sid)


def test_server_stats():
    cfg = tiny_config()
    agent = JittedAgent(cfg, init_agent_params(jax.random.PRNGKey(0), cfg))
    server = NavServer(cfg, agent, max_batch=2, max_wait_ms=5.0)
    try:
        s0 = server.stats()
        assert s0["steps_served"] == 0 and s0["batches"] == 0
        rng = np.random.default_rng(0)
        sid = server.create_session(
            rng.integers(1, cfg.planner.vocab_size, 8))
        rgb = rng.integers(0, 256, (12, cfg.clip.image_size,
                                    cfg.clip.image_size, 3)).astype(
                                        np.uint8)
        dep = rng.random((12, cfg.depth.input_size, cfg.depth.input_size,
                          1)).astype(np.float32)
        res = server.step(sid, rgb, dep, np.zeros(3),
                          np.array([0.0, 0.0, 0.0, 1.0]))
        st = server.stats()
        assert st["steps_served"] == 1 and st["batches"] == 1
        assert 0 < st["mean_occupancy"] <= 1.0
        # the random policy may STOP on step 1; live reflects that
        assert st["live_sessions"] == (0 if res["done"] else 1)
        assert st["queue_depth"] == 0
    finally:
        server.shutdown()


def test_malformed_request_rejected_at_entry(server_and_cfg):
    """A wrong-shaped observation fails only the offending request —
    validated at step() entry, never reaching the shared device batch —
    and the session stays usable with correct observations."""
    server, cfg = server_and_cfg
    env = _make_env(cfg, 77)
    obs = env.reset()[0]
    sid = server.create_session(obs["instruction"])
    pos, ori = env.get_pos_ori()
    bad_rgb = np.zeros((12, 8, 8, 3), np.uint8)       # wrong H, W
    with pytest.raises(ValueError, match="rgb shape"):
        server.step(sid, bad_rgb, obs["depth"], pos[0], ori[0])
    with pytest.raises(ValueError, match="depth shape"):
        server.step(sid, obs["rgb"], obs["depth"][:, :2], pos[0], ori[0])
    st = server.stats()
    assert st["failed_batches"] == 0                  # no batch poisoned
    res = server.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])
    assert res["action"]["act"] in (0, 4)             # session healthy
    server.close_session(sid)


def test_timeout_before_claim_leaves_session_usable():
    """A request that times out before the batcher commits to it is
    skipped cleanly; the session can retry."""
    import time
    cfg = tiny_config()
    agent = JittedAgent(cfg, init_agent_params(jax.random.PRNGKey(0), cfg))
    server = NavServer(cfg, agent, max_batch=2, max_wait_ms=5.0)
    try:
        orig_collect = server._collect

        def slow_collect():
            time.sleep(0.5)            # batcher never claims in time
            return orig_collect()

        server._collect = slow_collect
        rng = np.random.default_rng(0)
        sid = server.create_session(
            rng.integers(1, cfg.planner.vocab_size, 8))
        rgb = rng.integers(0, 256, (12, cfg.clip.image_size,
                                    cfg.clip.image_size, 3)).astype(
                                        np.uint8)
        dep = rng.random((12, cfg.depth.input_size, cfg.depth.input_size,
                          1)).astype(np.float32)
        with pytest.raises(TimeoutError):
            server.step(sid, rgb, dep, np.zeros(3),
                        np.array([0.0, 0.0, 0.0, 1.0]), timeout=0.05)
        server._collect = orig_collect
        res = server.step(sid, rgb, dep, np.zeros(3),
                          np.array([0.0, 0.0, 0.0, 1.0]))
        assert res["action"]["act"] in (0, 4)         # retry succeeded
        assert server.stats()["steps_served"] == 1    # applied exactly once
    finally:
        server.shutdown()


def test_timeout_after_claim_poisons_session():
    """Once the batcher has committed to a request, a client timeout
    marks the session done — a retry would register the observation
    twice server-side (ADVICE round 1)."""
    import time
    cfg = tiny_config()
    agent = JittedAgent(cfg, init_agent_params(jax.random.PRNGKey(0), cfg))
    server = NavServer(cfg, agent, max_batch=2, max_wait_ms=5.0)
    try:
        orig_process = server._process

        def slow_process(batch):
            time.sleep(0.5)            # claimed, then outlives the timeout
            return orig_process(batch)

        server._process = slow_process
        rng = np.random.default_rng(0)
        sid = server.create_session(
            rng.integers(1, cfg.planner.vocab_size, 8))
        rgb = rng.integers(0, 256, (12, cfg.clip.image_size,
                                    cfg.clip.image_size, 3)).astype(
                                        np.uint8)
        dep = rng.random((12, cfg.depth.input_size, cfg.depth.input_size,
                          1)).astype(np.float32)
        with pytest.raises(TimeoutError):
            server.step(sid, rgb, dep, np.zeros(3),
                        np.array([0.0, 0.0, 0.0, 1.0]), timeout=0.2)
        # wait for the server-side step to actually COMPLETE before
        # shutting down: shutdown()'s bounded join would otherwise leave
        # the batcher thread running (first-compile can take tens of
        # seconds) into subsequent tests
        deadline = time.monotonic() + 300
        while (server.stats()["steps_served"] == 0
               and time.monotonic() < deadline):
            time.sleep(0.05)
        assert server.stats()["steps_served"] == 1
        with pytest.raises(RuntimeError, match="already stopped"):
            server.step(sid, rgb, dep, np.zeros(3),
                        np.array([0.0, 0.0, 0.0, 1.0]))
    finally:
        server.shutdown()


def test_server_stats_count_failures_separately():
    """A failing dispatch must surface in failed_batches, not in
    steps_served (counters reflect successful batches only)."""
    cfg = tiny_config()
    agent = JittedAgent(cfg, init_agent_params(jax.random.PRNGKey(0), cfg))
    server = NavServer(cfg, agent, max_batch=2, max_wait_ms=5.0)
    try:
        server._process = lambda batch: (_ for _ in ()).throw(
            RuntimeError("injected device failure"))
        rng = np.random.default_rng(0)
        sid = server.create_session(
            rng.integers(1, cfg.planner.vocab_size, 8))
        rgb = rng.integers(0, 256, (12, cfg.clip.image_size,
                                    cfg.clip.image_size, 3)).astype(
                                        np.uint8)
        dep = rng.random((12, cfg.depth.input_size, cfg.depth.input_size,
                          1)).astype(np.float32)
        with pytest.raises(RuntimeError, match="injected"):
            server.step(sid, rgb, dep, np.zeros(3),
                        np.array([0.0, 0.0, 0.0, 1.0]))
        st = server.stats()
        assert st["failed_batches"] == 1
        assert st["steps_served"] == 0 and st["batches"] == 0
        assert st["live_sessions"] == 0      # session poisoned
    finally:
        server.shutdown()
