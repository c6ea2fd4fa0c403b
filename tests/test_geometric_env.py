"""Property tests for the geometric env's control layer
(SURVEY.md §4: turn/step quantization, tryout behavior, oracle
state-preservation)."""

import math

import numpy as np
import pytest

from etpnav_tpu.env.geometric import (
    FORWARD_M,
    TURN_DEG,
    GeometricNavEnv,
    heading_to_quat,
)
from etpnav_tpu.graph.geometry import heading_from_quaternion


def _env(n=1, seed=0):
    return GeometricNavEnv(num_envs=n, seed=seed, vocab_size=64,
                           max_instr_len=8, image_size=16, depth_size=16)


def test_heading_quat_roundtrip():
    for h in np.linspace(0, 2 * math.pi, 13, endpoint=False):
        q = heading_to_quat(h)
        assert heading_from_quaternion(q) == pytest.approx(h % (2 * math.pi),
                                                           abs=1e-9)


def test_turn_quantization():
    env = _env()
    env.reset()
    g = env._live[0]
    h0 = env._heading[g]
    # 40 degrees rounds to 45 (3 x 15deg units)
    env._turn(g, math.radians(40))
    assert (env._heading[g] - h0) % (2 * math.pi) == pytest.approx(
        math.radians(45), abs=1e-9)
    # 190 degrees folds to -170 -> -165 after rounding? 190/15=12.67 ->
    # 195 -> folds to -165
    h1 = env._heading[g]
    env._turn(g, math.radians(190))
    delta = (env._heading[g] - h1) % (2 * math.pi)
    assert delta == pytest.approx(math.radians(195), abs=1e-9)


def test_forward_quantization_and_collision():
    env = _env()
    env.reset()
    g = env._live[0]
    env._worlds[g].obstacles = np.array([[1e6, 1e6]])   # no obstacles
    p0 = env._pos[g].copy()
    env._single_step_control(g, p0 + np.array([0, 0, -1.9]), tryout=False)
    moved = np.linalg.norm(env._pos[g] - p0)
    # int(1.9 // 0.25) = 7 steps of 0.25 = 1.75
    assert moved == pytest.approx(7 * FORWARD_M, abs=1e-9)

    # place a pillar directly ahead: blocked, no tryout
    p1 = env._pos[g].copy()
    env._worlds[g].obstacles = np.array([[p1[0], p1[2] - 0.5]])
    env._heading[g] = 0.0
    c0 = env._collisions[g]
    env._single_step_control(g, p1 + np.array([0, 0, -1.0]), tryout=False)
    assert env._collisions[g] > c0
    assert np.linalg.norm(env._pos[g] - p1) < 0.5


def test_tryout_recovers_around_obstacle():
    env = _env(seed=3)
    env.reset()
    g = env._live[0]
    p0 = env._pos[g].copy()
    env._heading[g] = 0.0
    env._worlds[g].obstacles = np.array([[p0[0], p0[2] - 0.45]])
    env._single_step_control(g, p0 + np.array([0, 0, -2.0]), tryout=True)
    # without tryout the agent would not move at all; with tryout it at
    # least sidesteps (possibly re-colliding further along, like the
    # reference's recovery sequences)
    assert np.linalg.norm(env._pos[g] - p0) > 0.2


def test_oracles_preserve_state():
    env = _env()
    env.reset()
    g = env._live[0]
    p0, h0 = env._pos[g].copy(), env._heading[g]
    steps0, coll0 = env._steps_taken[g], env._collisions[g]
    log0 = len(env._positions_log[g])
    out = env.cand_real_pos(0, np.array([0.0, math.pi / 2]),
                            np.array([2.0, 1.0]))
    assert out.shape == (2, 3)
    np.testing.assert_array_equal(env._pos[g], p0)
    assert env._heading[g] == h0
    assert env._steps_taken[g] == steps0
    assert env._collisions[g] == coll0
    assert len(env._positions_log[g]) == log0


def test_episode_determinism():
    a, b = _env(seed=7), _env(seed=7)
    oa, ob = a.reset(), b.reset()
    np.testing.assert_array_equal(oa[0]["rgb"], ob[0]["rgb"])
    ea, eb = a.current_episodes()[0], b.current_episodes()[0]
    assert ea.episode_id == eb.episode_id
    np.testing.assert_allclose(ea.goal_position, eb.goal_position)


def test_progress_oracle():
    """VLNOracleProgressSensor equivalent (sensors.py:116-163): 0 at the
    start, approaches 1 as the agent closes on the goal."""
    env = GeometricNavEnv(num_envs=2, seed=11, vocab_size=64,
                          max_instr_len=8, image_size=16, depth_size=16)
    env.reset()
    p0 = env.progress()
    assert p0.shape == (2,)
    np.testing.assert_allclose(p0, 0.0, atol=1e-6)
    # teleport env 0 onto its goal: progress -> 1
    ep = env.current_episodes()[0]
    pos, _ = env.get_pos_ori()
    env.step([{"act": 0, "stop_pos": ep.goal_position, "back_path": None,
               "tryout": True},
              {"act": 0, "stop_pos": pos[1], "back_path": None,
               "tryout": True}])
    env.resume_all()
    # stopped envs keep positions; re-read progress on the full set
    p1 = env.progress()
    assert p1[0] > 0.99
