"""Execute the habitat adapter against a mock habitat API.

habitat-sim isn't installed in CI, so env/habitat_worker.py was written
but never run. This mock implements the exact primitive surface the
worker touches — agent state get/set, step_without_obs kinematics
(0.25 m forward / 15° turns), geodesic_distance, get_observations_at,
previous_step_collided, episode metadata — with the same heading/motion
conventions as the geometric env, and drives reset/step/oracles/control
through it."""

import math
import sys
import types

import numpy as np
import pytest

from etpnav_tpu.env.geometric import heading_to_quat
from etpnav_tpu.graph.geometry import heading_from_quaternion

FORWARD = 0.25
TURN = math.radians(15.0)


class _Quat:
    def __init__(self, xyzw):
        self.x, self.y, self.z, self.w = map(float, xyzw)


class _AgentState:
    def __init__(self, position, rotation):
        self.position = np.asarray(position, np.float64)
        self.rotation = rotation


class _MockSim:
    """Kinematic simulator matching the adapter's conventions; optional
    wall at z < wall_z blocks forward motion (collision)."""

    def __init__(self, wall_z=None):
        self.pos = np.zeros(3)
        self.heading = 0.0
        self.wall_z = wall_z
        self.previous_step_collided = False
        self.step_calls = 0

    def get_agent_state(self):
        return _AgentState(self.pos.copy(),
                           _Quat(heading_to_quat(self.heading)))

    def set_agent_state(self, position, rotation):
        self.pos = np.asarray(position, np.float64).copy()
        if isinstance(rotation, _Quat):
            q = np.array([rotation.x, rotation.y, rotation.z, rotation.w])
        else:
            q = np.asarray(rotation, np.float64)
        self.heading = heading_from_quaternion(q)

    def step_without_obs(self, action):
        self.step_calls += 1
        self.previous_step_collided = False
        if action == 1:                      # MOVE_FORWARD
            delta = np.array([-FORWARD * math.sin(self.heading), 0.0,
                              -FORWARD * math.cos(self.heading)])
            new = self.pos + delta
            if self.wall_z is not None and new[2] < self.wall_z:
                self.previous_step_collided = True   # sliding blocked
            else:
                self.pos = new
        elif action == 2:                    # TURN_LEFT
            self.heading = (self.heading + TURN) % (2 * math.pi)
        elif action == 3:                    # TURN_RIGHT
            self.heading = (self.heading - TURN) % (2 * math.pi)

    step = step_without_obs

    def geodesic_distance(self, a, b):
        return float(np.linalg.norm(np.asarray(a) - np.asarray(b)))

    def get_observations_at(self, position, rotation,
                            keep_agent_at_new_pose=False):
        return _make_obs()


def _make_obs():
    obs = {"instruction": np.arange(5, dtype=np.int64)}
    for v in range(12):
        suffix = "" if v == 0 else f"_{v}"
        obs[f"rgb{suffix}"] = np.full((8, 8, 3), v, np.uint8)
        obs[f"depth{suffix}"] = np.full((4, 4, 1), 0.5, np.float32)
    return obs


class _Instruction:
    instruction_tokens = [1, 2, 3]
    instruction_text = "go"


class _Goal:
    position = [0.0, 0.0, -5.0]


class _EpisodeMeta:
    episode_id = 7
    scene_id = "scene0"
    start_position = [0.0, 0.0, 0.0]
    goals = [_Goal()]
    instruction = _Instruction()
    reference_path = [[0.0, 0.0, 0.0], [0.0, 0.0, -5.0]]


class _EpisodeMeta2(_EpisodeMeta):
    episode_id = 9


class _MockEnv:
    def __init__(self, config=None, wall_z=None):
        self.sim = _MockSim(wall_z=wall_z)
        self.current_episode = _EpisodeMeta()
        self.episodes = [_EpisodeMeta(), _EpisodeMeta2()]

    def seed(self, s):
        pass

    def reset(self):
        return _make_obs()

    def step(self, action):
        return _make_obs()


@pytest.fixture()
def worker(monkeypatch):
    fake = types.ModuleType("habitat")
    fake.Env = _MockEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatWorkerEnv
    return HabitatWorkerEnv(None, seed=0)


def test_reset_packs_12_camera_rig(worker):
    obs = worker.reset()
    assert len(obs) == 1
    assert obs[0]["rgb"].shape == (12, 8, 8, 3)
    assert obs[0]["depth"].shape == (12, 4, 4, 1)
    # view v comes from camera rgb_v (ccw rig order)
    assert (obs[0]["rgb"][3] == 3).all()
    pos, ori = worker.get_pos_ori()
    assert pos.shape == (1, 3) and ori.shape == (1, 4)


def test_control_reaches_ghost_without_teleport(worker):
    worker.reset()
    target = np.array([-1.0, 0.0, -2.0])
    res = worker.step([{"act": 4, "front_pos": None, "ghost_pos": target,
                        "back_path": [(0, np.array([0.0, 0.0, -1.0]))],
                        "tryout": True}])[0]
    assert not res.done
    end = worker._env.sim.pos
    # quantized 15-deg turns + 0.25m steps land within one step of target
    assert np.linalg.norm(end - target) < 2 * FORWARD + 0.3
    assert worker._env.sim.step_calls > 4      # real micro-stepping


def test_stop_records_info(worker):
    worker.reset()
    res = worker.step([{"act": 0, "stop_pos": np.zeros(3),
                        "back_path": None, "tryout": True}])[0]
    assert res.done
    info = res.info
    assert info["steps_taken"] >= 0
    assert len(info["position"]["position"]) == len(
        info["position"]["distance"])
    assert info["position_infer"]["position"]


def test_cand_real_pos_preserves_state(worker):
    worker.reset()
    sim = worker._env.sim
    sim.pos = np.array([1.0, 0.0, 1.0])
    sim.heading = 0.4
    before_pos, before_head = sim.pos.copy(), sim.heading
    out = worker.cand_real_pos(0, [0.0, math.pi / 2], [1.0, 0.5])
    assert out.shape == (2, 3)
    np.testing.assert_allclose(sim.pos, before_pos)
    assert sim.heading == pytest.approx(before_head, abs=1e-9)
    # candidate 0: straight ahead ~1m (4 forward steps)
    assert np.linalg.norm(out[0] - before_pos) == pytest.approx(
        4 * FORWARD, abs=1e-6)


def test_tryout_recovers_from_collision(monkeypatch):
    fake = types.ModuleType("habitat")
    fake.Env = lambda config=None: _MockEnv(config, wall_z=-1.2)
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatWorkerEnv
    w = HabitatWorkerEnv(None, seed=0)
    w.reset()
    # target straight through the wall: forward collides, tryout turns
    res = w.step([{"act": 4, "front_pos": np.zeros(3),
                   "ghost_pos": np.array([0.0, 0.0, -3.0]),
                   "back_path": None, "tryout": True}])[0]
    assert not res.done
    assert w._collisions >= 1
    # tryout moved the agent off the straight-line axis
    assert abs(w._env.sim.pos[0]) > 1e-6


def test_oracles(worker):
    worker.reset()
    d = worker.current_dist_to_goal()
    assert d.shape == (1,) and d[0] == pytest.approx(5.0)
    assert worker.point_dist_to_goal(0, [0, 0, -4.0]) == pytest.approx(1.0)
    # progress-tracked subgoal: with the agent near the end of the ref
    # path, the subgoal is ref[-1] and the ghost nearest it wins
    worker._env.sim.pos = np.array([0.0, 0.0, -4.5])
    ghosts = np.array([[0.0, 0.0, -4.9], [3.0, 0.0, 3.0]])
    k = worker.ghost_dist_to_ref(0, ghosts, _EpisodeMeta.reference_path)
    assert k == 0
    # at the start, the subgoal is ref[0] so the closer-to-start ghost
    # wins instead (ndtw expert semantics, ss_trainer_ETP.py:287-301)
    worker._env.sim.pos = np.zeros(3)
    k = worker.ghost_dist_to_ref(0, ghosts, _EpisodeMeta.reference_path)
    assert k == 1


def test_episodes_allowed_filter(monkeypatch):
    fake = types.ModuleType("habitat")
    fake.Env = _MockEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatWorkerEnv
    w = HabitatWorkerEnv(None, seed=0, episodes_allowed=["9"])
    assert [e.episode_id for e in w._env.episodes] == [9]


def test_vector_pool_over_mock(monkeypatch):
    fake = types.ModuleType("habitat")
    fake.Env = _MockEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatVectorEnv
    env = HabitatVectorEnv(None, num_envs=2, scenes=["a", "b", "c"],
                           threaded=True)
    assert env.num_envs == 2
    obs = env.reset()
    assert len(obs) == 2 and obs[0]["rgb"].shape == (12, 8, 8, 3)
    pos, ori = env.get_pos_ori()
    assert pos.shape == (2, 3)
    res = env.step([{"act": 0, "stop_pos": np.zeros(3), "back_path": None,
                     "tryout": True}] * 2)
    assert all(r.done for r in res)


def test_shard_scenes_round_robin():
    from etpnav_tpu.env.habitat_adapter import shard_scenes
    shards = shard_scenes(["d", "b", "a", "c", "e"], 2)
    assert shards == [["a", "c", "e"], ["b", "d"]]
    shards = shard_scenes(["a", "b"], 4)
    assert [s[0] for s in shards] == ["a", "b", "a", "b"]
