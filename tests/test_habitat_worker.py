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
    def __init__(self, config=None, dataset=None, wall_z=None):
        self.sim = _MockSim(wall_z=wall_z)
        if dataset is not None:
            self.episodes = list(dataset.episodes)
            self.current_episode = self.episodes[0]
        else:
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
    # progress is monotonic WITHIN an episode (environments.py:158-162):
    # teleporting back to the start keeps the near-end subgoal
    worker._env.sim.pos = np.zeros(3)
    k = worker.ghost_dist_to_ref(0, ghosts, _EpisodeMeta.reference_path)
    assert k == 0
    # a new episode resets the progress: at the start the subgoal is
    # ref[0] and the closer-to-start ghost wins (ndtw expert semantics,
    # ss_trainer_ETP.py:287-301)
    worker._env.current_episode = _EpisodeMeta2()
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


# ---------------------------------------------------------------------------
# TASK-config surgery (habitat_config.py; reference ss_trainer_ETP.py:85-123)
# ---------------------------------------------------------------------------

class _CN:
    """Minimal yacs-CN stand-in: attribute bag with defrost/freeze."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def defrost(self):
        pass

    def freeze(self):
        pass


def _mock_task_config():
    rgb = _CN(WIDTH=640, HEIGHT=480, HFOV=90, ORIENTATION=[0.0, 0.0, 0.0],
              UUID="rgb", TYPE="HabitatSimRGBSensor")
    dep = _CN(WIDTH=640, HEIGHT=480, HFOV=90, ORIENTATION=[0.0, 0.0, 0.0],
              UUID="depth", TYPE="HabitatSimDepthSensor")
    return _CN(
        SIMULATOR=_CN(RGB_SENSOR=rgb, DEPTH_SENSOR=dep,
                      AGENT_0=_CN(SENSORS=["RGB_SENSOR", "DEPTH_SENSOR"]),
                      FORWARD_STEP_SIZE=0.1, TURN_ANGLE=10,
                      HABITAT_SIM_V0=_CN(ALLOW_SLIDING=False)),
        TASK=_CN(NDTW=_CN(GT_PATH="", SPLIT=""),
                 SDTW=_CN(GT_PATH="", SPLIT="")),
        DATASET=_CN(TYPE="", SPLIT="", DATA_PATH="", SCENES_DIR=""))


def test_inject_camera_rig():
    from etpnav_tpu.env.habitat_config import inject_camera_rig
    tc = _mock_task_config()
    inject_camera_rig(tc, rgb_size=224, depth_size=256)
    sim = tc.SIMULATOR
    # 2 base + 22 injected sensors, registered on the agent
    assert len(sim.AGENT_0.SENSORS) == 24
    for v in range(1, 12):
        cam = getattr(sim, f"RGB_{v}")
        assert cam.UUID == f"rgb_{v}"
        assert cam.WIDTH == cam.HEIGHT == 224
        # ccw yaw, 30-degree increments (common/utils.py:62-67)
        assert cam.ORIENTATION[1] == pytest.approx(2 * math.pi * v / 12)
        dcam = getattr(sim, f"DEPTH_{v}")
        assert dcam.UUID == f"depth_{v}"
        assert dcam.WIDTH == dcam.HEIGHT == 256
    # distinct configs, not aliases of the base sensor
    assert sim.RGB_1 is not sim.RGB_SENSOR
    assert sim.RGB_1.ORIENTATION != sim.RGB_2.ORIENTATION
    # idempotent on the sensor list
    inject_camera_rig(tc)
    assert len(sim.AGENT_0.SENSORS) == 24


def test_make_vlnce_task_config():
    import dataclasses

    from etpnav_tpu.config import DataPathsConfig, tiny_config
    from etpnav_tpu.env.habitat_config import make_vlnce_task_config
    cfg = dataclasses.replace(
        tiny_config(),
        paths=DataPathsConfig(
            data_path="data/{split}/{split}.json.gz",
            scenes_dir="data/scene_datasets/",
            gt_path="data/{split}_gt.json.gz"))
    tc = make_vlnce_task_config(cfg, split="val_unseen",
                                base=_mock_task_config())
    assert tc.SIMULATOR.FORWARD_STEP_SIZE == 0.25
    assert tc.SIMULATOR.TURN_ANGLE == 15
    assert tc.SIMULATOR.HABITAT_SIM_V0.ALLOW_SLIDING is True
    assert tc.SIMULATOR.RGB_SENSOR.WIDTH == cfg.clip.image_size
    assert tc.SIMULATOR.DEPTH_SENSOR.WIDTH == cfg.depth.input_size
    assert len(tc.SIMULATOR.AGENT_0.SENSORS) == 24
    assert tc.DATASET.TYPE == "VLN-CE-v1"
    assert tc.DATASET.SPLIT == "val_unseen"
    assert tc.DATASET.DATA_PATH == "data/{split}/{split}.json.gz"
    assert tc.TASK.NDTW.GT_PATH == "data/{split}_gt.json.gz"
    assert tc.TASK.NDTW.SPLIT == "val_unseen"


def test_pack_obs_missing_rig_is_hard_error(worker):
    """Without the injected rig, the old code silently ran the model on
    12 copies of the forward camera; now it refuses (VERDICT r1 Weak #5)."""
    obs = {"rgb": np.zeros((8, 8, 3), np.uint8),
           "depth": np.zeros((4, 4, 1), np.float32),
           "instruction": np.arange(3)}
    with pytest.raises(KeyError, match="rig"):
        worker._pack_obs(obs)
    # one missing view is also fatal
    obs = _make_obs()
    del obs["rgb_7"]
    with pytest.raises(KeyError, match="rgb_7"):
        worker._pack_obs(obs)


# ---------------------------------------------------------------------------
# episode injection (habitat_config.EpisodeDataset; replaces the
# reference's registry-side dataset types, habitat_extensions/task.py:48)
# ---------------------------------------------------------------------------

def _framework_episodes():
    from etpnav_tpu.env.protocol import Episode
    return [Episode(episode_id=str(i), scene_id=f"scene{i % 2}",
                    instruction_tokens=np.arange(4) + i,
                    instruction_text=f"ep {i}",
                    start_position=np.zeros(3),
                    start_heading=0.25 * i,
                    goal_position=np.array([0.0, 0.0, -5.0]),
                    reference_path=[np.zeros(3),
                                    np.array([0.0, 0.0, -5.0])])
            for i in range(4)]


def test_worker_episode_injection(monkeypatch):
    fake = types.ModuleType("habitat")
    fake.Env = _MockEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatWorkerEnv
    eps = _framework_episodes()
    w = HabitatWorkerEnv(None, episodes=eps[:2], seed=0)
    assert [e.episode_id for e in w._env.episodes] == ["0", "1"]
    cur = w.current_episodes()[0]
    assert cur.instruction_text == "ep 0"
    assert cur.instruction_tokens.tolist() == [0, 1, 2, 3]
    np.testing.assert_allclose(cur.goal_position, [0.0, 0.0, -5.0])
    # start_heading is recovered from the episode's start_rotation, not
    # hardcoded (heading_to_quat/heading_from_quaternion round-trip)
    w2 = HabitatWorkerEnv(None, episodes=[eps[2]], seed=0)
    assert abs(w2.current_episodes()[0].start_heading - 0.5) < 1e-9
    # empty injection is rejected loudly
    with pytest.raises(ValueError, match="no episodes"):
        HabitatWorkerEnv(None, episodes=[], seed=0)


def test_episode_iterator_options():
    """get_episode_iterator honors habitat's ITERATOR_OPTIONS (cycle /
    shuffle / group_by_scene / seed) instead of silently replaying a
    fixed order forever."""
    import itertools

    from etpnav_tpu.env.habitat_config import EpisodeDataset
    ds = EpisodeDataset(_framework_episodes())
    n = len(ds.episodes)

    # cycle=False is finite and covers every episode exactly once
    once = list(ds.get_episode_iterator(cycle=False, shuffle=False))
    assert [e.episode_id for e in once] == sorted(
        [e.episode_id for e in ds.episodes])
    ordered = list(ds.get_episode_iterator(cycle=False, shuffle=False,
                                           group_by_scene=False))
    assert [e.episode_id for e in ordered] == [e.episode_id
                                               for e in ds.episodes]

    # shuffle reorders between epochs (deterministically under seed)
    it = ds.get_episode_iterator(cycle=True, shuffle=True, seed=3)
    epoch1 = [e.episode_id for e in itertools.islice(it, n)]
    epoch2 = [e.episode_id for e in itertools.islice(it, n)]
    assert sorted(epoch1) == sorted(epoch2)
    it_b = ds.get_episode_iterator(cycle=True, shuffle=True, seed=3)
    assert [e.episode_id for e in itertools.islice(it_b, n)] == epoch1

    # group_by_scene keeps each scene's episodes contiguous
    it = ds.get_episode_iterator(cycle=True, shuffle=True,
                                 group_by_scene=True, seed=0)
    scenes = [e.scene_id for e in itertools.islice(it, n)]
    assert len([k for k, _ in itertools.groupby(scenes)]) == len(
        set(scenes))


def test_vector_pool_episode_sharding(monkeypatch):
    fake = types.ModuleType("habitat")
    fake.Env = _MockEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatVectorEnv
    eps = _framework_episodes()          # scenes scene0:{0,2} scene1:{1,3}
    env = HabitatVectorEnv(None, num_envs=2, episodes=eps, threaded=True)
    got = [{e.episode_id for e in w._env.episodes} for w in env._envs]
    assert got == [{"0", "2"}, {"1", "3"}]      # scene-sharded, disjoint
    env = HabitatVectorEnv(None, num_envs=2, episodes=eps,
                           episodes_allowed=["1", "2"], threaded=True)
    got = [{e.episode_id for e in w._env.episodes} for w in env._envs]
    assert got == [{"2"}, {"1"}]


# ---------------------------------------------------------------------------
# legacy low-level surface (CMA/DAgger path on habitat)
# ---------------------------------------------------------------------------

def test_step_low_level_and_teacher(worker):
    worker.reset()
    sim = worker._env.sim
    # teacher: goal straight ahead -> forward
    assert worker.shortest_path_action(0) == 1
    res = worker.step_low_level([1])[0]
    assert not res.done
    assert np.linalg.norm(sim.pos - [0, 0, -FORWARD]) < 1e-9
    assert res.observation["rgb"].shape == (12, 8, 8, 3)
    # face 90 degrees left of the goal -> teacher turns right
    sim.heading = math.pi / 2
    assert worker.shortest_path_action(0) == 3
    before = sim.pos.copy()
    worker.step_low_level([3])
    np.testing.assert_allclose(worker._env.sim.pos, before)  # pure turn
    # STOP ends the episode with full info
    res = worker.step_low_level([0])[0]
    assert res.done and res.info["steps_taken"] >= 2
    # at the goal, the teacher stops
    sim.pos = np.array([0.0, 0.0, -4.9])
    assert worker.shortest_path_action(0, goal_radius=0.5) == 0


def test_dagger_cma_on_mock_habitat_pool(monkeypatch, tmp_path):
    """The legacy DAgger trainer drives the habitat worker pool
    end-to-end (collect + update) — the wiring run.py now selects when
    habitat is available (VERDICT r1 Weak #6)."""
    fake = types.ModuleType("habitat")
    fake.Env = _MockEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatVectorEnv
    from etpnav_tpu.models.cma import CMAConfig
    from etpnav_tpu.training.dagger import DaggerConfig, DaggerTrainer

    env = HabitatVectorEnv(None, num_envs=2,
                           episodes=_framework_episodes(), threaded=True)
    cfg = CMAConfig(vocab_size=64, embed_dim=16, hidden_dim=32, rgb_dim=8,
                    depth_dim=4)

    def feat(obs):
        rgb = np.stack([o["rgb"][0].mean((0, 1)) for o in obs])
        dep = np.stack([o["depth"][0].mean((0, 1)) for o in obs])
        return (np.tile(rgb, (1, 3))[:, :8].astype(np.float32),
                np.tile(dep, (1, 4))[:, :4].astype(np.float32))

    tr = DaggerTrainer(env, cfg,
                       DaggerConfig(iterations=1, episodes_per_iter=2,
                                    epochs=1, batch_size=2, max_steps=3),
                       feat, str(tmp_path / "store"), seed=0)
    losses = tr.train()
    assert np.isfinite(losses).all()
    assert len(list(tr.store)) >= 2


def test_dagger_recvlnbert_on_mock_habitat_pool(monkeypatch, tmp_path):
    """The candidate-space DAgger trainer (oracle candidate teacher via
    cand_real_pos + point_dists_to_goal) drives the habitat worker pool
    end-to-end — the production wiring when habitat is present."""
    import math

    fake = types.ModuleType("habitat")
    fake.Env = _MockEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from etpnav_tpu.env.habitat_worker import HabitatVectorEnv
    from etpnav_tpu.models.rec_vlnbert import RecVLNBertConfig
    from etpnav_tpu.training.dagger import DaggerConfig, RecVLNBertDagger

    env = HabitatVectorEnv(None, num_envs=2,
                           episodes=_framework_episodes(), threaded=True)
    cfg = RecVLNBertConfig(
        vocab_size=64, hidden=48, heads=4, intermediate=64, la_layers=2,
        vl_layers=2, max_pos=32, rgb_dim=8, depth_dim=4, angle_dim=4,
        max_cands=4, hidden_dropout=0.0, attn_dropout=0.0)
    angles = np.array([0.0, math.pi / 2, 3 * math.pi / 2])

    def candidate_fn(obs):
        B = len(obs)
        K = len(angles)
        rgb = np.tile(np.stack([o["rgb"][0].mean((0, 1)) for o in obs])
                      [:, None], (1, K, 3))[:, :, :8].astype(np.float32)
        dep = np.tile(np.stack([o["depth"][0].mean((0, 1)) for o in obs])
                      [:, None], (1, K, 4))[:, :, :4].astype(np.float32)
        ang = np.stack([np.stack([np.sin(angles), np.cos(angles),
                                  np.zeros(K), np.ones(K)], -1)] * B)
        return {"rgb": rgb, "depth": dep, "ang": ang.astype(np.float32),
                "angles": np.tile(angles, (B, 1)),
                "dists": np.full((B, K), 1.0),
                "mask": np.ones((B, K), bool)}

    tr = RecVLNBertDagger(env, cfg,
                          DaggerConfig(iterations=1, episodes_per_iter=2,
                                       epochs=1, batch_size=2,
                                       max_steps=3),
                          candidate_fn, str(tmp_path / "store"), seed=0)
    losses = tr.train()
    assert np.isfinite(losses).all()
    assert len(list(tr.store)) >= 2
