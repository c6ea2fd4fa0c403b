"""Property tests for the incremental-APSP topological map
(SURVEY.md §4: graph invariants — merge radius, APSP symmetry, pos-feature
ranges)."""

import numpy as np
import pytest

from etpnav_tpu.graph.topo_map import TopoMap, MAX_DIST
from etpnav_tpu.graph.geometry import (
    heading_from_quaternion,
    estimate_candidate_positions,
)

IDENT_Q = np.array([0.0, 0.0, 0.0, 1.0])


def _floyd_oracle(n, edges):
    d = np.full((n, n), 1e9)
    np.fill_diagonal(d, 0.0)
    for u, v, w in edges:
        d[u, v] = min(d[u, v], w)
        d[v, u] = min(d[v, u], w)
    for k in range(n):
        d = np.minimum(d, d[:, k][:, None] + d[k, :][None, :])
    return d


def test_incremental_apsp_matches_floyd(rng):
    m = TopoMap()
    n = 12
    edges = []
    for i in range(n):
        m.node_pos.append(np.zeros(3))
        m._add_node_to_apsp()
        # random edges to a few previous nodes
        for j in rng.choice(max(i, 1), size=min(i, 3), replace=False):
            w = float(rng.random() * 5 + 0.1)
            edges.append((i, int(j), w))
            m.add_edge(i, int(j), w)
    oracle = _floyd_oracle(n, edges)
    np.testing.assert_allclose(m._dist, oracle, atol=1e-9)
    # symmetry
    np.testing.assert_allclose(m._dist, m._dist.T)


def test_path_reconstruction_consistent(rng):
    m = TopoMap()
    n = 10
    adj = {}
    for i in range(n):
        m.node_pos.append(np.zeros(3))
        m._add_node_to_apsp()
        for j in rng.choice(max(i, 1), size=min(i, 2), replace=False):
            w = float(rng.random() * 3 + 0.5)
            m.add_edge(i, int(j), w)
            adj[(i, int(j))] = min(adj.get((i, int(j)), 1e9), w)
            adj[(int(j), i)] = adj[(i, int(j))]
    for u in range(n):
        for v in range(n):
            if m.distance(u, v) >= 1e8:
                continue
            p = m.path(u, v)
            assert p[0] == u and p[-1] == v
            total = sum(adj[(a, b)] for a, b in zip(p, p[1:]))
            assert total == pytest.approx(m.distance(u, v), abs=1e-9)
            assert len(p) - 1 == m.hops(u, v)


def _step(m, prev, pos, angles, dists, step_id, rollout_step, dim=8):
    return m.update(
        prev_node=prev, step_id=step_id, cur_pos=np.asarray(pos, float),
        cur_ori_xyzw=IDENT_Q, cur_embed=np.ones(dim) * step_id,
        cand_angles_ccw=np.asarray(angles, float),
        cand_distances=np.asarray(dists, float),
        cand_embeds=np.ones((len(angles), dim)),
        cand_tokens=np.arange(len(angles)), rollout_step=rollout_step)


def test_ghost_creation_and_merge():
    m = TopoMap(loc_noise=0.5, merge_ghost=True)
    # identity quaternion: heading 0; candidate at angle 0 dist 2 lands at
    # pos - (0, 0, 2)
    n0 = _step(m, None, [0, 0, 0], [0.0], [2.0], 1, 0)
    assert m.num_nodes == 1 and len(m.ghosts) == 1
    g = m.ghosts[0]
    np.testing.assert_allclose(g.mean_pos, [0, 0, -2], atol=1e-9)

    # second node near the ghost's direction sees a nearby candidate ->
    # ghost merge, not a new ghost
    n1 = _step(m, n0, [0, 0, -1], [0.0], [1.2], 2, 1)
    assert len(m.ghosts) == 1
    g = m.ghosts[0]
    assert g.embed_cnt == 2 and g.fronts == [0, 1]
    np.testing.assert_allclose(g.mean_pos, [0, 0, -2.1], atol=1e-9)

    # candidate that lands on an existing node becomes an edge, no ghost
    n2 = _step(m, n1, [0, 0, -3], [np.pi], [2.9], 3, 2)
    assert len(m.ghosts) == 1          # still only the merged one
    assert m.distance(n2, n0) <= 3.0 + 1e-9


def test_emit_padded_arrays():
    m = TopoMap(loc_noise=0.3)
    n0 = _step(m, None, [0, 0, 0], [0.0, np.pi / 2], [2.0, 1.5], 1, 0)
    n1 = _step(m, n0, [0, 0, -2], [np.pi / 4], [1.0], 2, 1)
    out = m.emit(n1, np.array([0., 0., -2.]), IDENT_Q, max_len=16,
                 embed_dim=8)
    G = 16
    assert out["img_fts"].shape == (G, 8)
    assert out["pair_dists"].shape == (G, G)
    n_slots = 1 + m.num_nodes + len(m.ghosts)
    assert out["mask"].sum() == n_slots
    assert out["visited"].sum() == m.num_nodes
    assert not out["visited"][0]
    # stop slot: angle features of zero angle + zero dist features
    np.testing.assert_allclose(out["pos_fts"][0], [0, 1, 0, 1, 0, 0, 0])
    # pair dist symmetric, zero diagonal, bounded by MAX_DIST scaling
    pd = out["pair_dists"]
    np.testing.assert_allclose(pd, pd.T)
    assert np.all(np.diag(pd) == 0)
    valid = out["mask"]
    assert np.all(pd[np.ix_(valid, valid)] < 1e8 / MAX_DIST)
    # visited node embeds come from node embeds
    np.testing.assert_allclose(out["img_fts"][1], np.ones(8) * 1)


def test_emit_overflow_drops_oldest_ghosts():
    m = TopoMap(loc_noise=0.01, merge_ghost=False)
    prev = None
    for s in range(3):
        prev = _step(m, prev, [0, 0, -2.0 * s],
                     np.linspace(0, 2 * np.pi, 5, endpoint=False),
                     [2.0] * 5, s + 1, s)
    total = 1 + m.num_nodes + len(m.ghosts)
    assert total > 10
    out = m.emit(prev, np.array([0., 0., -4.]), IDENT_Q, max_len=10,
                 embed_dim=8)
    assert out["mask"].sum() == 10
    kinds = [k for k, _ in out["slot_list"]]
    assert kinds.count("node") == m.num_nodes  # nodes are never dropped
    # remaining ghosts are the newest ones
    ghost_ids = [i for k, i in out["slot_list"] if k == "ghost"]
    all_ids = list(m.ghosts.keys())
    assert ghost_ids == all_ids[-len(ghost_ids):]


def test_emit_overflow_drops_oldest_nodes_when_nodes_alone_overflow():
    """When 1 + num_nodes exceeds max_len even with every ghost dropped
    (long-lived serving sessions / step caps above max_gmap_len), the
    oldest visited nodes are dropped — never the current node — instead
    of the fancy-index stores raising IndexError."""
    m = TopoMap(loc_noise=0.01, merge_ghost=False)
    prev = None
    for s in range(12):
        prev = _step(m, prev, [0, 0, -2.0 * s], [0.0], [2.0], s + 1, s)
    assert m.num_nodes == 12
    G = 8
    out = m.emit(prev, np.array([0., 0., -22.]), IDENT_Q, max_len=G,
                 embed_dim=8)
    assert out["mask"].sum() <= G
    node_ids = [i for k, i in out["slot_list"] if k == "node"]
    assert prev in node_ids                      # current node survives
    # the survivors are the newest nodes (plus the current one)
    steps = sorted(m.node_step[i] for i in node_ids)
    assert steps == sorted(range(13 - len(node_ids), 13))


def test_ndtw_subgoal_quirk_matches_reference():
    """utils/trajectory.ndtw_subgoal_index replicates environments.py:
    163-180 exactly, including the run-relative indexing quirk in the
    non-contiguous branch (position-1, NOT cand[position-1])."""
    from etpnav_tpu.utils.trajectory import ndtw_subgoal_index

    def ref_impl(within, progress):
        # transcription of environments.py:163-180
        circle_bool = np.asarray(within)
        if circle_bool.sum() == 0:
            return None, progress
        cand_idxes = np.where(circle_bool
                              & (np.arange(len(within)) >= progress))[0]
        if len(cand_idxes) == 0:
            return progress, progress
        compare = np.array(list(range(
            cand_idxes[0], cand_idxes[0] + len(cand_idxes)))) == cand_idxes
        if np.all(compare):
            sub_goal_idx = cand_idxes[-1]
        else:
            sub_goal_idx = np.where(compare == False)[0][0] - 1  # noqa: E712
        return int(sub_goal_idx), int(sub_goal_idx)

    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(1, 12))
        within = rng.random(n) < 0.5
        progress = int(rng.integers(0, n))
        assert ndtw_subgoal_index(within, progress) == \
            ref_impl(within, progress), (within, progress)
    # the canonical quirk case: cand = [5, 6, 9] -> ref index 1 (not 6)
    within = np.zeros(10, bool)
    within[[5, 6, 9]] = True
    assert ndtw_subgoal_index(within, 0) == (1, 1)


def test_heading_from_quaternion_basic():
    # identity: facing -z -> heading 0
    assert heading_from_quaternion(IDENT_Q) == pytest.approx(0.0)
    # 90deg rotation about y (counter-clockwise): q = (0, sin45, 0, cos45)
    q = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])
    h = heading_from_quaternion(q)
    assert h == pytest.approx(np.pi / 2, abs=1e-6) or \
        h == pytest.approx(3 * np.pi / 2, abs=1e-6)


def test_candidate_projection_matches_reference_frame():
    # heading 0 (facing -z); candidate at relative angle 0, dist d ->
    # straight ahead: z decreases (graph_utils.py:61-71)
    pos = np.array([1.0, 0.5, -1.0])
    out = estimate_candidate_positions(pos, IDENT_Q, [0.0], [2.0])
    np.testing.assert_allclose(out[0], [1.0, 0.5, -3.0], atol=1e-9)
    # relative angle pi/2 (counter-clockwise, to the left): x decreases
    out = estimate_candidate_positions(pos, IDENT_Q, [np.pi / 2], [2.0])
    np.testing.assert_allclose(out[0], [-1.0, 0.5, -1.0], atol=1e-9)


def test_no_eviction_at_reference_shapes():
    """G=96 capacity holds at reference episode shapes (VERDICT r3 #5).

    The reference lets graphs grow unboundedly (graph_utils.py:193-257,
    max_action_steps=100 vlnbert_init.py:41); we cap emitted slots at
    PLANNER.max_gmap_len. tools/exp_gmap_capacity.py measured peak demand
    of p90=60 / max=66 at production settings (T=20, K=5 candidates,
    merge+consume on, sample_ratio=0.75) and <=88 across merge/consume
    settings, so r2r/rxr configs carry max_gmap_len=96. This test pins
    the no-eviction property on a rollout at those graph shapes (tiny
    model dims — capacity dynamics depend on env geometry, the NMS
    candidate stream, the teacher and sample_ratio, not model width)."""
    import dataclasses

    import jax

    from etpnav_tpu.config import tiny_config
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.agent import JittedAgent, init_agent_params
    from etpnav_tpu.training.rollout import RolloutEngine

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        planner=dataclasses.replace(cfg.planner, max_gmap_len=96),
        il=dataclasses.replace(cfg.il, max_traj_len=20))
    assert cfg.graph.merge_ghost and cfg.graph.consume_ghost
    assert cfg.waypoint.max_predictions == 5
    envs = GeometricNavEnv(
        num_envs=4, seed=20, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    params = init_agent_params(jax.random.PRNGKey(0), cfg)
    engine = RolloutEngine(cfg, JittedAgent(cfg, params), envs, seed=0)
    for _ in range(2):
        engine.run("train", sample_ratio=0.75)
        for s in engine.last_gmap_stats:
            assert s["evicted_ghosts"] == 0 and s["evicted_nodes"] == 0, s
            assert s["peak_slots"] <= 96, s
