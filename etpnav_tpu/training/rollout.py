"""Rollout engine: host-driven episode loop over jitted device programs.

Capability target: RLTrainer.rollout (ss_trainer_ETP.py:764-1057) — the
train/eval/infer episode loop — redesigned for TPU as *rollout-replay*:

1. Rollout (this file): step the envs with inference-only jitted programs
   (bf16, no activation storage), maintaining per-env TopoMaps host-side,
   and record every device input needed to replay the differentiable path:
   frozen vp token features, padded graph arrays, the linear aggregation
   matrix W mapping pano tokens -> graph node features, and teacher
   actions.
2. Learn (training/finetune.py): ONE fused jitted train step recomputes
   text/pano/navigation encoders over all recorded steps at once
   (B*T-batched, MXU-efficient) and backprops — replacing the reference's
   dynamic-graph backward through 20 sequential env-interleaved steps.

Gradient-path equivalence: in the reference, grads flow through pano
embeddings into graph node features (node = masked-average of its visit
step's tokens, ghost = running mean of observed candidate tokens,
vilmodel_cmt.py:581-615 / ss_trainer_ETP.py:362-366) — exactly the linear
map W recorded here. The frozen CLIP/depth/waypoint encoders carry no
gradient in the reference either (ss_trainer_ETP.py:484-490).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import numpy as np

from etpnav_tpu import native
from etpnav_tpu.config import ExperimentConfig
from etpnav_tpu.graph.topo_map import TopoMap
from etpnav_tpu.metrics import episode_metrics
from etpnav_tpu.training.agent import JittedAgent


@dataclasses.dataclass
class RolloutRecord:
    """Fixed-shape recording of one rollout interval for the learn phase."""
    txt_ids: np.ndarray        # (B, L)
    txt_masks: np.ndarray      # (B, L)
    vp_rgb: np.ndarray         # (B, T, P, Dr)
    vp_dep: np.ndarray         # (B, T, P, Dd)
    vp_loc: np.ndarray         # (B, T, P, 4)
    vp_nav: np.ndarray         # (B, T, P)
    vp_mask: np.ndarray        # (B, T, P)
    # Sparse aggregation record (replaces a dense (B,T,G,T*P) W matrix,
    # which grew quadratically in T — ~28 MB/interval at r2r shapes):
    # - node slots average exactly ONE step's valid tokens, so each needs
    #   only its visit-step index (-1 for stop/ghost/empty slots);
    # - ghost slots average their (step, token) provenance entries; the
    #   total entry count across all live ghosts is hard-bounded by the
    #   number of candidates ever observed <= T*max_predictions = M
    #   (each candidate either becomes an edge or appends exactly one
    #   provenance entry; deletion/overflow only removes entries).
    agg_node_step: np.ndarray  # (B, T, G) int32, -1 = not a node slot
    agg_ent_slot: np.ndarray   # (B, T, M) int32 gmap slot (0-padded)
    agg_ent_tok: np.ndarray    # (B, T, M) int32 flat token t*P+tok
    agg_ent_val: np.ndarray    # (B, T, M) f32 share weight (0 = padding)
    gmap_step_ids: np.ndarray  # (B, T, G)
    gmap_pos_fts: np.ndarray   # (B, T, G, 7)
    gmap_mask: np.ndarray      # (B, T, G)
    gmap_visited: np.ndarray   # (B, T, G)
    gmap_pair: np.ndarray      # (B, T, G, G)
    teacher: np.ndarray        # (B, T) int32, -100 = ignore
    step_valid: np.ndarray     # (B, T) bool
    logits: np.ndarray         # (B, T, G) rollout-time nav logits (debug /
                               # replay-equivalence checks)


class RolloutEngine:
    def __init__(self, cfg: ExperimentConfig, agent: JittedAgent, envs,
                 seed: int = 0):
        self.cfg = cfg
        self.agent = agent
        self.envs = envs
        self.np_rng = np.random.default_rng(seed)
        # action-sampling keys follow the trainer's PRNG impl
        # (ILConfig.rng_impl; rbg default — see finetune.py)
        self._jrng = jax.random.key(seed, impl=cfg.il.rng_impl)
        # MEASUREMENT-ONLY: a ring of pre-staged (rgb, depth) device
        # arrays. When set, perceive reads observations from HBM instead
        # of uploading the envs' host arrays each step, so a benchmark
        # can separate sim+dispatch+compute cost from host->device
        # observation transfer (on a production host the link is ~1000x
        # the axon tunnel; see bench.py train_iters_per_sec). Never set
        # in training: the recorded features would not match the envs.
        self.device_obs = None

    def _next_rng(self):
        self._jrng, sub = jax.random.split(self._jrng)
        return sub

    # ------------------------------------------------------------------ run

    def run(self, mode: str, sample_ratio: float = 0.0,
            gt_paths: Optional[Dict[str, np.ndarray]] = None,
            stat_eps: Optional[dict] = None,
            path_eps: Optional[dict] = None,
            sample_actions: bool = False,
            video_dir: Optional[str] = None) -> Optional[RolloutRecord]:
        """One interval: reset all envs, run episodes to completion.

        mode: 'train' records a RolloutRecord; 'eval' fills stat_eps with
        metrics; 'infer' fills path_eps with recorded paths.
        sample_actions: in eval/infer, sample the policy's softmax instead
        of argmax (INFERENCE.SAMPLE, ss_trainer_ETP.py:895-903).
        video_dir: in eval, write one navigator video per episode —
        pano strip over a top-down map with the topo graph (the VIDEO_DIR
        pipeline, environments.py:486-516 + utils.py:647-752).
        """
        cfg = self.cfg
        il = cfg.il
        envs = self.envs
        envs.resume_all()
        obs_list = envs.reset()
        # STATIC SHAPES (CLAUDE.md invariant): every device program in
        # this loop runs at the full pool size B for the whole interval —
        # pre-paused (already-evaluated) and finished envs ride along as
        # padding rows on their last observation / a masked zero graph.
        # Shrinking the batch per done env would (a) compile one program
        # per distinct live-count (~40 s each on TPU, per gmap bucket)
        # and (b) feed the fused NMS kernel batches Mosaic cannot block
        # (observed hard failure at 7 live envs). Rows are per-sample
        # independent, so live rows are bit-identical either way.
        B = envs.num_envs
        episodes = envs.current_episodes()         # global, length B
        live = list(range(B))          # original env-slot index per live env

        seen = (stat_eps if mode == "eval" and stat_eps is not None
                else path_eps if mode == "infer" and path_eps is not None
                else None)
        if seen is not None:
            to_pause = [i for i, ep in enumerate(episodes)
                        if ep.episode_id in seen]
            for i in reversed(to_pause):
                envs.pause_at(i)
                live.remove(i)
            if envs.num_envs == 0:
                return None
        obs_full = list(obs_list)                  # last obs per GLOBAL env
        L = il.max_text_len
        T = il.max_traj_len
        P = cfg.waypoint.max_predictions + 12
        G = cfg.planner.max_gmap_len
        Dr = cfg.planner.image_feat_size
        Dd = cfg.planner.depth_feat_size
        Dh = cfg.planner.hidden_size

        # instruction batch (extract_instruction_tokens equivalent)
        txt_ids = np.stack([
            _fit(o["instruction"], L, cfg.planner.pad_token_id)
            for o in obs_list])
        txt_masks = txt_ids != cfg.planner.pad_token_id
        txt_embeds_all = self.agent.encode_text(txt_ids, txt_masks)

        train = mode == "train"
        rec = None
        if train:
            M = T * cfg.waypoint.max_predictions
            rec = RolloutRecord(
                txt_ids=txt_ids, txt_masks=txt_masks,
                vp_rgb=np.zeros((B, T, P, Dr), np.float32),
                vp_dep=np.zeros((B, T, P, Dd), np.float32),
                vp_loc=np.zeros((B, T, P, 4), np.float32),
                vp_nav=np.zeros((B, T, P), np.int32),
                vp_mask=np.zeros((B, T, P), bool),
                agg_node_step=np.full((B, T, G), -1, np.int32),
                agg_ent_slot=np.zeros((B, T, M), np.int32),
                agg_ent_tok=np.zeros((B, T, M), np.int32),
                agg_ent_val=np.zeros((B, T, M), np.float32),
                gmap_step_ids=np.zeros((B, T, G), np.int32),
                gmap_pos_fts=np.zeros((B, T, G, 7), np.float32),
                gmap_mask=np.zeros((B, T, G), bool),
                gmap_visited=np.zeros((B, T, G), bool),
                gmap_pair=np.zeros((B, T, G, G), np.float32),
                teacher=np.full((B, T), -100, np.int32),
                step_valid=np.zeros((B, T), bool),
                logits=np.zeros((B, T, G), np.float32),
            )

        record_video = mode == "eval" and video_dir is not None
        video_frames: Dict[int, list] = {}
        video_traj: Dict[int, list] = {}

        gmaps = [TopoMap(loc_noise=il.loc_noise,
                         merge_ghost=cfg.graph.merge_ghost,
                         ghost_aug=il.ghost_aug if train else 0.0,
                         track_real_pos=train,
                         rng=self.np_rng)
                 for _ in range(B)]
        # per-env ghost real positions for the teacher (gid -> [pos])
        ghost_real: List[Dict[int, list]] = [dict() for _ in range(B)]
        prev_node = [None] * B

        for stepk in range(T):
            if self.device_obs is not None:   # measurement-only (see init)
                rgb, depth = self.device_obs[stepk % len(self.device_obs)]
            else:
                # native parallel gather (io_core) — with shm observation
                # views this is the only host copy between sim and device.
                # Full pool: padding rows re-encode their last observation.
                rgb = native.stack_arrays([o["rgb"] for o in obs_full])
                depth = native.stack_arrays([o["depth"] for o in obs_full])
                if il.depth_transport_uint16 and depth.dtype == np.float32:
                    # halve upload bytes; device side dequantizes
                    # (agent.encode_panorama)
                    depth = (np.clip(depth, 0.0, 1.0) * 65535.0
                             + 0.5).astype(np.uint16)

            # ---- fused waypoint + pano perception (ONE device dispatch) --
            sample_rng = self._next_rng() if (train and il.waypoint_aug) \
                else None
            wp = self.agent.perceive(rgb, depth, sample_rng)
            # ONE batched fetch: jax.device_get starts the device->host
            # copy of every leaf asynchronously before blocking, so the
            # 11 outputs cost ~one link round trip instead of 11 serial
            # np.asarray fetches — on a high-RTT tunnel the serial
            # version was the step's wall-clock (measured 2026-08-20:
            # ~250 s/iter with per-key fetches while bulk bandwidth
            # probed 26 MB/s idle).
            wp_h = jax.device_get(
                {k: wp[k] for k in
                 ("cand_valid", "cand_angles", "cand_distances",
                  "cand_img_idx", "rgb_fts", "dep_fts", "loc_fts",
                  "nav_types", "view_masks", "pano_embeds",
                  "avg_pano_embeds")})
            pano_embeds = np.asarray(wp_h["pano_embeds"], np.float32)
            avg_pano = np.asarray(wp_h["avg_pano_embeds"], np.float32)

            pos, ori = envs.get_pos_ori()

            # ---- update topological maps (host, live envs only) ----
            K = cfg.waypoint.max_predictions
            cand_ad = []
            for gi in live:
                valid = wp_h["cand_valid"][gi]
                cand_ad.append((wp_h["cand_angles"][gi][valid],
                                wp_h["cand_distances"][gi][valid]))
            batch_real_pos = None
            if train and hasattr(envs, "cand_real_pos_batch"):
                # one oracle fan-out for all envs (vs per-env round trips)
                batch_real_pos = envs.cand_real_pos_batch(
                    [a for a, _ in cand_ad], [d for _, d in cand_ad])
            for i, gi in enumerate(live):
                valid = wp_h["cand_valid"][gi]
                angles, dists = cand_ad[i]
                tok_idx = np.flatnonzero(valid)      # cand slot == token idx
                cand_embeds = pano_embeds[gi][tok_idx]
                real_pos = None
                if train:
                    real_pos = (batch_real_pos[i]
                                if batch_real_pos is not None
                                else envs.cand_real_pos(i, angles, dists))
                cur = gmaps[gi].update(
                    prev_node[gi], stepk + 1, pos[i], ori[i], avg_pano[gi],
                    angles, dists, cand_embeds, tok_idx, stepk,
                    cand_real_pos=real_pos)
                if train and real_pos is not None:
                    # track per-ghost real positions for the spl expert
                    # (graph_utils.py:225-246 ghost_real_pos): candidate ci
                    # has token tok_idx[ci]; ghosts record (step, token)
                    tok_to_ci = {int(t): ci
                                 for ci, t in enumerate(tok_idx)}
                    for gid, g in gmaps[gi].ghosts.items():
                        for (st, tok) in g.provenance:
                            if st == stepk and tok in tok_to_ci:
                                lst = ghost_real[gi].setdefault(gid, [])
                                lst.append(real_pos[tok_to_ci[tok]])
                prev_node[gi] = cur

            # ---- emit padded graph arrays, batch, score ----
            # eval/infer: bucket the emission length to the smallest
            # configured bucket that fits every live graph (training must
            # emit at G: the learn-phase record is one fixed-shape tensor)
            G_step = G
            if not train and cfg.planner.gmap_len_buckets:
                from etpnav_tpu.config import pick_bucket
                need = max(1 + gmaps[gi].num_nodes
                           + len(gmaps[gi].ghosts) for gi in live)
                G_step = pick_bucket(need, cfg.planner.gmap_len_buckets,
                                     G)
            emits = []
            for i, gi in enumerate(live):
                cur = prev_node[gi]
                emits.append(gmaps[gi].emit(cur, pos[i], ori[i], G_step,
                                            Dh))
            # full-pool batch: dead rows are zero graphs with one valid
            # slot so the masked softmax stays finite (serving.py pattern)
            gmap_batch = {}
            for key in ("img_fts", "step_ids", "pos_fts", "mask",
                        "visited", "pair_dists"):
                full = np.zeros((B,) + emits[0][key].shape,
                                emits[0][key].dtype)
                for i, gi in enumerate(live):
                    full[gi] = emits[i][key]
                gmap_batch[key] = full
            dead = [gi for gi in range(B) if gi not in live]
            if dead:
                gmap_batch["mask"][np.asarray(dead), 0] = True
            txt_e = txt_embeds_all
            txt_m = txt_masks
            nav = self.agent.score_navigation(txt_e, txt_m, gmap_batch)
            logits = np.asarray(nav["global_logits"], np.float32)
            probs = _softmax(logits)

            # store stop score of current node (ss_trainer_ETP.py:881-882)
            for gi in live:
                gmaps[gi].node_stop_scores[prev_node[gi]] = float(
                    probs[gi, 0])

            # ---- teacher actions (live envs) ----
            n = len(live)
            teacher = np.full(n, -100, np.int32)
            if train:
                cur_dist = envs.current_dist_to_goal()
                for i, gi in enumerate(live):
                    teacher[i] = self._teacher_action(
                        i, gi, gmaps[gi], emits[i], cur_dist[i],
                        ghost_real[gi], episodes[gi], gt_paths)

            # ---- record ----
            if train:
                for i, gi in enumerate(live):
                    rec.step_valid[gi, stepk] = True
                    rec.teacher[gi, stepk] = teacher[i]
                    rec.logits[gi, stepk] = logits[gi]
                    rec.vp_rgb[gi, stepk] = wp_h["rgb_fts"][gi]
                    rec.vp_dep[gi, stepk] = wp_h["dep_fts"][gi]
                    rec.vp_loc[gi, stepk] = wp_h["loc_fts"][gi]
                    rec.vp_nav[gi, stepk] = wp_h["nav_types"][gi]
                    rec.vp_mask[gi, stepk] = wp_h["view_masks"][gi]
                    for arr, key in ((rec.gmap_step_ids, "step_ids"),
                                     (rec.gmap_pos_fts, "pos_fts"),
                                     (rec.gmap_mask, "mask"),
                                     (rec.gmap_visited, "visited"),
                                     (rec.gmap_pair, "pair_dists")):
                        arr[gi, stepk] = emits[i][key]
                    self._fill_agg_sparse(rec, gi, stepk, emits[i], P)

            # ---- choose actions (live envs) ----
            if train:
                acts = np.empty(n, np.int64)
                for i, gi in enumerate(live):
                    if self.np_rng.random() <= sample_ratio:
                        acts[i] = teacher[i] if teacher[i] >= 0 else 0
                    else:
                        acts[i] = self.np_rng.choice(logits.shape[1],
                                                     p=probs[gi])
            elif sample_actions:
                acts = np.asarray([
                    self.np_rng.choice(logits.shape[1], p=probs[gi])
                    for gi in live])
            else:
                acts = logits[np.asarray(live)].argmax(1)

            # ---- build env actions (shared translation helper) ----
            env_actions = []
            for i, gi in enumerate(live):
                action, new_prev, _, consumed = build_env_action(
                    cfg, gmaps[gi], emits[i], int(acts[i]),
                    prev_node[gi], force_stop=stepk == T - 1)
                env_actions.append(action)
                prev_node[gi] = new_prev
                if consumed is not None:
                    ghost_real[gi].pop(consumed, None)

            if record_video:
                from etpnav_tpu.utils.visualization import \
                    navigator_video_frame
                for i, gi in enumerate(live):
                    gmap = gmaps[gi]
                    video_traj.setdefault(gi, []).append(
                        np.asarray(pos[i]))
                    gt = (np.asarray(gt_paths[episodes[gi].episode_id])
                          if gt_paths else
                          np.stack(episodes[gi].reference_path))
                    act = env_actions[i]
                    video_frames.setdefault(gi, []).append(
                        navigator_video_frame(
                            {"rgb": rgb[gi]},
                            agent_pos=pos[i],
                            trajectory=list(video_traj[gi]),
                            gt_path=list(gt), goal=gt[-1],
                            nodes=list(gmap.node_pos),
                            edges=[(gmap.node_pos[u], gmap.node_pos[v])
                                   for u, v in gmap.edge_list()],
                            predict_ghost=act.get("ghost_pos"),
                            ghosts=[g.aug_pos
                                    for g in gmap.ghosts.values()]))

            results = envs.step(env_actions)

            # ---- metrics / path recording on done ----
            done_local = [i for i, r in enumerate(results) if r.done]
            if mode == "eval" and stat_eps is not None:
                for i in done_local:
                    ep = episodes[live[i]]
                    info = results[i].info
                    if info.get("crashed"):
                        # elastic recovery ended this episode without a
                        # measure record (env/vector.py) — drop it from
                        # the stats rather than scoring a partial path
                        continue
                    gt = np.asarray(
                        gt_paths[ep.episode_id] if gt_paths else
                        np.stack(ep.reference_path))
                    stat_eps[ep.episode_id] = episode_metrics(
                        info["position"]["position"],
                        info["position"]["distance"], gt,
                        info["steps_taken"],
                        info["collisions"]["count"],
                        il.success_distance)
                    if record_video and video_frames.get(live[i]):
                        from etpnav_tpu.utils.visualization import \
                            generate_video
                        m = stat_eps[ep.episode_id]
                        generate_video(
                            video_frames.pop(live[i]), video_dir,
                            str(ep.episode_id),
                            {"spl": m["spl"], "ndtw": m["ndtw"]})
            if mode == "infer" and path_eps is not None:
                for i in done_local:
                    ep = episodes[live[i]]
                    info = results[i].info
                    if info.get("crashed"):
                        continue
                    path = [{"position": info["position_infer"]["position"][0],
                             "heading": info["position_infer"]["heading"][0],
                             "stop": False}]
                    for p, h in zip(info["position_infer"]["position"][1:],
                                    info["position_infer"]["heading"][1:]):
                        if p != path[-1]["position"]:
                            path.append({"position": p, "heading": h,
                                         "stop": False})
                    path = path[:500]
                    path[-1]["stop"] = True
                    path_eps[ep.episode_id] = {
                        "path": path, "instruction_id": ep.instruction_id}

            # ---- pause finished envs (device batch stays at B) ----
            if done_local:
                for i in reversed(done_local):
                    envs.pause_at(i)
                    live.pop(i)
                    results.pop(i)
            if envs.num_envs == 0:
                break
            for i, r in enumerate(results):
                obs_full[live[i]] = r.observation

        # graph-capacity instrumentation (VERDICT r3 #5): per-env peak raw
        # slot count and eviction totals for this interval, for
        # tools/exp_gmap_capacity.py and the no-eviction test
        self.last_gmap_stats = [
            {"peak_slots": g.peak_slots, "evicted_ghosts": g.evicted_ghosts,
             "evicted_nodes": g.evicted_nodes} for g in gmaps]
        return rec

    # ------------------------------------------------------------- helpers

    def _teacher_action(self, live_i: int, gi: int, gmap: TopoMap,
                        emit: dict, cur_dist: float,
                        ghost_real: Dict[int, list], episode,
                        gt_paths) -> int:
        """_teacher_action_new (ss_trainer_ETP.py:278-306)."""
        il = self.cfg.il
        if cur_dist < il.stop_distance:
            return 0
        if emit["no_ghost_left"]:
            return -100
        slot_of_ghost = {idx: si for si, (k, idx)
                         in enumerate(emit["slot_list"]) if k == "ghost"}
        gids = [g for g in slot_of_ghost.keys()]
        if il.expert_policy == "spl":
            dists = []
            for g in gids:
                positions = ghost_real.get(g)
                p = (positions[self.np_rng.integers(len(positions))]
                     if positions else gmap.ghosts[g].aug_pos)
                dists.append(self.envs.point_dist_to_goal(live_i, p))
            return slot_of_ghost[gids[int(np.argmin(dists))]]
        elif il.expert_policy == "ndtw":
            ref = (np.asarray(gt_paths[episode.episode_id]) if gt_paths
                   else np.stack(episode.reference_path))
            gpos = []
            for g in gids:
                positions = ghost_real.get(g)
                gpos.append(positions[self.np_rng.integers(len(positions))]
                            if positions else gmap.ghosts[g].aug_pos)
            k = self.envs.ghost_dist_to_ref(live_i, np.stack(gpos), ref)
            return slot_of_ghost[gids[int(k)]]
        raise NotImplementedError(il.expert_policy)

    def _fill_agg_sparse(self, rec: RolloutRecord, gi: int, stepk: int,
                         emit: dict, P: int):
        """Record the aggregation provenance for one step (sparse form).

        node slot: masked average over its visit-step's valid tokens
        (replay recomputes per-step token means, so one step index
        suffices); ghost slot: mean over its (step, token) provenance
        entries, one table row each.
        """
        n = 0
        M = rec.agg_ent_val.shape[2]
        for si, prov in enumerate(emit["provenance"]):
            if prov is None:
                continue
            kind, data = prov
            if kind == "node":
                rec.agg_node_step[gi, stepk, si] = data
            else:
                entries = data
                share = 1.0 / len(entries)
                if n + len(entries) > M:
                    raise AssertionError(
                        f"ghost provenance overflow: {n + len(entries)} "
                        f"entries > M={M} (bound T*max_predictions "
                        "violated — provenance accounting bug)")
                for (t, tok) in entries:
                    rec.agg_ent_slot[gi, stepk, n] = si
                    rec.agg_ent_tok[gi, stepk, n] = t * P + tok
                    rec.agg_ent_val[gi, stepk, n] = share
                    n += 1


def build_env_action(cfg, gmap: TopoMap, emit: dict, slot: int,
                     prev_node: int, *, force_stop: bool = False):
    """Translate a chosen graph slot into an env-action dict
    (environments.py:436-477 semantics) — the ONE implementation shared
    by the rollout engine and the serving layer.

    Returns (action, new_prev_node, is_stop, consumed_gid): act 0 stops
    at the best-stop-score node (walking back_path under back_algo ==
    'control'); act 4 moves to a ghost via its front node, consuming the
    ghost when GRAPH.consume_ghost. consumed_gid is the deleted ghost id
    (None otherwise) so callers can drop side state (e.g. ghost_real).
    """
    il = cfg.il
    is_stop = slot == 0 or force_stop or emit["no_ghost_left"]
    if not is_stop:
        kind, idx = emit["slot_list"][slot]
        if kind != "ghost":   # visited slots are -inf; safety
            is_stop = True
    control = il.back_algo == "control"
    if is_stop:
        stop_node = int(np.argmax(gmap.node_stop_scores))
        back_path = ([(v, gmap.node_pos[v]) for v in
                      gmap.path(prev_node, stop_node)][1:]
                     if control else None)
        action = {"act": 0, "stop_pos": gmap.node_pos[stop_node],
                  "back_path": back_path, "tryout": il.tryout}
        return action, prev_node, True, None
    gid = idx
    _, front = gmap.front_to_ghost(gid)
    back_path = ([(v, gmap.node_pos[v]) for v in
                  gmap.path(prev_node, front)][1:]
                 if control else None)
    action = {"act": 4, "front_pos": gmap.node_pos[front],
              "ghost_pos": gmap.ghosts[gid].aug_pos,
              "back_path": back_path, "tryout": il.tryout}
    consumed = None
    if cfg.graph.consume_ghost:  # MODEL.consume_ghost
        gmap.delete_ghost(gid)
        consumed = gid
    return action, front, False, consumed


def _fit(tokens: np.ndarray, max_len: int, pad_id: int) -> np.ndarray:
    out = np.full(max_len, pad_id, tokens.dtype)
    n = min(len(tokens), max_len)
    out[:n] = tokens[:n]
    return out


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=1, keepdims=True)
    e = np.exp(np.clip(x - m, -80, 0))
    e[~np.isfinite(x)] = 0.0
    s = e / np.maximum(e.sum(1, keepdims=True), 1e-12)
    return s
