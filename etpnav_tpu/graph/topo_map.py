"""Online topological map with incremental all-pairs shortest paths and
fixed-shape device-array emission.

Capability target: GraphMap (models/graph_utils.py:138-322) plus the padded
batch assembly the reference trainer does per step
(ss_trainer_ETP.py:344-417). Re-engineered for TPU:

- APSP is maintained *incrementally*: adding a node is O(V), adding an edge
  relaxes the dist/hops/next-hop matrices with one vectorized O(V^2) numpy
  update — replacing the reference's full networkx all-pairs Dijkstra
  recompute every step (graph_utils.py:256-257).
- `emit()` writes directly into padded (G,...) numpy arrays (one memcpy to
  device), instead of ragged tensor lists + torch pad/stack.
- Node/ghost features are tracked by *provenance* (which rollout step and
  pano token produced them) so the fine-tune learn phase can rebuild
  gmap_img_fts differentiably from recomputed pano embeddings
  (rollout-replay training; see training/finetune.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from etpnav_tpu.graph.geometry import (
    angle_features,
    estimate_candidate_positions,
    heading_from_quaternion,
    position_distance,
)

MAX_DIST = 30.0   # graph_utils.py:9
MAX_STEP = 10.0   # graph_utils.py:10
INF = 1e9


@dataclass
class Ghost:
    positions: List[np.ndarray]
    mean_pos: np.ndarray
    embed_sum: np.ndarray
    embed_cnt: int
    fronts: List[int]                      # node indices
    real_positions: List[np.ndarray]
    provenance: List[Tuple[int, int]]      # (step, token) pairs
    aug_pos: np.ndarray = None


class TopoMap:
    """Per-episode topological graph over visited nodes + ghost frontiers."""

    def __init__(self, loc_noise: float = 0.5, merge_ghost: bool = True,
                 ghost_aug: float = 0.0, track_real_pos: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.loc_noise = loc_noise
        self.merge_ghost = merge_ghost
        self.ghost_aug = ghost_aug
        self.track_real_pos = track_real_pos
        self.rng = rng or np.random.default_rng()

        # nodes (index = insertion order)
        self.node_pos: List[np.ndarray] = []
        self.node_embeds: List[np.ndarray] = []
        self.node_step: List[int] = []
        self.node_provenance: List[int] = []   # rollout step index
        self.node_stop_scores: List[float] = []

        # ghosts: ordered dict id -> Ghost (insertion order kept)
        self.ghosts: Dict[int, Ghost] = {}
        self.ghost_cnt = 0

        # APSP matrices over nodes
        self._dist = np.zeros((0, 0), np.float64)
        self._hops = np.zeros((0, 0), np.int32)    # edges on shortest path
        self._next = np.zeros((0, 0), np.int32)    # next-hop pointers
        # every edge ever added (the true graph; APSP relaxation may
        # route around an edge, but it still exists for visualization)
        self._edge_set: set = set()
        # capacity instrumentation (VERDICT r3 #5): peak raw slot count
        # ([stop]+nodes+ghosts before any emit() drop) and how many slots
        # emit() has ever had to evict to fit max_len. evicted_* staying
        # 0 proves max_gmap_len held for this episode.
        self.peak_slots = 0
        self.evicted_ghosts = 0
        self.evicted_nodes = 0

    # -- graph construction -------------------------------------------------

    @property
    def num_nodes(self) -> int:
        return len(self.node_pos)

    def _add_node_to_apsp(self):
        n = self._dist.shape[0]
        d = np.full((n + 1, n + 1), INF)
        d[:n, :n] = self._dist
        d[n, n] = 0.0
        h = np.zeros((n + 1, n + 1), np.int32)
        h[:n, :n] = self._hops
        nx = np.full((n + 1, n + 1), -1, np.int32)
        nx[:n, :n] = self._next
        nx[n, n] = n
        self._dist, self._hops, self._next = d, h, nx

    def add_edge(self, u: int, v: int, w: float):
        """Relax APSP through a new/updated edge. Native C++ core when
        available (native/topo_core.cpp), else vectorized numpy O(V^2)."""
        if u != v:
            self._edge_set.add((min(u, v), max(u, v)))
        D, H, Nx = self._dist, self._hops, self._next
        if w >= D[u, v]:
            return
        from etpnav_tpu import native
        if native.apsp_relax_edge(D, H, Nx, u, v, float(w)):
            return
        for (a, b) in ((u, v), (v, u)):
            # dist through a->b for all pairs (i, j): D[i,a] + w + D[b,j]
            cand = D[:, a][:, None] + w + D[b, :][None, :]
            better = cand < D - 1e-12
            if not better.any():
                continue
            ch = H[:, a][:, None] + 1 + H[b, :][None, :]
            # next hop: b if i == a else next[i, a]
            cn = np.broadcast_to(Nx[:, a][:, None], D.shape).copy()
            cn[a, :] = b
            D[better] = cand[better]
            H[better] = ch[better]
            Nx[better] = cn[better]

    def distance(self, u: int, v: int) -> float:
        return float(self._dist[u, v])

    def hops(self, u: int, v: int) -> int:
        return int(self._hops[u, v])

    def edge_list(self) -> List[tuple]:
        """All direct graph edges as (u, v) pairs with u < v (for
        visualization / export). This is the true edge set — an edge
        stays listed even after APSP relaxation finds a shorter
        multi-hop route through other nodes."""
        return sorted(self._edge_set)

    def path(self, u: int, v: int) -> List[int]:
        """Node indices from u to v inclusive (like nx shortest path)."""
        if u == v:
            return [u]
        if self._next[u, v] < 0:
            return []
        out = [u]
        cur = u
        while cur != v:
            cur = int(self._next[cur, v])
            out.append(cur)
        return out

    # -- localization / update ----------------------------------------------

    def _localize_node(self, pos: np.ndarray) -> Optional[int]:
        """Nearest node within loc_noise (graph_utils.py:163-175)."""
        if not self.node_pos:
            return None
        arr = np.stack(self.node_pos)
        d = np.linalg.norm(arr - pos[None], axis=1)
        i = int(np.argmin(d))
        return i if d[i] <= self.loc_noise else None

    def _localize_ghost(self, pos: np.ndarray) -> Optional[int]:
        if not self.ghosts:
            return None
        ids = list(self.ghosts.keys())
        arr = np.stack([self.ghosts[g].mean_pos for g in ids])
        d = np.linalg.norm(arr - pos[None], axis=1)
        i = int(np.argmin(d))
        return ids[i] if d[i] <= self.loc_noise else None

    def update(self, prev_node: Optional[int], step_id: int,
               cur_pos: np.ndarray, cur_ori_xyzw: np.ndarray,
               cur_embed: np.ndarray, cand_angles_ccw: np.ndarray,
               cand_distances: np.ndarray, cand_embeds: np.ndarray,
               cand_tokens: np.ndarray, rollout_step: int,
               cand_real_pos: Optional[np.ndarray] = None) -> int:
        """Register the current viewpoint and its candidate waypoints.

        Mirrors identify_node + update_graph (graph_utils.py:177-257):
        candidates that localize onto existing nodes become edges; the rest
        create or merge ghosts. Returns the current node index.
        """
        cur = self.num_nodes
        self.node_pos.append(np.asarray(cur_pos, np.float64))
        self.node_embeds.append(np.asarray(cur_embed))
        self.node_step.append(step_id)
        self.node_provenance.append(rollout_step)
        self.node_stop_scores.append(0.0)
        self._add_node_to_apsp()

        if prev_node is not None:
            self.add_edge(prev_node, cur,
                          position_distance(self.node_pos[prev_node],
                                            cur_pos))

        cand_pos = estimate_candidate_positions(
            cur_pos, cur_ori_xyzw, cand_angles_ccw, cand_distances)
        for i, cpos in enumerate(cand_pos):
            nid = self._localize_node(cpos)
            if nid is not None:
                self.add_edge(cur, nid,
                              position_distance(cur_pos,
                                                self.node_pos[nid]))
                continue
            gid = self._localize_ghost(cpos) if self.merge_ghost else None
            rp = (np.asarray(cand_real_pos[i])
                  if cand_real_pos is not None else None)
            if gid is None:
                g = Ghost(
                    positions=[cpos], mean_pos=cpos,
                    embed_sum=np.asarray(cand_embeds[i]).copy(),
                    embed_cnt=1, fronts=[cur],
                    real_positions=[rp] if rp is not None else [],
                    provenance=[(rollout_step, int(cand_tokens[i]))],
                )
                self.ghosts[self.ghost_cnt] = g
                self.ghost_cnt += 1
            else:
                g = self.ghosts[gid]
                g.positions.append(cpos)
                g.mean_pos = np.mean(g.positions, axis=0)
                g.embed_sum = g.embed_sum + np.asarray(cand_embeds[i])
                g.embed_cnt += 1
                g.fronts.append(cur)
                if rp is not None:
                    g.real_positions.append(rp)
                g.provenance.append((rollout_step, int(cand_tokens[i])))

        # ghost position augmentation (graph_utils.py:248-254)
        for g in self.ghosts.values():
            if self.ghost_aug > 0:
                noise = self.rng.normal(
                    (0, 0, 0), (self.ghost_aug, 0, self.ghost_aug), 3)
                noise = np.clip(noise, -self.ghost_aug, self.ghost_aug)
                g.aug_pos = g.mean_pos + noise
            else:
                g.aug_pos = g.mean_pos
        return cur

    def delete_ghost(self, gid: int):
        self.ghosts.pop(gid)

    def front_to_ghost(self, gid: int) -> Tuple[float, int]:
        """(distance, node) of the nearest front node to a ghost
        (graph_utils.py:259-270)."""
        g = self.ghosts[gid]
        best_d, best_f = INF, -1
        for f in g.fronts:
            d = position_distance(self.node_pos[f], g.aug_pos)
            if d < best_d:
                best_d, best_f = d, f
        return best_d, best_f

    def ghost_embed(self, gid: int) -> np.ndarray:
        g = self.ghosts[gid]
        return g.embed_sum / g.embed_cnt

    # -- padded emission -----------------------------------------------------

    def slots(self) -> List[Tuple[str, int]]:
        """Ordered gmap slots: [stop] + nodes + ghosts
        (ss_trainer_ETP.py:358)."""
        return ([("stop", -1)]
                + [("node", i) for i in range(self.num_nodes)]
                + [("ghost", g) for g in self.ghosts.keys()])

    def emit(self, cur_node: int, cur_pos: np.ndarray,
             cur_ori_xyzw: np.ndarray, max_len: int, embed_dim: int) -> dict:
        """Build padded device-ready arrays for forward_navigation.

        Returns dict with img_fts (G,Dv), step_ids (G,), pos_fts (G,7),
        mask (G,), visited (G,), pair_dists (G,G), plus `slot_list` for
        host-side action decoding. If slots overflow max_len, the
        oldest-observed ghosts are dropped (the reference grows unboundedly;
        max_gmap_len buckets keep shapes static).
        """
        slots = self.slots()
        self.peak_slots = max(self.peak_slots, len(slots))
        if len(slots) > max_len:
            n_drop = len(slots) - max_len
            ghost_ids = [g for k, g in slots if k == "ghost"]
            drop = set(ghost_ids[:n_drop])
            self.evicted_ghosts += len(drop)
            slots = [(k, i) for k, i in slots
                     if not (k == "ghost" and i in drop)]
        if len(slots) > max_len:
            # every ghost is gone and the visited nodes alone overflow
            # (one node is added per step, and nothing ties the step cap
            # to max_gmap_len — long-lived serving sessions hit this):
            # drop the oldest visited nodes, never the current one. Old
            # visited slots are -inf-masked in action scoring anyway, so
            # this only trims the planner's attention context; without it
            # the fancy-index stores below raise IndexError.
            n_drop = len(slots) - max_len
            order = sorted((self.node_step[i], i) for k, i in slots
                           if k == "node" and i != cur_node)
            drop_nodes = {i for _, i in order[:n_drop]}
            self.evicted_nodes += len(drop_nodes)
            slots = [(k, i) for k, i in slots
                     if not (k == "node" and i in drop_nodes)]
        G = max_len
        img_fts = np.zeros((G, embed_dim), np.float32)
        step_ids = np.zeros((G,), np.int32)
        pos_fts = np.zeros((G, 7), np.float32)
        mask = np.zeros((G,), bool)
        visited = np.zeros((G,), bool)
        pair = np.zeros((G, G), np.float32)

        base_heading = heading_from_quaternion(cur_ori_xyzw)
        n_slots = len(slots)
        mask[:n_slots] = True
        node_sis = [si for si, (k, _) in enumerate(slots) if k == "node"]
        node_ids = [i for k, i in slots if k == "node"]
        ghost_sis = [si for si, (k, _) in enumerate(slots) if k == "ghost"]
        ghost_ids = [i for k, i in slots if k == "ghost"]

        # "anchor" node per slot (the slot's own node, or a ghost's nearest
        # front node) + additive offset (0 / front->ghost distance):
        # shortest_dist(slot) = D[cur, anchor] + offset, and
        # pair = offset_i + D[anchor_i, anchor_j] + offset_j.
        anchors = np.zeros(n_slots, np.int64)
        offsets = np.zeros(n_slots, np.float64)
        targets = np.zeros((n_slots, 3))
        if node_sis:
            anchors[node_sis] = node_ids
            targets[node_sis] = [self.node_pos[i] for i in node_ids]
            img_fts[node_sis] = [self.node_embeds[i] for i in node_ids]
            step_ids[node_sis] = [self.node_step[i] for i in node_ids]
            visited[node_sis] = True
        extra_hops = np.zeros(n_slots, np.int64)
        if ghost_sis:
            fronts = [self.front_to_ghost(i) for i in ghost_ids]
            anchors[ghost_sis] = [fn for _, fn in fronts]
            offsets[ghost_sis] = [fd for fd, _ in fronts]
            targets[ghost_sis] = [self.ghosts[i].aug_pos for i in ghost_ids]
            img_fts[ghost_sis] = [self.ghost_embed(i) for i in ghost_ids]
            extra_hops[ghost_sis] = 1   # ghost path step = hops(front)+2

        # vectorized relative-position features (graph_utils.py:278-322):
        # heading/elevation math of rel_pos_features over all slots at once
        d3 = targets[1:n_slots] - np.asarray(cur_pos, np.float64)[None]
        xz = np.maximum(np.hypot(d3[:, 0], d3[:, 2]), 1e-8)
        xyz = np.maximum(np.linalg.norm(d3, axis=1), 1e-8)
        heads = np.arcsin(-d3[:, 0] / xz)
        heads = np.where(d3[:, 2] > 0, np.pi - heads, heads)
        heads = 2.0 * np.pi - (heads - base_heading)      # to_clock
        elevs = np.arcsin(d3[:, 2] / xyz)                 # ref quirk: dz
        headings = np.concatenate([[0.0], heads])
        elevations = np.concatenate([[0.0], elevs])
        # stop slot gets angle features of (0,0) = [0,1,0,1] and zero dist
        # features, exactly like the None entry in graph_utils.py:283-285
        pos_fts[:n_slots, :4] = angle_features(headings, elevations)
        pos_fts[1:n_slots, 4] = xyz / MAX_DIST
        sp_dist = (self._dist[cur_node, anchors[1:n_slots]]
                   + offsets[1:n_slots])
        sp_step = (self._hops[cur_node, anchors[1:n_slots]] + 1
                   + extra_hops[1:n_slots])
        pos_fts[1:n_slots, 5] = sp_dist / MAX_DIST
        pos_fts[1:n_slots, 6] = sp_step / MAX_STEP
        from etpnav_tpu import native
        block = native.pairwise_assemble(self._dist, anchors[1:],
                                         offsets[1:], MAX_DIST)
        if block is None:
            block = (offsets[1:, None] + offsets[None, 1:]
                     + self._dist[np.ix_(anchors[1:], anchors[1:])])
            np.fill_diagonal(block, 0.0)
            block = block / MAX_DIST
        pair[1:n_slots, 1:n_slots] = block

        provenance = []
        for kind, idx in slots:
            if kind == "stop":
                provenance.append(None)
            elif kind == "node":
                provenance.append(("node", self.node_provenance[idx]))
            else:
                provenance.append(("ghost", self.ghosts[idx].provenance))
        return {
            "img_fts": img_fts, "step_ids": step_ids, "pos_fts": pos_fts,
            "mask": mask, "visited": visited, "pair_dists": pair,
            "slot_list": slots, "provenance": provenance,
            "no_ghost_left": not any(k == "ghost" for k, _ in slots),
        }
