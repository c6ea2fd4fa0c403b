"""Online serving: session-based navigation inference with dynamic
batching onto fixed TPU batch slots.

The reference has no serving story — its closest surface is the
leaderboard `inference` mode (ss_trainer_ETP.py:643-756), which drives
simulators it owns. A production deployment is push-model instead: many
concurrent clients each own an episode and send observations as they
arrive. This module provides that surface over the same agent programs
the trainer uses:

- `NavSession`  - host-side per-episode state: the encoded instruction,
  the topological map, current node, step counter.
- `NavServer`   - dynamic batcher: concurrent `step()` calls are
  coalesced (up to `max_batch` or `max_wait_ms`) into ONE fused
  perceive dispatch + ONE navigation-scoring dispatch, then translated
  per-session into high-level actions.

TPU-idiomatic serving choices:
- static shapes: the device batch is always padded to `max_batch` slots
  (empty slots carry zeros and are discarded), so the compiled-program
  set is small and load-independent: one perception program, one
  navigation-scoring program per reached gmap-length bucket
  (PLANNER.gmap_len_buckets, as in eval), plus the one-off text-encoder
  program — warm these before taking traffic (first compile is tens of
  seconds on TPU);
- stepping dispatches all happen on the single batcher thread;
  `create_session` additionally dispatches the text encoder from the
  calling thread (JAX dispatch is thread-safe; through a high-latency
  device link, prefer creating sessions before traffic ramps);
- the host never blocks the device: map updates + action translation
  (the only Python logic) run between the two dispatches.

Returned actions use the env-action dict vocabulary of the rollout
engine / env layer (environments.py:436-477 semantics): act 0 = stop at
`stop_pos` (optionally walking `back_path`), act 4 = go to `ghost_pos`
via `front_pos`.
"""

from __future__ import annotations

import itertools
import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from etpnav_tpu.config import ExperimentConfig
from etpnav_tpu.graph.topo_map import TopoMap
from etpnav_tpu.training.agent import JittedAgent
from etpnav_tpu.training.rollout import _fit, _softmax, build_env_action


@dataclass
class NavSession:
    sid: int
    txt_embeds: np.ndarray          # (L, Dh) fp32
    txt_mask: np.ndarray            # (L,) bool
    gmap: TopoMap
    prev_node: Optional[int] = None
    stepk: int = 0
    done: bool = False
    in_flight: bool = False         # at most one step() per session
    history: List[dict] = field(default_factory=list)


@dataclass
class _Pending:
    session: NavSession
    rgb: np.ndarray
    depth: np.ndarray
    pos: np.ndarray
    ori: np.ndarray
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    cancelled: bool = False         # set by a timed-out/aborted caller
    claimed: bool = False           # set by the batcher once processing
                                    # is committed; guarded by server lock


class NavServer:
    """Dynamic-batching navigation service over a JittedAgent.

    Thread-safe: `create_session` / `step` / `close_session` may be
    called from any number of client threads. A single batcher thread
    owns the device.
    """

    def __init__(self, cfg: ExperimentConfig, agent: JittedAgent, *,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 max_steps: Optional[int] = None):
        self.cfg = cfg
        self.agent = agent
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.max_steps = max_steps or cfg.il.max_traj_len
        self._sessions: Dict[int, NavSession] = {}
        self._sid = itertools.count()
        self._lock = threading.Lock()
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        # observability counters (stats()); guarded by _lock
        self._steps_served = 0
        self._batches = 0
        self._failed_batches = 0
        self._thread = threading.Thread(target=self._batch_loop,
                                        daemon=True)
        self._thread.start()

    # -- session lifecycle --------------------------------------------------

    def warmup(self) -> int:
        """Compile every device program before taking traffic: the text
        encoder, the fused perception program, and one navigation-scoring
        program per gmap-length bucket (plus the full-length fallback).
        First compiles cost tens of seconds each on TPU; calling this at
        deploy time keeps them out of live request latency. Returns the
        number of programs warmed."""
        cfg = self.cfg
        Bs = self.max_batch
        L = cfg.il.max_text_len
        Dh = cfg.planner.hidden_size
        ids = np.full((1, L), cfg.planner.pad_token_id, np.int32)
        mask = np.zeros((1, L), bool)
        mask[:, 0] = True
        self.agent.encode_text(ids, mask)
        rgb = np.zeros((Bs, 12, cfg.clip.image_size, cfg.clip.image_size,
                        3), np.uint8)
        dep = np.zeros((Bs, 12, cfg.depth.input_size,
                        cfg.depth.input_size, 1), np.float32)
        self.agent.perceive(rgb, dep)
        buckets = list(cfg.planner.gmap_len_buckets or ())
        lengths = sorted({*buckets, cfg.planner.max_gmap_len})
        txt_e = np.zeros((Bs, L, Dh), np.float32)
        txt_m = np.zeros((Bs, L), bool)
        txt_m[:, 0] = True
        for G in lengths:
            gmap = {
                "img_fts": np.zeros((Bs, G, Dh), np.float32),
                "step_ids": np.zeros((Bs, G), np.int32),
                "pos_fts": np.zeros((Bs, G, 7), np.float32),
                "mask": np.zeros((Bs, G), bool),
                "visited": np.zeros((Bs, G), bool),
                "pair_dists": np.zeros((Bs, G, G), np.float32),
            }
            gmap["mask"][:, 0] = True
            self.agent.score_navigation(txt_e, txt_m, gmap)
        return 2 + len(lengths)

    def create_session(self, instruction_tokens: np.ndarray) -> int:
        """Encode the instruction (one (1, L) dispatch) and register a
        fresh episode. Returns the session id."""
        cfg = self.cfg
        ids = _fit(np.asarray(instruction_tokens), cfg.il.max_text_len,
                   cfg.planner.pad_token_id)[None]
        mask = ids != cfg.planner.pad_token_id
        embeds = np.asarray(self.agent.encode_text(ids, mask),
                            np.float32)[0]
        ses = NavSession(
            sid=next(self._sid), txt_embeds=embeds, txt_mask=mask[0],
            gmap=TopoMap(loc_noise=cfg.il.loc_noise,
                         merge_ghost=cfg.graph.merge_ghost))
        with self._lock:
            self._sessions[ses.sid] = ses
        return ses.sid

    def step(self, sid: int, rgb: np.ndarray, depth: np.ndarray,
             pos: np.ndarray, ori_xyzw: np.ndarray,
             timeout: Optional[float] = 600.0) -> dict:
        """Submit one observation; blocks until the batched result.

        rgb (12, H, W, 3) uint8 ccw views; depth (12, Hd, Wd, 1) in
        [0,1]; pos (3,) world position; ori_xyzw (4,) quaternion.
        Returns {"action": env-action dict, "done": bool, "stop_prob":
        float, "num_nodes": int, "num_ghosts": int}.

        The default timeout covers cold-start compiles (tens of seconds
        per program on TPU). At most one step may be in flight per
        session (a concurrent second call raises). On timeout the
        request is cancelled: if the batcher has not yet committed to
        processing it, it is skipped and the session stays usable; if it
        was already committed, the observation may be registered
        server-side, so the session is marked done (poisoned) — a retry
        would register the same observation twice.
        """
        if self._stop.is_set():
            raise RuntimeError("server is shut down")
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        pos = np.asarray(pos, np.float64)
        ori_xyzw = np.asarray(ori_xyzw, np.float64)
        self._validate_obs(rgb, depth, pos, ori_xyzw)
        with self._lock:
            ses = self._sessions[sid]
            if ses.done:
                raise RuntimeError(f"session {sid} already stopped")
            if ses.in_flight:
                raise RuntimeError(
                    f"session {sid} already has a step in flight")
            ses.in_flight = True
        p = _Pending(ses, rgb, depth, pos, ori_xyzw)
        try:
            self._queue.put(p)
            if not p.event.wait(timeout):
                with self._lock:
                    p.cancelled = True
                    if p.claimed:
                        # the batcher committed to this request: the map
                        # update may happen (or have happened) server-side,
                        # so a retry would double-register — enforce the
                        # fatal-timeout contract instead of relying on
                        # client discipline
                        ses.done = True
                raise TimeoutError(f"step for session {sid} timed out")
            if isinstance(p.result, Exception):
                raise p.result
            return p.result
        finally:
            with self._lock:
                ses.in_flight = False

    def _validate_obs(self, rgb: np.ndarray, depth: np.ndarray,
                      pos: np.ndarray, ori_xyzw: np.ndarray) -> None:
        """Reject malformed observations at the door, so one bad client
        can never poison the co-batched sessions (the device batch is
        sized from cfg, and everything reaching _process conforms)."""
        cfg = self.cfg
        want_rgb = (12, cfg.clip.image_size, cfg.clip.image_size, 3)
        want_dep = (12, cfg.depth.input_size, cfg.depth.input_size, 1)
        if tuple(rgb.shape) != want_rgb:
            raise ValueError(f"rgb shape {rgb.shape} != {want_rgb}")
        if tuple(depth.shape) != want_dep:
            raise ValueError(f"depth shape {depth.shape} != {want_dep}")
        if pos.shape != (3,):
            raise ValueError(f"pos shape {pos.shape} != (3,)")
        if ori_xyzw.shape != (4,):
            raise ValueError(f"ori shape {ori_xyzw.shape} != (4,)")

    def stats(self) -> dict:
        """Service counters: steps served, successful device dispatches,
        failed dispatches, mean batch occupancy (slots used / max_batch —
        the TPU-utilization proxy: the device batch is always padded to
        max_batch), live sessions, and current queue depth. Counters
        reflect SUCCESSFUL batches only — a failing dispatch poisons its
        sessions and increments failed_batches instead."""
        with self._lock:
            batches = self._batches
            steps = self._steps_served
            failed = self._failed_batches
            live = sum(1 for s in self._sessions.values() if not s.done)
        occ = steps / (batches * self.max_batch) if batches else 0.0
        return {"steps_served": steps, "batches": batches,
                "failed_batches": failed,
                "mean_occupancy": round(occ, 4),
                "live_sessions": live,
                "queue_depth": self._queue.qsize()}

    def close_session(self, sid: int) -> dict:
        with self._lock:
            if sid not in self._sessions:
                raise KeyError(f"unknown session {sid}")
            ses = self._sessions[sid]
            if ses.in_flight:
                # closing under a blocked step would hand the caller a
                # history the batcher is still appending to
                raise RuntimeError(
                    f"session {sid} already has a step in flight")
            del self._sessions[sid]
        # copy: the session object may still be referenced by telemetry;
        # the returned record must be final
        return {"steps": ses.stepk, "history": list(ses.history)}

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)
        self._drain_queue(RuntimeError("server is shut down"))

    def _drain_queue(self, exc: Exception):
        """Fail any still-queued requests promptly instead of letting
        their callers block out their full timeout."""
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                return
            if not p.event.is_set():
                p.result = exc
                p.event.set()

    # -- batcher ------------------------------------------------------------

    def _collect(self) -> List[_Pending]:
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = _now() + self.max_wait_s
        while len(batch) < self.max_batch:
            left = deadline - _now()
            if left <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=left))
            except queue.Empty:
                break
        return batch

    def _batch_loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            # claim under the lock: after this point a timed-out caller
            # knows its observation may be registered server-side (and
            # poisons its session); before it, cancellation is clean
            with self._lock:
                batch = [p for p in batch if not p.cancelled]
                for p in batch:
                    p.claimed = True
            if not batch:
                continue
            try:
                self._process(batch)
                # counters move BEFORE any client event fires: a caller
                # may read stats() the instant it unblocks
                with self._lock:
                    self._batches += 1
                    self._steps_served += len(batch)
                for p in batch:
                    p.event.set()
            except Exception as e:
                with self._lock:
                    self._failed_batches += 1
                # surface the failure to callers still waiting; their
                # sessions may already be partially updated (the map
                # update runs before scoring), so poison them — a retry
                # would register the same observation twice
                for p in batch:
                    if not p.event.is_set():
                        p.session.done = True
                        p.result = e
                        p.event.set()
        self._drain_queue(RuntimeError("server is shut down"))

    def _process(self, batch: List[_Pending]):
        """Run the two device dispatches and fill each request's result.

        Does NOT set completion events — the batcher does that after the
        service counters move, so stats() is consistent the moment a
        client unblocks."""
        cfg = self.cfg
        n = len(batch)
        Bs = self.max_batch                   # static device batch
        # sized from cfg, not from batch[0]: every request was validated
        # at step() entry, so the compiled shapes are load-independent
        rgb = np.zeros((Bs, 12, cfg.clip.image_size, cfg.clip.image_size,
                        3), np.uint8)
        dep = np.zeros((Bs, 12, cfg.depth.input_size,
                        cfg.depth.input_size, 1), np.float32)
        for i, p in enumerate(batch):
            rgb[i] = p.rgb
            dep[i] = p.depth

        # ---- dispatch 1: fused perception over the padded slots ----
        wp = self.agent.perceive(rgb, dep)
        wp_h = {k: np.asarray(wp[k]) for k in
                ("cand_valid", "cand_angles", "cand_distances")}
        pano_embeds = np.asarray(wp["pano_embeds"], np.float32)
        avg_pano = np.asarray(wp["avg_pano_embeds"], np.float32)

        # ---- host: topo-map updates + padded graph emission ----
        G = cfg.planner.max_gmap_len
        Dh = cfg.planner.hidden_size
        emits = []
        for i, p in enumerate(batch):
            ses = p.session
            valid = wp_h["cand_valid"][i]
            tok_idx = np.flatnonzero(valid)
            ses.prev_node = ses.gmap.update(
                ses.prev_node, ses.stepk + 1, p.pos, p.ori,
                avg_pano[i], wp_h["cand_angles"][i][valid],
                wp_h["cand_distances"][i][valid],
                pano_embeds[i][tok_idx], tok_idx, ses.stepk)
            ses.stepk += 1
        G_step = G
        if cfg.planner.gmap_len_buckets:
            need = max(1 + p.session.gmap.num_nodes
                       + len(p.session.gmap.ghosts) for p in batch)
            fits = [b for b in cfg.planner.gmap_len_buckets
                    if need <= b < G]
            G_step = min(fits) if fits else G
        for p in batch:
            ses = p.session
            emits.append(ses.gmap.emit(ses.prev_node, p.pos, p.ori,
                                       G_step, Dh))
        pad_emit = {k: np.zeros_like(emits[0][k])
                    for k in ("img_fts", "step_ids", "pos_fts", "mask",
                              "visited", "pair_dists")}
        gmap_batch = {
            k: np.stack([e[k] for e in emits]
                        + [pad_emit[k]] * (Bs - n))
            for k in pad_emit}
        L = cfg.il.max_text_len
        txt_e = np.zeros((Bs, L, self.cfg.planner.hidden_size),
                         np.float32)
        txt_m = np.zeros((Bs, L), bool)
        for i, p in enumerate(batch):
            txt_e[i] = p.session.txt_embeds
            txt_m[i] = p.session.txt_mask
        # empty slots need one valid token / node for finite softmax
        txt_m[n:, 0] = True
        gmap_batch["mask"][n:, 0] = True

        # ---- dispatch 2: navigation scoring ----
        nav = self.agent.score_navigation(txt_e, txt_m, gmap_batch)
        logits = np.asarray(nav["global_logits"], np.float32)[:n]
        probs = _softmax(logits)

        # ---- per-session action translation (shared with rollout) ----
        for i, p in enumerate(batch):
            ses = p.session
            gmap = ses.gmap
            gmap.node_stop_scores[ses.prev_node] = float(probs[i, 0])
            action, new_prev, is_stop, _ = build_env_action(
                cfg, gmap, emits[i], int(logits[i].argmax()),
                ses.prev_node, force_stop=ses.stepk >= self.max_steps)
            ses.prev_node = new_prev
            ses.done = is_stop
            ses.history.append({"step": ses.stepk,
                                "pos": p.pos.tolist(),
                                "stop_prob": float(probs[i, 0])})
            p.result = {"action": action, "done": ses.done,
                        "stop_prob": float(probs[i, 0]),
                        "num_nodes": gmap.num_nodes,
                        "num_ghosts": len(gmap.ghosts)}


def _now() -> float:
    import time
    return time.monotonic()
