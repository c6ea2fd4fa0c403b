"""Legacy DAgger trainer for the CMA low-level policy.

Capability target: vlnce_baselines/dagger_trainer.py:187-629 — beta-
scheduled DAgger: collect rollouts with an expert/policy mixture, persist
(features, teacher-action) steps to an on-disk store, then run supervised
epochs over the store — plus the simulator-replay variant
(common/recollection_dataset.py:22). The reference's lmdb+msgpack capture
(dagger_trainer.py:373-419, fp16 via forward hooks) becomes a sharded
msgpack store of the *frozen encoder features* (the same quantity its
hooks captured), written by the single trainer process.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from etpnav_tpu.models import cma
from etpnav_tpu.models.cma import CMAConfig


# ---------------------------------------------------------------------------
# feature store (lmdb replacement)
# ---------------------------------------------------------------------------

class TrajectoryStore:
    """Sharded msgpack trajectory store. One shard file per flush; values
    are dicts of float16 arrays like the reference's fp16 lmdb records
    (dagger_trainer.py:388-419)."""

    def __init__(self, path: str, flush_every: int = 64):
        import msgpack
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.flush_every = flush_every
        self._pending: List[dict] = []
        self._count = len(self.shard_files())

    def shard_files(self) -> List[str]:
        return sorted(
            os.path.join(self.path, f) for f in os.listdir(self.path)
            if f.endswith(".msg"))

    def append(self, traj: Dict[str, np.ndarray]):
        self._pending.append(
            {k: (np.asarray(v).astype(np.float16).tobytes()
                 if np.asarray(v).dtype.kind == "f"
                 else np.asarray(v).tobytes(),
                 np.asarray(v).dtype.str if np.asarray(v).dtype.kind != "f"
                 else np.dtype(np.float16).str,
                 np.asarray(v).shape) for k, v in traj.items()})
        if len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self):
        if not self._pending:
            return
        import msgpack
        fname = os.path.join(self.path, f"shard{self._count:06d}.msg")
        with open(fname, "wb") as f:
            f.write(msgpack.packb(self._pending, use_bin_type=True))
        self._count += 1
        self._pending = []

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import msgpack
        for fname in self.shard_files():
            with open(fname, "rb") as f:
                shard = msgpack.unpackb(f.read(), raw=False)
            for rec in shard:
                yield {k: np.frombuffer(buf, np.dtype(dt)).reshape(shape)
                       for k, (buf, dt, shape) in rec.items()}

    def __len__(self) -> int:
        return sum(1 for _ in self)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DaggerConfig:
    iterations: int = 3            # DAgger outer iterations
    episodes_per_iter: int = 8
    epochs: int = 2                # supervised epochs per iteration
    batch_size: int = 4
    lr: float = 2.5e-4
    p: float = 0.75                # beta = p ** iteration (dagger_trainer)
    max_steps: int = 60
    preload_size: int = 1024
    # dropout/update-key PRNG implementation (see ILConfig.rng_impl;
    # "threefry2x32" is the documented bit-exact escape hatch)
    rng_impl: str = "rbg"


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def _cma_update(params, opt_state, cfg: CMAConfig, tx, tokens, rgb, dep,
                teacher, step_mask):
    """Supervised CE over a batch of trajectories (B, T, ...)."""
    def loss_fn(params):
        instr, imask = cma.encode_instruction(params, cfg, tokens)
        B, T = teacher.shape

        def step(state, xs):
            rgb_t, dep_t = xs
            logits, state = cma.cma_step(params, cfg, instr, imask,
                                         rgb_t, dep_t, state)
            return state, logits

        _, logits = jax.lax.scan(
            step, cma.initial_state(cfg, B),
            (rgb.transpose(1, 0, 2), dep.transpose(1, 0, 2)))
        logits = logits.transpose(1, 0, 2)            # (B, T, 4)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(
            logp, teacher[..., None], axis=-1)[..., 0]
        return jnp.where(step_mask, nll, 0.0).sum() \
            / jnp.maximum(step_mask.sum(), 1)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


class DaggerTrainer:
    """beta-scheduled DAgger over the low-level action space."""

    def __init__(self, envs, cma_cfg: CMAConfig, dagger_cfg: DaggerConfig,
                 feature_fn, store_dir: str, seed: int = 0):
        """feature_fn(obs_batch) -> (rgb_feat (B, Dr), dep_feat (B, Dd)):
        typically the frozen CLIP/depth encoders pooled over the forward
        view (the reference captures these with forward hooks,
        dagger_trainer.py:255-266)."""
        self.envs = envs
        self.cfg = cma_cfg
        self.dcfg = dagger_cfg
        self.feature_fn = feature_fn
        self.store = TrajectoryStore(store_dir)
        self.params = cma.init_cma_params(jax.random.PRNGKey(seed), cma_cfg)
        self.tx = optax.adam(dagger_cfg.lr)
        self.opt_state = self.tx.init(self.params)
        self.rng = np.random.default_rng(seed)
        self._jit_step = jax.jit(functools.partial(cma.cma_step, cfg=cma_cfg))
        self._jit_instr = jax.jit(functools.partial(cma.encode_instruction,
                                                    cfg=cma_cfg))

    # ---- collection (dagger_trainer.py:233-419) ----

    def collect(self, beta: float, episodes: int):
        envs = self.envs
        collected = 0
        while collected < episodes:
            envs.resume_all()
            obs = envs.reset()
            B = envs.num_envs
            tokens = np.stack([o["instruction"] for o in obs])
            instr, imask = self._jit_instr(self.params, tokens=tokens)
            state = cma.initial_state(self.cfg, B)
            trajs = [dict(tokens=tokens[i], rgb=[], dep=[], teacher=[])
                     for i in range(B)]
            # static shapes (CLAUDE.md invariant): the device batch stays
            # at B for the whole interval. Finished envs keep their last
            # observation as a padding row (recurrent rows are
            # per-sample-independent, so live rows are unaffected) —
            # shrinking the batch per done env would compile one program
            # per distinct live-count (~40 s each on TPU).
            live = list(range(B))            # global env id per live slot
            obs_full = list(obs)             # last obs per GLOBAL env

            for _ in range(self.dcfg.max_steps):
                rgb_f, dep_f = self.feature_fn(obs_full)       # (B, D)
                teach_full = np.zeros(B, np.int64)
                for i, g in enumerate(live):
                    teach_full[g] = envs.shortest_path_action(i)
                logits, state = self._jit_step(
                    self.params, instr_feats=instr, instr_mask=imask,
                    rgb_feat=jnp.asarray(rgb_f),
                    dep_feat=jnp.asarray(dep_f), state=state)
                probs = np.asarray(jax.nn.softmax(logits, -1))
                acts_full = np.where(
                    self.rng.random(B) < beta, teach_full,
                    np.array([self.rng.choice(4, p=probs[g])
                              for g in range(B)]))
                for g in live:
                    t = trajs[g]
                    t["rgb"].append(rgb_f[g])
                    t["dep"].append(dep_f[g])
                    t["teacher"].append(int(teach_full[g]))
                results = envs.step_low_level(
                    [int(acts_full[g]) for g in live])
                done_local = [i for i, r in enumerate(results) if r.done]
                for i in done_local:
                    if results[i].info.get("crashed"):
                        # partial trajectory from a dead worker — drop it
                        # from the store (same policy as rollout/eval)
                        trajs[live[i]]["crashed"] = True
                for i in reversed(done_local):
                    envs.pause_at(i)
                    live.pop(i)
                    results.pop(i)
                if envs.num_envs == 0:
                    break
                for i, r in enumerate(results):
                    obs_full[live[i]] = r.observation

            for t in trajs:
                if t["rgb"] and not t.get("crashed"):
                    self.store.append({
                        "tokens": t["tokens"],
                        "rgb": np.stack(t["rgb"]),
                        "dep": np.stack(t["dep"]),
                        "teacher": np.asarray(t["teacher"], np.int32),
                    })
                    collected += 1
        self.store.flush()

    # ---- supervised update (dagger_trainer.py:421-533) ----

    def update(self, epochs: Optional[int] = None) -> float:
        epochs = epochs or self.dcfg.epochs
        trajs = list(self.store)
        if not trajs:
            return float("nan")
        T = max(len(t["teacher"]) for t in trajs)
        losses = []
        for _ in range(epochs):
            order = self.rng.permutation(len(trajs))
            for s in range(0, len(order), self.dcfg.batch_size):
                batch = [trajs[i] for i in order[s:s + self.dcfg.batch_size]]
                # static shapes: pad the final partial batch to the full
                # batch size with duplicate rows whose step masks are
                # cleared, so _cma_update compiles exactly once per T
                n_real = len(batch)
                B = self.dcfg.batch_size
                batch = batch + [batch[-1]] * (B - n_real)
                tokens = np.stack([b["tokens"] for b in batch])
                rgb = np.zeros((B, T, batch[0]["rgb"].shape[-1]),
                               np.float32)
                dep = np.zeros((B, T, batch[0]["dep"].shape[-1]),
                               np.float32)
                teach = np.zeros((B, T), np.int32)
                mask = np.zeros((B, T), bool)
                for i, b in enumerate(batch):
                    n = len(b["teacher"])
                    rgb[i, :n] = b["rgb"]
                    dep[i, :n] = b["dep"]
                    teach[i, :n] = b["teacher"]
                    mask[i, :n] = True
                mask[n_real:] = False        # padding rows carry no loss
                self.params, self.opt_state, loss = _cma_update(
                    self.params, self.opt_state, self.cfg, self.tx,
                    jnp.asarray(tokens), jnp.asarray(rgb),
                    jnp.asarray(dep), jnp.asarray(teach),
                    jnp.asarray(mask))
                losses.append(float(loss))
        return float(np.mean(losses))

    def train(self) -> List[float]:
        """DAgger outer loop: beta = p ** iteration
        (dagger_trainer.py:535-629)."""
        losses = []
        for it in range(self.dcfg.iterations):
            beta = self.dcfg.p ** it
            self.collect(beta, self.dcfg.episodes_per_iter)
            losses.append(self.update())
        return losses


class RecVLNBertDagger:
    """DAgger over the waypoint-candidate action space, driving the
    recurrent VLN-BERT policy (models/rec_vlnbert.py).

    Capability target: the reference dagger_trainer's candidate-space
    path — mode='language' once, then per step mode='waypoint' candidates
    + mode='navigation' logits with an oracle candidate teacher
    (dagger_trainer.py:247-302, oracle via cand_real_pos + dist-to-goal,
    environments.py:121-143,241-260). Candidate slot 0 is STOP (teacher
    picks it inside the stop-trigger radius, ss_trainer_ETP.py:283
    semantics); motion slots execute as act-4 teleport steps.

    candidate_fn(obs) -> dict with numpy arrays:
      rgb (B, K-1, rgb_dim), depth (B, K-1, depth_dim),
      ang (B, K-1, 4) [sin/cos heading, sin/cos elevation],
      angles (B, K-1) ccw radians, dists (B, K-1) meters,
      mask (B, K-1) valid slots
    — in production the waypoint predictor's NMS output; tests use a
    cheap geometric proposer.
    """

    STOP_TRIGGER_M = 1.5

    def __init__(self, envs, cfg, dagger_cfg: DaggerConfig, candidate_fn,
                 store_dir: str, seed: int = 0):
        from etpnav_tpu.models import rec_vlnbert as rvb
        self.rvb = rvb
        self.envs = envs
        self.cfg = cfg
        self.dcfg = dagger_cfg
        self.candidate_fn = candidate_fn
        self.store = TrajectoryStore(store_dir)
        self.params = rvb.init_params(jax.random.PRNGKey(seed), cfg)
        self.tx = optax.adam(dagger_cfg.lr)
        self.opt_state = self.tx.init(self.params)
        self.rng = np.random.default_rng(seed)
        self._jit_lang = jax.jit(functools.partial(
            rvb.encode_language, cfg=cfg))
        self._jit_nav = jax.jit(functools.partial(rvb.nav_step, cfg=cfg))

        @functools.partial(jax.jit, static_argnames=())
        def _update(params, opt_state, tokens, lmask, rgb, dep, ang,
                    cmask, teacher, smask, rng):
            loss, grads = jax.value_and_grad(rvb.sequence_nll)(
                params, cfg, tokens, lmask, rgb, dep, ang, cmask,
                teacher, smask, rng=rng, train=True)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        self._jit_update = _update
        # rbg dropout keys by default (see ILConfig.rng_impl: ~16% of a
        # train step is threefry mask generation on TPU; statistically
        # equivalent). DaggerConfig.rng_impl keeps the threefry escape
        # hatch working here too.
        self._update_key = jax.random.key(seed + 1, impl=dagger_cfg.rng_impl)

    @staticmethod
    def _env_action(a: int, pos_i, tgt):
        """Candidate index -> env-layer action dict (act 0 stop / act 4
        teleport-to-candidate; environments.py:436-477 semantics)."""
        if a == 0:
            return {"act": 0, "stop_pos": pos_i, "back_path": None}
        return {"act": 4, "front_pos": pos_i, "ghost_pos": tgt,
                "back_path": None}

    def _assemble_slots(self, cand):
        """Prepend the STOP slot (zero features, always valid)."""
        B = cand["rgb"].shape[0]
        z = lambda a: np.concatenate(
            [np.zeros((B, 1) + a.shape[2:], a.dtype), a], axis=1)
        rgb, dep, ang = z(cand["rgb"]), z(cand["depth"]), z(cand["ang"])
        mask = np.concatenate(
            [np.ones((B, 1), bool), cand["mask"]], axis=1)
        return rgb, dep, ang, mask

    def _teacher(self, cand):
        """Oracle candidate index per live env: STOP inside the trigger
        radius, STOP when no motion candidate is valid, else the
        candidate whose simulated endpoint is geodesically closest to
        the goal (dagger_trainer.py:210-230). Returns (teach (n,),
        all_pos: per-env (K, 3) simulated endpoints) so callers reuse
        the simulation instead of re-querying. Candidate simulation is
        ONE fan-out (cand_real_pos_batch) and goal distances one oracle
        call per env (point_dists_to_goal) — not per candidate."""
        envs = self.envs
        n = envs.num_envs
        cur = envs.current_dist_to_goal()
        if hasattr(envs, "cand_real_pos_batch"):
            all_pos = envs.cand_real_pos_batch(
                [cand["angles"][i] for i in range(n)],
                [cand["dists"][i] for i in range(n)])
        else:
            all_pos = [envs.cand_real_pos(i, cand["angles"][i],
                                          cand["dists"][i])
                       for i in range(n)]
        teach = np.zeros(n, np.int64)
        for i in range(n):
            if cur[i] < self.STOP_TRIGGER_M:
                continue                       # STOP slot 0
            valid = np.flatnonzero(cand["mask"][i])
            if valid.size == 0:
                continue                       # nowhere to go -> STOP
            dg = envs.point_dists_to_goal(i, all_pos[i][valid])
            teach[i] = 1 + valid[int(np.argmin(dg))]
        return teach, all_pos

    def collect(self, beta: float, episodes: int):
        envs, rvb = self.envs, self.rvb
        collected = 0
        while collected < episodes:
            envs.resume_all()
            obs = envs.reset()
            B = envs.num_envs
            tokens = np.stack([o["instruction"] for o in obs])
            lmask = tokens != self.cfg.pad_token_id
            state, feats = self._jit_lang(
                self.params, tokens=jnp.asarray(tokens),
                mask=jnp.asarray(lmask))
            trajs = [dict(tokens=tokens[i], rgb=[], dep=[], ang=[],
                          cmask=[], teacher=[]) for i in range(B)]
            # static shapes (CLAUDE.md invariant): candidate extraction
            # and nav step run at fixed B the whole interval; finished
            # envs keep their last observation as a padding row.
            # Teacher/env queries are live-only (the pool reindexes
            # after pause_at).
            live = list(range(B))            # global env id per live slot
            obs_full = list(obs)             # last obs per GLOBAL env

            for _ in range(self.dcfg.max_steps):
                cand = self.candidate_fn(obs_full)             # (B, ...)
                rgb, dep, ang, cmask = self._assemble_slots(cand)
                cand_live = {
                    k: (v[np.asarray(live)] if isinstance(v, np.ndarray)
                        else [v[g] for g in live])
                    for k, v in cand.items()}
                teach_live, cand_pos = self._teacher(cand_live)
                logits, state = self._jit_nav(
                    self.params, state=state,
                    lang_feats=feats, lang_mask=jnp.asarray(lmask),
                    cand_rgb=jnp.asarray(rgb, jnp.float32),
                    cand_depth=jnp.asarray(dep, jnp.float32),
                    cand_dir=jnp.asarray(ang, jnp.float32),
                    cand_mask=jnp.asarray(cmask))
                policy_act = np.asarray(jnp.argmax(logits, -1))
                mix = self.rng.random(B) < beta
                acts = [int(teach_live[i]) if mix[g]
                        else int(policy_act[g])
                        for i, g in enumerate(live)]
                for i, g in enumerate(live):
                    t = trajs[g]
                    t["rgb"].append(rgb[g])
                    t["dep"].append(dep[g])
                    t["ang"].append(ang[g])
                    t["cmask"].append(cmask[g])
                    t["teacher"].append(int(teach_live[i]))
                pos, _ = envs.get_pos_ori()
                env_actions = [
                    self._env_action(a, pos[i],
                                     cand_pos[i][a - 1] if a else None)
                    for i, a in enumerate(acts)]
                results = envs.step(env_actions)
                done_local = [i for i, r in enumerate(results) if r.done]
                for i in done_local:
                    if results[i].info.get("crashed"):
                        # partial trajectory from a dead worker — drop it
                        # from the store (same policy as rollout/eval)
                        trajs[live[i]]["crashed"] = True
                for i in reversed(done_local):
                    envs.pause_at(i)
                    live.pop(i)
                    results.pop(i)
                if envs.num_envs == 0:
                    break
                for i, r in enumerate(results):
                    obs_full[live[i]] = r.observation

            for t in trajs:
                if t["teacher"] and not t.get("crashed"):
                    self.store.append({
                        "tokens": t["tokens"],
                        "rgb": np.stack(t["rgb"]),
                        "dep": np.stack(t["dep"]),
                        "ang": np.stack(t["ang"]),
                        "cmask": np.stack(t["cmask"]),
                        "teacher": np.asarray(t["teacher"], np.int32),
                    })
                    collected += 1
        self.store.flush()

    def update(self, epochs: Optional[int] = None) -> float:
        epochs = epochs or self.dcfg.epochs
        trajs = list(self.store)
        if not trajs:
            return float("nan")
        T = max(len(t["teacher"]) for t in trajs)
        K = trajs[0]["rgb"].shape[1]
        losses = []
        for _ in range(epochs):
            order = self.rng.permutation(len(trajs))
            for s in range(0, len(order), self.dcfg.batch_size):
                batch = [trajs[i] for i in order[s:s + self.dcfg.batch_size]]
                # static shapes: token width from the whole store (one
                # value per update() call) and the final partial batch
                # padded to full size with masked duplicate rows — one
                # compiled (B, Lmax, T) shape instead of one per
                # (partial-B, per-batch-Lmax) combination
                n_real = len(batch)
                B = self.dcfg.batch_size
                batch = batch + [batch[-1]] * (B - n_real)
                Lmax = max(len(t["tokens"]) for t in trajs)
                tokens = np.full((B, Lmax), self.cfg.pad_token_id,
                                 np.int64)
                rgb = np.zeros((B, T, K, self.cfg.rgb_dim), np.float32)
                dep = np.zeros((B, T, K, self.cfg.depth_dim), np.float32)
                ang = np.zeros((B, T, K, self.cfg.angle_dim), np.float32)
                cmask = np.zeros((B, T, K), bool)
                teach = np.zeros((B, T), np.int32)
                smask = np.zeros((B, T), bool)
                for i, b in enumerate(batch):
                    n = len(b["teacher"])
                    tokens[i, :len(b["tokens"])] = b["tokens"]
                    rgb[i, :n] = b["rgb"]
                    dep[i, :n] = b["dep"]
                    ang[i, :n] = b["ang"]
                    cmask[i, :n] = b["cmask"]
                    teach[i, :n] = b["teacher"]
                    smask[i, :n] = True
                smask[n_real:] = False       # padding rows carry no loss
                # padded steps need >=1 valid candidate slot for a finite
                # log-softmax (their loss rows are masked out anyway)
                cmask[:, :, 0] = True
                self._update_key, key = jax.random.split(self._update_key)
                self.params, self.opt_state, loss = self._jit_update(
                    self.params, self.opt_state, jnp.asarray(tokens),
                    jnp.asarray(tokens != self.cfg.pad_token_id),
                    jnp.asarray(rgb), jnp.asarray(dep), jnp.asarray(ang),
                    jnp.asarray(cmask), jnp.asarray(teach),
                    jnp.asarray(smask), key)
                losses.append(float(loss))
        return float(np.mean(losses))

    def train(self) -> List[float]:
        """beta = p ** iteration (dagger_trainer.py:535-629)."""
        losses = []
        for it in range(self.dcfg.iterations):
            beta = self.dcfg.p ** it
            self.collect(beta, self.dcfg.episodes_per_iter)
            losses.append(self.update())
        return losses

    def evaluate(self, episodes: int,
                 success_distance: float = 3.0) -> dict:
        """Greedy-policy eval with SR/SPL/nDTW over env-side measures —
        the legacy path's eval mode (base_il_trainer.py:774-889 drives
        the same rollout with metric collection)."""
        from etpnav_tpu.metrics import aggregate, episode_metrics
        envs, rvb = self.envs, self.rvb
        stats: dict = {}
        guard = 0
        while len(stats) < episodes and guard < 10 * episodes:
            guard += 1
            envs.resume_all()
            obs = envs.reset()
            B = envs.num_envs
            eps = envs.current_episodes()
            tokens = np.stack([o["instruction"] for o in obs])
            lmask = tokens != self.cfg.pad_token_id
            state, feats = self._jit_lang(
                self.params, tokens=jnp.asarray(tokens),
                mask=jnp.asarray(lmask))
            # static shapes: fixed-B nav program, finished envs ride as
            # padding rows on their last observation (same pattern as
            # collect above)
            live = list(range(B))
            obs_full = list(obs)
            for stepk in range(self.dcfg.max_steps):
                cand = self.candidate_fn(obs_full)             # (B, ...)
                rgb, dep, ang, cmask = self._assemble_slots(cand)
                logits, state = self._jit_nav(
                    self.params, state=state,
                    lang_feats=feats, lang_mask=jnp.asarray(lmask),
                    cand_rgb=jnp.asarray(rgb, jnp.float32),
                    cand_depth=jnp.asarray(dep, jnp.float32),
                    cand_dir=jnp.asarray(ang, jnp.float32),
                    cand_mask=jnp.asarray(cmask))
                # np.array (copy): np.asarray of a jax array is read-only
                acts = np.array(jnp.argmax(logits, -1))
                if stepk == self.dcfg.max_steps - 1:
                    # forced stop at the step cap so every episode is
                    # SCORED, not silently dropped (the main eval
                    # rollout does the same, rollout.py force_stop)
                    acts[:] = 0
                # simulate only the CHOSEN candidate per moving env (the
                # teacher needs all endpoints; greedy eval does not)
                pos, _ = envs.get_pos_ori()
                env_actions = []
                for i, g in enumerate(live):
                    a = int(acts[g])
                    env_actions.append(self._env_action(
                        a, pos[i],
                        envs.cand_real_pos(
                            i, [cand["angles"][g][a - 1]],
                            [cand["dists"][g][a - 1]])[0] if a else None))
                results = envs.step(env_actions)
                done_local = [i for i, r in enumerate(results) if r.done]
                for i in done_local:
                    info = results[i].info
                    if info.get("crashed"):
                        continue
                    ep = eps[live[i]]
                    stats[ep.episode_id] = episode_metrics(
                        info["position"]["position"],
                        info["position"]["distance"],
                        np.stack(ep.reference_path),
                        info["steps_taken"],
                        info["collisions"]["count"], success_distance)
                for i in reversed(done_local):
                    envs.pause_at(i)
                    live.pop(i)
                    results.pop(i)
                if envs.num_envs == 0:
                    break
                for i, r in enumerate(results):
                    obs_full[live[i]] = r.observation
        return aggregate(stats)


class TeacherRecollectionSampler:
    """Simulator-replay alternative to the disk store
    (common/recollection_dataset.py:22-297): regenerates teacher
    trajectories on the fly, no persistence."""

    def __init__(self, envs, feature_fn, max_steps: int = 60):
        self.envs = envs
        self.feature_fn = feature_fn
        self.max_steps = max_steps

    def __iter__(self):
        while True:
            self.envs.resume_all()
            obs = self.envs.reset()
            B = self.envs.num_envs
            trajs = [dict(tokens=o["instruction"], rgb=[], dep=[],
                          teacher=[]) for o in obs]
            # static shapes: feature extraction stays at fixed B (see the
            # collect loops above); finished envs ride as padding rows
            live = list(range(B))
            obs_full = list(obs)
            for _ in range(self.max_steps):
                rgb_f, dep_f = self.feature_fn(obs_full)       # (B, D)
                teach = [self.envs.shortest_path_action(i)
                         for i in range(self.envs.num_envs)]
                for i, g in enumerate(live):
                    t = trajs[g]
                    t["rgb"].append(rgb_f[g])
                    t["dep"].append(dep_f[g])
                    t["teacher"].append(teach[i])
                results = self.envs.step_low_level(teach)
                done = [i for i, r in enumerate(results) if r.done]
                for i in reversed(done):
                    self.envs.pause_at(i)
                    live.pop(i)
                    results.pop(i)
                if self.envs.num_envs == 0:
                    break
                for i, r in enumerate(results):
                    obs_full[live[i]] = r.observation
            for t in trajs:
                if t["rgb"]:
                    yield {
                        "tokens": np.asarray(t["tokens"]),
                        "rgb": np.stack(t["rgb"]),
                        "dep": np.stack(t["dep"]),
                        "teacher": np.asarray(t["teacher"], np.int32),
                    }
