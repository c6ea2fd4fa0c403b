"""Schedule-sampling IL fine-tune trainer (SS-ETP equivalent).

Capability target: RLTrainer (ss_trainer_ETP.py:60-756) — train / eval /
inference over the rollout loop — with the TPU rollout-replay design:

- rollout (training/rollout.py) records one interval of frozen features +
  graph assembly + teacher actions;
- `learn_step` below replays the differentiable path in ONE jitted program:
  text encoder + pano encoder over all (B*T) steps at once + navigation
  encoder over all steps at once, cross-entropy against teacher actions
  (ignore -100, normalized by total live steps like
  ss_trainer_ETP.py:892,1054-1056), AdamW update on planner params only
  (the reference freezes CLIP/depth/waypoint too).

bf16 activations; fp32 params and optimizer state; no loss scaling needed
(TPU-native replacement for torch.cuda.amp GradScaler,
ss_trainer_ETP.py:463,502-506).
"""

from __future__ import annotations

import functools
import json
import os
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from etpnav_tpu.config import ExperimentConfig
from etpnav_tpu.config import pick_bucket as _pick_bucket
from etpnav_tpu.metrics import aggregate
from etpnav_tpu.ops.basic import maybe_dropout
from etpnav_tpu.models import planner
from etpnav_tpu.training.agent import AgentParams, JittedAgent, \
    init_agent_params
from etpnav_tpu.training.rollout import RolloutEngine, RolloutRecord


def dense_w_from_sparse(batch: dict, P: int) -> jax.Array:
    """Rebuild the dense (B, T, G, S=T*P) aggregation matrix on device
    from the sparse provenance record (IL.agg_dense_device).

    Same math as the sparse path in replay_logits: node slots average
    their visit-step's valid tokens, ghost slots sum weighted provenance
    entries. W depends on record DATA only, so no gradient flows through
    the scatter below — the win is that the replay's d(pano tokens)
    becomes the einsum transpose (one MXU matmul) instead of the gather
    path's scatter-add."""
    node_step = batch["agg_node_step"]                      # (B, T, G)
    B, T, G = node_step.shape
    S = T * P
    vmask = batch["vp_mask"] & batch["step_valid"][..., None]   # (B,T,P)
    cnt = jnp.maximum(vmask.sum(-1), 1).astype(jnp.float32)
    shares = vmask.astype(jnp.float32) / cnt[..., None]     # (B, T, P)
    # M_s[b, u, t*P+p] = (u == t) * shares[b, t, p]: step u's token
    # shares spread at its flat positions (block-diagonal over steps)
    eye_t = jnp.eye(T, dtype=jnp.float32)
    m_s = (eye_t[None, :, :, None] * shares[:, None]).reshape(B, T, S)
    node_oh = (node_step[..., None]
               == jnp.arange(T, dtype=jnp.int32)).astype(jnp.float32)
    w_node = jnp.einsum("btgu,bus->btgs", node_oh, m_s)
    # ghost entries: scatter the scalar share weights at (slot, tok)
    # (padding entries carry val=0 — they add zero at slot 0 / tok 0)
    flat_idx = (batch["agg_ent_slot"].astype(jnp.int32) * S
                + batch["agg_ent_tok"].astype(jnp.int32))   # (B, T, M)
    w_ghost = jnp.zeros((B, T, G * S), jnp.float32)
    w_ghost = w_ghost.at[
        jnp.arange(B)[:, None, None], jnp.arange(T)[None, :, None],
        flat_idx].add(batch["agg_ent_val"].astype(jnp.float32))
    return w_node + w_ghost.reshape(B, T, G, S)


def apply_il_runtime_flags(cfg: ExperimentConfig):
    """Set the module-global compute-path switches the IL config
    carries (dropout mask repr, bf16 attention-probs chain). Called by
    FinetuneTrainer.__init__ and by every harness that jits
    compute_il_loss directly (bench.py, tools/exp_*), so measurements
    always run the production configuration."""
    from etpnav_tpu.ops import attention as _attn
    from etpnav_tpu.ops import basic as _basic
    _basic.DROPOUT_BITS8 = cfg.il.dropout_bits8
    _attn.PROBS_BF16 = cfg.il.attn_probs_bf16


def replay_logits(planner_params: dict, cfg: ExperimentConfig,
                  batch: dict, rng: Optional[jax.Array] = None,
                  train: bool = True) -> jax.Array:
    """Differentiable replay of the rollout's decision path over all
    recorded steps at once: txt encoder -> pano encoder -> (linear
    aggregation W) -> nav encoder -> (B, T, G) logits. With train=False
    and the same params this reproduces the rollout-time logits exactly
    (modulo dropout), which tests assert."""
    p = cfg.planner
    G_replay = batch["gmap_mask"].shape[2]
    if (cfg.il.remat_nav and not p.remat_scan
            and G_replay >= cfg.il.remat_nav_min_gmap):
        # learn-path-only, big-bucket-only: rollout/serving keep the
        # plain forward (remat is inert there anyway — it only changes
        # what backward saves), and the small replay buckets fit HBM
        # without paying the recompute (config.py remat_nav docs).
        import dataclasses as _dc
        p = _dc.replace(p, remat_scan=True)
    B, T, P = batch["vp_rgb"].shape[:3]
    G = batch["gmap_mask"].shape[2]
    if rng is not None:
        r_txt, r_pano, r_nav, r_drop = jax.random.split(rng, 4)
    else:
        r_txt = r_pano = r_nav = r_drop = None

    txt = planner.forward_txt(planner_params, p, batch["txt_ids"],
                              batch["txt_masks"], rng=r_txt, train=train)

    # drop_env on rgb features (Policy_ViewSelection_ETP.py:102,345)
    rgb = maybe_dropout(batch["vp_rgb"], 0.4, r_drop, train)

    def pano_fwd(params, rgb_, dep_, loc_, nav_, mask_, rng_):
        return planner.forward_panorama(params, p, rgb_, dep_, loc_, nav_,
                                        mask_, rng=rng_, train=train)
    if cfg.il.remat:
        # rematerialize pano activations in backward: trades FLOPs for the
        # (B*T, P, D) activation memory of the biggest fan-out
        pano_fwd = jax.checkpoint(pano_fwd)
    pano_embeds, _ = pano_fwd(
        planner_params,
        rgb.reshape(B * T, P, -1),
        batch["vp_dep"].reshape(B * T, P, -1),
        batch["vp_loc"].reshape(B * T, P, -1),
        batch["vp_nav"].reshape(B * T, P),
        batch["vp_mask"].reshape(B * T, P),
        r_pano)
    pano_flat = pano_embeds.reshape(B, T * P, -1)
    # zero tokens of invalid steps so aggregation only sees real data
    step_tok_mask = jnp.repeat(batch["step_valid"], P, axis=1)  # (B, T*P)
    pano_flat = pano_flat * step_tok_mask[..., None]

    if "agg_w" in batch:
        # legacy dense (B,T,G,T*P) aggregation matrix: one MXU matmul
        gmap_img = jnp.einsum(
            "btgs,bsd->btgd", batch["agg_w"].astype(pano_flat.dtype),
            pano_flat, preferred_element_type=jnp.float32
        ).astype(pano_flat.dtype)
    elif cfg.il.agg_dense_device:
        # dense W rebuilt on device from the sparse record: the
        # aggregation fwd AND bwd are single fp32 matmuls (see
        # dense_w_from_sparse; A/B'd in tools/exp_learn_bwd.py)
        w = dense_w_from_sparse(batch, P)
        gmap_img = jnp.einsum(
            "btgs,bsd->btgd", w, pano_flat.astype(jnp.float32)
        ).astype(pano_flat.dtype)
    else:
        # sparse provenance record (RolloutRecord.agg_* — see rollout.py):
        # node slots gather their visit-step's masked token mean; ghost
        # slots sum weighted gathered tokens via a small one-hot matmul.
        # Aggregation math runs in fp32 (matching the dense einsum's
        # preferred_element_type accumulation under bf16 activations).
        dt = pano_flat.dtype
        pano32 = pano_flat.astype(jnp.float32)
        pano_bt = pano32.reshape(B, T, P, -1)
        vmask = batch["vp_mask"] & batch["step_valid"][..., None]
        cnt = jnp.maximum(vmask.sum(-1), 1).astype(jnp.float32)  # (B, T)
        step_mean = ((pano_bt * vmask[..., None]).sum(2)
                     / cnt[..., None])                          # (B, T, D)
        node_oh = (batch["agg_node_step"][..., None]
                   == jnp.arange(T, dtype=jnp.int32))           # (B,T,G,T)
        gmap_node = jnp.einsum("btgu,bud->btgd",
                               node_oh.astype(jnp.float32), step_mean)
        ent_feat = pano32[jnp.arange(B)[:, None, None],
                          batch["agg_ent_tok"]]                 # (B,T,M,D)
        ent_feat = ent_feat * batch["agg_ent_val"][..., None]
        slot_oh = (batch["agg_ent_slot"][..., None]
                   == jnp.arange(G, dtype=jnp.int32))           # (B,T,M,G)
        # padding entries carry val=0, so their slot-0 one-hot adds zero
        gmap_ghost = jnp.einsum("btmg,btmd->btgd",
                                slot_oh.astype(jnp.float32), ent_feat)
        gmap_img = (gmap_node + gmap_ghost).astype(dt)

    # navigation encoder over all steps at once
    txt_tiled = jnp.broadcast_to(txt[:, None], (B, T) + txt.shape[1:]) \
        .reshape(B * T, *txt.shape[1:])
    txt_mask_tiled = jnp.broadcast_to(
        batch["txt_masks"][:, None], (B, T, txt.shape[1])) \
        .reshape(B * T, -1)
    nav = planner.forward_navigation(
        planner_params, p, txt_tiled, txt_mask_tiled,
        gmap_img.reshape(B * T, G, -1),
        batch["gmap_step_ids"].reshape(B * T, G),
        batch["gmap_pos_fts"].reshape(B * T, G, -1),
        batch["gmap_mask"].reshape(B * T, G),
        batch["gmap_visited"].reshape(B * T, G),
        batch["gmap_pair"].reshape(B * T, G, G),
        rng=r_nav, train=train)
    return nav["global_logits"].reshape(B, T, G)


def compute_il_loss(planner_params: dict, cfg: ExperimentConfig,
                    batch: dict, rng: jax.Array) -> jax.Array:
    """Replay loss over a recorded rollout interval.

    batch holds device arrays mirroring RolloutRecord. Differentiable path:
    txt encoder -> pano encoder -> (linear aggregation W) -> nav encoder ->
    CE. Frozen visual features enter as data.
    """
    logits = replay_logits(planner_params, cfg, batch, rng, train=True)

    teacher = batch["teacher"]                        # (B, T), -100 ignore
    valid = (teacher >= 0) & batch["step_valid"]
    safe_t = jnp.maximum(teacher, 0)
    # cross entropy with -inf-masked logits: use where to avoid nan*0
    logp = jax.nn.log_softmax(
        jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    loss_sum = jnp.where(valid, nll, 0.0).sum()
    total_actions = jnp.maximum(batch["step_valid"].sum(), 1)
    return cfg.il.ml_weight * loss_sum / total_actions


@functools.partial(jax.jit, static_argnames=("cfg", "tx"),
                   donate_argnames=("planner_params", "opt_state"))
def learn_step(planner_params: dict, opt_state, cfg: ExperimentConfig,
               tx, batch: dict, rng: jax.Array):
    """The old params + Adam moments are dead after the update — donating
    them halves the step's extra device residency (pretrain_step already
    donates; on CPU donation is a no-op)."""
    loss, grads = jax.value_and_grad(compute_il_loss)(
        planner_params, cfg, batch, rng)
    updates, opt_state = tx.update(grads, opt_state, planner_params)
    planner_params = optax.apply_updates(planner_params, updates)
    return planner_params, opt_state, loss


def make_il_optimizer(cfg: ExperimentConfig, planner_params: dict
                      ) -> optax.GradientTransformation:
    """AdamW over the planner, honoring MODEL.fix_lang_embedding /
    fix_pano_embedding (vilmodel_cmt.py:675-682 sets requires_grad=False
    on embeddings+lang_encoder / img_embeddings; here the optimizer masks
    those subtrees so their params never move)."""
    frozen_roots = set()
    if cfg.il.fix_lang_embedding:
        frozen_roots |= {"embeddings", "lang_encoder"}
    if cfg.il.fix_pano_embedding:
        frozen_roots |= {"img_embeddings"}
    if not frozen_roots:
        return optax.adamw(cfg.il.lr)
    labels = {k: jax.tree_util.tree_map(
        lambda _: "freeze" if k in frozen_roots else "train", v)
        for k, v in planner_params.items()}
    return optax.multi_transform(
        {"train": optax.adamw(cfg.il.lr), "freeze": optax.set_to_zero()},
        labels)


def _warn_short(what: str, got: int, want: int):
    """evaluate()/inference() must not silently deliver fewer episodes than
    requested (a too-small split or a crash-looping env otherwise yields a
    quietly wrong-sized result set)."""
    if got < want:
        import warnings
        warnings.warn(
            f"{what} collected {got}/{want} requested episodes before the "
            "guard exhausted — the split may be smaller than requested or "
            "envs may be failing; results aggregate only what arrived.",
            RuntimeWarning, stacklevel=3)


def bucket_record(rec: RolloutRecord, il) -> RolloutRecord:
    """Slice a recorded interval to its (T, G) demand buckets
    (IL.train_traj_buckets / train_gmap_buckets; VERDICT r3 #2).

    Exact, not approximate: emitted gmap slots are prefix-ordered with
    padding at the end, steps beyond the last valid one are whole-row
    padding (teacher=-100, step_valid=False), ghost-provenance entries at
    step t reference only steps <= t and slots < the live slot count, and
    node visit-steps are <= their row's step. So slicing the record to
    T_b >= max valid steps and G_b >= max live slots removes only
    padding compute. One jitted learn program per (T_b, G_b) pair.
    The reference analogue pads ragged graphs to the *batch* max per
    step (common/ops.py:46)."""
    import dataclasses as _dc
    B, T = rec.step_valid.shape
    G = rec.gmap_mask.shape[2]
    if not (il.train_traj_buckets or il.train_gmap_buckets):
        return rec
    valid_t = rec.step_valid.any(0)
    T_need = int(valid_t.nonzero()[0].max()) + 1 if valid_t.any() else 1
    G_need = int(rec.gmap_mask.sum(-1).max())
    # multi-process SPMD: every process must dispatch the same learn
    # program, so the bucket choice is the max demand across processes
    # (the task-sync dist.broadcast analogue, loader.py:56-59)
    from etpnav_tpu.parallel import mesh as meshlib
    T_need, G_need = meshlib.sync_max((T_need, G_need))
    T_b = _pick_bucket(T_need, il.train_traj_buckets, T)
    G_b = _pick_bucket(G_need, il.train_gmap_buckets, G)
    if (T_b, G_b) == (T, G):
        return rec
    M_b = T_b * (rec.agg_ent_val.shape[2] // T)
    return _dc.replace(
        rec,
        vp_rgb=rec.vp_rgb[:, :T_b], vp_dep=rec.vp_dep[:, :T_b],
        vp_loc=rec.vp_loc[:, :T_b], vp_nav=rec.vp_nav[:, :T_b],
        vp_mask=rec.vp_mask[:, :T_b],
        agg_node_step=rec.agg_node_step[:, :T_b, :G_b],
        agg_ent_slot=rec.agg_ent_slot[:, :T_b, :M_b],
        agg_ent_tok=rec.agg_ent_tok[:, :T_b, :M_b],
        agg_ent_val=rec.agg_ent_val[:, :T_b, :M_b],
        gmap_step_ids=rec.gmap_step_ids[:, :T_b, :G_b],
        gmap_pos_fts=rec.gmap_pos_fts[:, :T_b, :G_b],
        gmap_mask=rec.gmap_mask[:, :T_b, :G_b],
        gmap_visited=rec.gmap_visited[:, :T_b, :G_b],
        gmap_pair=rec.gmap_pair[:, :T_b, :G_b, :G_b],
        teacher=rec.teacher[:, :T_b],
        step_valid=rec.step_valid[:, :T_b],
        logits=rec.logits[:, :T_b, :G_b],
    )


def record_to_batch(rec: RolloutRecord) -> dict:
    return {
        "txt_ids": jnp.asarray(rec.txt_ids),
        "txt_masks": jnp.asarray(rec.txt_masks),
        "vp_rgb": jnp.asarray(rec.vp_rgb),
        "vp_dep": jnp.asarray(rec.vp_dep),
        "vp_loc": jnp.asarray(rec.vp_loc),
        "vp_nav": jnp.asarray(rec.vp_nav),
        "vp_mask": jnp.asarray(rec.vp_mask),
        "agg_node_step": jnp.asarray(rec.agg_node_step),
        "agg_ent_slot": jnp.asarray(rec.agg_ent_slot),
        "agg_ent_tok": jnp.asarray(rec.agg_ent_tok),
        "agg_ent_val": jnp.asarray(rec.agg_ent_val),
        "gmap_step_ids": jnp.asarray(rec.gmap_step_ids),
        "gmap_pos_fts": jnp.asarray(rec.gmap_pos_fts),
        "gmap_mask": jnp.asarray(rec.gmap_mask),
        "gmap_visited": jnp.asarray(rec.gmap_visited),
        "gmap_pair": jnp.asarray(rec.gmap_pair),
        "teacher": jnp.asarray(rec.teacher),
        "step_valid": jnp.asarray(rec.step_valid),
    }


class FinetuneTrainer:
    """train / eval / inference driver (run.py surface equivalent)."""

    def __init__(self, cfg: ExperimentConfig, envs, *,
                 params: Optional[AgentParams] = None,
                 ckpt_dir: str = "checkpoints", seed: int = 0,
                 tb_dir: Optional[str] = None, mesh=None):
        """mesh: optional jax.sharding.Mesh for SPMD training — the learn
        step shards the recorded batch over 'dp' and lays planner params
        out by parallel/mesh.py rules (replacing the reference's DDP,
        ss_trainer_ETP.py:208-213). Rollout inference stays per-host."""
        from etpnav_tpu.utils.logging import StepTimer, TensorboardLogger
        self.cfg = cfg
        self.envs = envs
        self.ckpt_dir = ckpt_dir
        self.mesh = mesh
        key = jax.random.PRNGKey(seed)
        self.params = params or init_agent_params(key, cfg)
        if mesh is not None:
            from etpnav_tpu.parallel import mesh as meshlib
            self.params = self.params._replace(
                planner=meshlib.shard_params(mesh, self.params.planner))
        self.agent = JittedAgent(cfg, self._rollout_params())
        if isinstance(envs, (list, tuple)):
            # pipelined mode: one engine per env pool, threaded overlap of
            # sim waits and device compute (training/pipeline.py)
            from etpnav_tpu.training.pipeline import PipelinedRollout
            engines = [RolloutEngine(cfg, self.agent, e, seed=seed + i)
                       for i, e in enumerate(envs)]
            self.engine = PipelinedRollout(engines)
        else:
            self.engine = RolloutEngine(cfg, self.agent, envs, seed=seed)
        self.tx = make_il_optimizer(cfg, self.params.planner)
        self.opt_state = self.tx.init(self.params.planner)
        # per-iteration dropout keys: cfg.il.rng_impl ("rbg" default)
        # replaces threefry mask generation — 147.6 -> 133.2 ms per fused
        # learn step on v5e-1 (tools/exp_learn_bisect.py)
        self.rng = jax.random.key(seed + 1, impl=cfg.il.rng_impl)
        # experimental; recorded in the config. Assigned unconditionally
        # so a bits8 trainer does not leak the global into a later
        # default-config trainer in the same process.
        apply_il_runtime_flags(cfg)
        self.iteration = 0
        self.logs = defaultdict(list)
        self.timer = StepTimer()
        # (T, G) learn-program usage histogram (see train())
        self.bucket_counts: Dict[tuple, int] = {}
        self.writer = TensorboardLogger(tb_dir)

    def _rollout_params(self):
        """Params for the per-process rollout/eval dispatches.

        Multi-process SPMD: rollouts are host-local (each process drives
        its OWN envs, with data-dependent dispatch counts), so they must
        not close over globally-sharded planner params — a jit touching a
        global array is a lockstep collective program on every process.
        The planner is dp-replicated and mp-sharded only within a process,
        so each process can materialize the full value locally
        (device_get) and dispatch on local devices. The fetched value is
        re-committed to local device 0 immediately: numpy leaves would be
        re-uploaded host->device on EVERY jitted rollout dispatch (~2T
        per iteration). Single-process: the mesh is fully addressable,
        use the sharded params directly."""
        if self.mesh is None or jax.process_count() == 1:
            return self.params
        local = jax.device_put(jax.device_get(self.params.planner),
                               jax.local_devices()[0])
        return self.params._replace(planner=local)

    def _refresh_agent(self):
        # JittedAgent closures take params per call; just swap the tuple
        self.agent.params = self._rollout_params()

    def resume_latest(self, ckpt_dir: Optional[str] = None) -> bool:
        """IL.is_requeue: restore the newest checkpoint incl. optimizer
        state (ss_trainer_ETP.py:216-236)."""
        from etpnav_tpu.training.checkpoints import latest_checkpoint
        ckpt = latest_checkpoint(ckpt_dir or self.ckpt_dir)
        if ckpt is None:
            return False
        self.load_checkpoint(ckpt)
        return True

    def train(self, iters: Optional[int] = None,
              gt_paths: Optional[dict] = None,
              save_every: Optional[int] = None) -> Dict[str, float]:
        """save_every: checkpoint to self.ckpt_dir every N iterations
        (the reference saves each log_every, ss_trainer_ETP.py:480)."""
        il = self.cfg.il
        iters = iters if iters is not None else il.iters
        for _ in range(iters):
            ratio = il.sample_ratio ** (
                self.iteration // il.decay_interval + 1)
            with self.timer.phase("rollout"):
                rec = self.engine.run("train", sample_ratio=ratio,
                                      gt_paths=gt_paths)
            with self.timer.phase("learn"):
                brec = bucket_record(rec, il)
                self.last_bucket = (brec.step_valid.shape[1],
                                    brec.gmap_mask.shape[2])
                # padding-share observability: which (T, G) programs a
                # run actually pays for (NOTES_ROUND4.md capacity table
                # gives the episode-level distribution; this records the
                # interval-level one, which buckets at the batch max)
                self.bucket_counts[self.last_bucket] = \
                    self.bucket_counts.get(self.last_bucket, 0) + 1
                batch = record_to_batch(brec)
                if self.mesh is not None:
                    from etpnav_tpu.parallel import mesh as meshlib
                    batch = meshlib.shard_batch(self.mesh, batch)
                self.rng, sub = jax.random.split(self.rng)
                new_planner, self.opt_state, loss = learn_step(
                    self.params.planner, self.opt_state, self.cfg, self.tx,
                    batch, sub)
                # Sync INSIDE the phase: learn_step returns at dispatch, and
                # without the fetch its device time would be attributed to
                # the next rollout phase (BENCH_r04 printed learn=0.024 s
                # for a 137 ms program; VERDICT r4 weak #3).
                loss = float(loss)
            self.params = self.params._replace(planner=new_planner)
            self._refresh_agent()
            self.iteration += 1
            self.logs["IL_loss"].append(loss)
            self.writer.add_scalar("loss/IL_loss", loss, self.iteration)
            if self.iteration % 50 == 0:
                self.writer.add_scalars(
                    {f"time/{k}": v for k, v in self.timer.means().items()},
                    self.iteration)
                self.writer.add_scalars(
                    {f"buckets/T{t}_G{g}": n for (t, g), n
                     in self.bucket_counts.items()}, self.iteration)
            if save_every and self.iteration % save_every == 0:
                os.makedirs(self.ckpt_dir, exist_ok=True)
                self.save_checkpoint(os.path.join(
                    self.ckpt_dir, f"ckpt_iter{self.iteration}"))
        return {k: float(np.mean(v[-iters:])) for k, v in self.logs.items()}

    def evaluate(self, episode_count: int,
                 gt_paths: Optional[dict] = None,
                 video_dir: Optional[str] = None) -> Dict[str, float]:
        """Eval loop (ss_trainer_ETP.py:513-641): argmax policy, metric
        aggregation over unique episodes. video_dir writes one navigator
        video per episode (VIDEO_DIR pipeline)."""
        stat_eps: dict = {}
        guard = stalled = 0
        while len(stat_eps) < episode_count and guard < 10 * episode_count:
            before = len(stat_eps)
            self.engine.run("eval", stat_eps=stat_eps, gt_paths=gt_paths,
                            video_dir=video_dir)
            guard += 1
            stalled = stalled + 1 if len(stat_eps) == before else 0
            if stalled >= 3:
                break   # split exhausted / envs crash-looping: stop early
        _warn_short("evaluate", len(stat_eps), episode_count)
        stats = aggregate(stat_eps)
        if stats:
            # SR/SPL on n episodes quantize at 1/n — carry n so curve
            # points are interpretable against that noise floor
            stats["n_episodes"] = float(len(stat_eps))
        return stats

    def inference(self, episode_count: int, predictions_file: str,
                  fmt: str = "r2r", sample: Optional[bool] = None) -> dict:
        """Leaderboard submission writer (ss_trainer_ETP.py:643-756).
        sample defaults to cfg.inference.sample (INFERENCE.SAMPLE)."""
        if sample is None:
            sample = self.cfg.inference.sample
        path_eps: dict = {}
        guard = stalled = 0
        while len(path_eps) < episode_count and guard < 10 * episode_count:
            before = len(path_eps)
            self.engine.run("infer", path_eps=path_eps,
                            sample_actions=sample)
            guard += 1
            stalled = stalled + 1 if len(path_eps) == before else 0
            if stalled >= 3:
                break
        _warn_short("inference", len(path_eps), episode_count)
        os.makedirs(os.path.dirname(predictions_file) or ".", exist_ok=True)
        if fmt == "r2r":
            payload = {k: v["path"] for k, v in path_eps.items()}
            with open(predictions_file, "w") as f:
                json.dump(payload, f, indent=2)
        else:  # rxr jsonl
            preds = []
            for k, v in path_eps.items():
                pts = [v["path"][0]["position"]]
                for p in v["path"][1:]:
                    if p["position"] != pts[-1]:
                        pts.append(p["position"])
                preds.append({"instruction_id": v["instruction_id"],
                              "path": pts})
            preds.sort(key=lambda x: x["instruction_id"])
            with open(predictions_file, "w") as f:
                for p in preds:
                    f.write(json.dumps(p) + "\n")
        return path_eps

    # ------------------------------------------------------------- ckpts

    def load_pretrained(self, path: str):
        """Warm-start the planner from a PretrainTrainer orbax checkpoint
        (the JAX-native MODEL.pretrained_path seam; run_r2r/main.bash +
        vlnbert_init.py:21-30). Optimizer state is re-initialized — the
        fine-tune stage starts fresh Adam moments like the reference."""
        from etpnav_tpu.training.warm_start import load_pretrained_planner
        planner_params = load_pretrained_planner(path, self.params.planner)
        if self.mesh is not None:
            from etpnav_tpu.parallel import mesh as meshlib
            planner_params = meshlib.shard_params(self.mesh, planner_params)
        self.params = self.params._replace(planner=planner_params)
        self.opt_state = self.tx.init(self.params.planner)
        self._refresh_agent()

    def save_checkpoint(self, path: str):
        from etpnav_tpu.training.checkpoints import save_checkpoint
        save_checkpoint(path, {
            "params": self.params._asdict(),
            "opt_state": self.opt_state,
            "iteration": self.iteration,
        })

    def load_checkpoint(self, path: str):
        from etpnav_tpu.training.checkpoints import load_checkpoint
        state = load_checkpoint(path, {
            "params": self.params._asdict(),
            "opt_state": self.opt_state,
            "iteration": self.iteration,
        })
        self.params = AgentParams(**state["params"])
        self.opt_state = state["opt_state"]
        self.iteration = int(state["iteration"])
        if self.mesh is not None:
            # restore the SPMD layout __init__ established: orbax hands
            # back host arrays, and committing them unsharded would
            # silently replace the tensor-parallel layout with full
            # replicas (and recompile the learn step against it)
            from etpnav_tpu.parallel import mesh as meshlib
            self.params = self.params._replace(
                planner=meshlib.shard_params(self.mesh,
                                             self.params.planner))
            # opt-state moments mirror the param layout; re-establish it
            # from a freshly-inited template (device_put to the global
            # shardings works across processes for full host values).
            # Only mesh-wide (NamedSharding) leaves are committed —
            # scalars like adam counts stay uncommitted host values so
            # jit may place them (committing them to a single device
            # conflicts with the mesh-sharded params in one program).
            from jax.sharding import NamedSharding as _NS
            like = self.tx.init(self.params.planner)
            self.opt_state = jax.tree_util.tree_map(
                lambda x, l: jax.device_put(np.asarray(x), l.sharding)
                if isinstance(getattr(l, "sharding", None), _NS)
                else np.asarray(x), self.opt_state, like)
        self._refresh_agent()
