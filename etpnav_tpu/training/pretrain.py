"""MLM + SAP pretraining: pjit data-parallel (+ optional tensor-parallel)
train loop.

Capability target: pretrain_src/pretrain_src/train_r2r.py:70-462 — the
multi-task step loop with MetaLoader task mixing, AdamW with no-decay
groups (optim/misc.py:12-40), warmup-linear LR (optim/sched.py:25),
gradient clipping, periodic validation (validate_mlm/validate_sap,
train_r2r.py:355-444) — as ONE jitted SPMD train step per task over a
jax.sharding.Mesh: batch sharded over 'dp', params laid out by
parallel/mesh.py rules, XLA inserting all collectives. bf16 activations,
fp32 params/optimizer; no GradScaler needed.
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from etpnav_tpu.config import ExperimentConfig, PlannerConfig
from etpnav_tpu.data.pretrain_data import (
    MetaSampler,
    PretrainSampler,
    PretrainShapes,
)
from etpnav_tpu.models import planner
from etpnav_tpu.ops.basic import mask_to_bias
from etpnav_tpu.parallel import mesh as meshlib

logger = logging.getLogger("etpnav_tpu.pretrain")


def init_pretrain_params(key: jax.Array, cfg: PlannerConfig,
                         tasks=("mlm", "sap"),
                         image_prob_size: int = 1000) -> dict:
    """Backbone + per-task heads (pretrain_cmt.py:50-78). mrc/og add the
    local branch (LocalVPEncoder) that the reference keeps commented out
    (vilmodel.py:663) plus their heads."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = planner.init_planner_params(k1, cfg, use_lang2visn=True)
    if "mlm" in tasks:
        params["mlm_head"] = planner.mlm_head_init(k2, cfg)
    if "mrc" in tasks or "og" in tasks:
        params["local_encoder"] = planner.local_encoder_init(k3, cfg)
    if "mrc" in tasks:
        params["image_classifier"] = planner.region_head_init(
            k4, cfg.hidden_size, image_prob_size)
    if "og" in tasks:
        params["og_head"] = planner.cls_head_init(k5, cfg.hidden_size)
    return params


# ---------------------------------------------------------------------------
# forwards (shared trunk)
# ---------------------------------------------------------------------------

def _trunk(params: dict, cfg: PlannerConfig, batch: dict,
           rng: Optional[jax.Array], train: bool, need_gmap: bool = True):
    """text encoder + pano encoder over all steps + W aggregation ->
    (txt_embeds, gmap_img_fts, pano_tokens (B,T,P,D))."""
    B, T, P = batch["vp_img"].shape[:3]
    r_txt, r_pano = (jax.random.split(rng) if rng is not None
                     else (None, None))
    txt = planner.forward_txt(params, cfg, batch["txt_ids"],
                              batch["txt_masks"], rng=r_txt, train=train)
    pano, _ = planner.forward_panorama(
        params, cfg,
        batch["vp_img"].reshape(B * T, P, -1),
        batch["vp_dep"].reshape(B * T, P, -1),
        batch["vp_loc"].reshape(B * T, P, -1),
        batch["vp_nav"].reshape(B * T, P),
        batch["vp_mask"].reshape(B * T, P),
        rng=r_pano, train=train)
    pano = pano.reshape(B, T, P, -1)
    gmap_img = None
    if need_gmap:
        pano_flat = pano.reshape(B, T * P, -1)
        step_tok_mask = jnp.repeat(batch["step_valid"], P, axis=1)
        pano_flat = pano_flat * step_tok_mask[..., None]
        gmap_img = jnp.einsum("bgs,bsd->bgd",
                              batch["agg_w"].astype(pano_flat.dtype),
                              pano_flat,
                              preferred_element_type=jnp.float32
                              ).astype(pano_flat.dtype)
    return txt, gmap_img, pano


def _local_vp_embeds(params: dict, cfg: PlannerConfig, batch: dict,
                     rng: Optional[jax.Array], train: bool) -> jax.Array:
    """Final-step pano tokens -> local cross-modal vp embeddings
    (B, 1+P, D), [stop] first (LocalVPEncoder, pretrain vilmodel.py:537).

    MRC/OG only read the end viewpoint, and the pano encoder treats steps
    independently, so the final step's inputs are gathered BEFORE the
    encoder — 1/T of the trajectory-wide pano compute, identical math."""
    if rng is not None:
        r_t, r_pano, r_loc = jax.random.split(rng, 3)
    else:
        r_t = r_pano = r_loc = None
    txt = planner.forward_txt(params, cfg, batch["txt_ids"],
                              batch["txt_masks"], rng=r_t, train=train)
    B = batch["vp_img"].shape[0]
    idx = jnp.arange(B)
    last = batch["last_step"]
    last_masks = batch["vp_mask"][idx, last]                # (B, P)
    last_tokens, _ = planner.forward_panorama(
        params, cfg,
        batch["vp_img"][idx, last], batch["vp_dep"][idx, last],
        batch["vp_loc"][idx, last], batch["vp_nav"][idx, last],
        last_masks, rng=r_pano, train=train)                # (B, P, D)
    return planner.forward_local(
        params, cfg, txt, batch["txt_masks"], last_tokens, last_masks,
        batch["vp_pos_fts"], rng=r_loc, train=train), last_masks


def forward_sap(params: dict, cfg: PlannerConfig, batch: dict,
                rng: Optional[jax.Array] = None, train: bool = False
                ) -> jax.Array:
    """-> (B, G) global action logits (pretrain_cmt.py:223-263)."""
    r_t, r_nav = (jax.random.split(rng) if rng is not None
                  else (None, None))
    txt, gmap_img, _ = _trunk(params, cfg, batch, r_t, train)
    nav = planner.forward_navigation(
        params, cfg, txt, batch["txt_masks"], gmap_img,
        batch["gmap_step_ids"], batch["gmap_pos_fts"], batch["gmap_mask"],
        batch["gmap_visited"], batch["gmap_pair"], rng=r_nav, train=train)
    return nav["global_logits"]


def forward_mlm(params: dict, cfg: PlannerConfig, batch: dict,
                rng: Optional[jax.Array] = None, train: bool = False
                ) -> jax.Array:
    """-> (B, L, vocab) token logits via the lang2visn path
    (pretrain vilmodel.py:708-756 + mlm head)."""
    r_t, r_l2v = (jax.random.split(rng) if rng is not None
                  else (None, None))
    txt, gmap_img, _ = _trunk(params, cfg, batch, r_t, train)
    ge = params["global_encoder"]
    from etpnav_tpu.ops.basic import layer_norm, linear
    pos = layer_norm(linear(ge["gmap_pos_embeddings"]["dense"],
                            batch["gmap_pos_fts"]),
                     ge["gmap_pos_embeddings"]["ln"]["scale"],
                     ge["gmap_pos_embeddings"]["ln"]["bias"],
                     cfg.vis_layer_norm_eps)
    gmap_embeds = gmap_img + ge["gmap_step_embeddings"][
        batch["gmap_step_ids"]] + pos
    lang_bias = mask_to_bias(batch["txt_masks"])[:, None, None, :]
    visn_bias = mask_to_bias(batch["gmap_mask"])[:, None, None, :]
    txt = planner.lang2visn_stack(
        ge["encoder"], cfg, txt, gmap_embeds.astype(txt.dtype), lang_bias,
        visn_bias, rng=r_l2v, train=train)
    return planner.mlm_head(params["mlm_head"],
                            params["embeddings"]["word_embeddings"], txt,
                            cfg.lang_layer_norm_eps)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def sap_loss(params, cfg: PlannerConfig, batch, rng) -> jax.Array:
    logits = forward_sap(params, cfg, batch, rng, train=True)
    labels = batch["global_act_labels"]
    valid = labels >= 0
    logp = jax.nn.log_softmax(
        jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[:, None], axis=-1)[:, 0]
    return jnp.where(valid, nll, 0.0).sum() / jnp.maximum(valid.sum(), 1)


def mlm_loss(params, cfg: PlannerConfig, batch, rng) -> jax.Array:
    logits = forward_mlm(params, cfg, batch, rng, train=True)
    labels = batch["txt_labels"]
    valid = labels >= 0
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[..., None], axis=-1)[..., 0]
    return jnp.where(valid, nll, 0.0).sum() / jnp.maximum(valid.sum(), 1)


def forward_mrc(params: dict, cfg: PlannerConfig, batch: dict,
                rng: Optional[jax.Array] = None, train: bool = False
                ) -> jax.Array:
    """-> (B, P, prob_size) region soft-label logits over the final
    viewpoint's tokens (pretrain_cmt.py:170-221; [stop] row dropped to
    match 'no [stop]' targets, tasks.py:194)."""
    vp_embeds, _ = _local_vp_embeds(params, cfg, batch, rng, train)
    return planner.region_head(params["image_classifier"],
                               vp_embeds[:, 1:], cfg.vis_layer_norm_eps)


def _masked_kl(logits: jax.Array, batch: dict) -> jax.Array:
    """KL(soft CLIP labels || predicted) averaged over masked view
    tokens — shared by mrc_loss and validation so the reported metric is
    exactly the trained objective."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    target = batch["vp_view_probs"]
    # F.kl_div(logp, p).sum(-1) = sum p*(log p - logp); 0*log0 := 0
    plogp = jnp.where(target > 0, target * jnp.log(
        jnp.maximum(target, 1e-12)), 0.0)
    kl = (plogp - target * logp).sum(-1)                    # (B, P)
    m = batch["vp_view_mrc_masks"]
    return jnp.where(m, kl, 0.0).sum() / jnp.maximum(m.sum(), 1)


def mrc_loss(params, cfg: PlannerConfig, batch, rng) -> jax.Array:
    """KL over masked view tokens (pretrain_cmt.py:210-214)."""
    return _masked_kl(forward_mrc(params, cfg, batch, rng, train=True),
                      batch)


def forward_og(params: dict, cfg: PlannerConfig, batch: dict,
               rng: Optional[jax.Array] = None, train: bool = False
               ) -> jax.Array:
    """-> (B, 1+P) object-grounding logits over local vp tokens, -inf
    outside object slots (pretrain_cmt.py:287-317 re-homed to the fixed
    token layout: obj slots carry nav_type 2)."""
    vp_embeds, last_masks = _local_vp_embeds(params, cfg, batch, rng, train)
    logits = planner.cls_head(params["og_head"], vp_embeds,
                              cfg.vis_layer_norm_eps)
    B = logits.shape[0]
    last = batch["last_step"]
    nav = batch["vp_nav"][jnp.arange(B), last]              # (B, P)
    is_obj = jnp.concatenate(
        [jnp.zeros((B, 1), bool), (nav == 2) & last_masks], axis=1)
    return jnp.where(is_obj, logits, -jnp.inf)


def og_loss(params, cfg: PlannerConfig, batch, rng) -> jax.Array:
    logits = forward_og(params, cfg, batch, rng, train=True)
    logp = jax.nn.log_softmax(
        jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1)
    nll = -jnp.take_along_axis(
        logp, batch["obj_labels"][:, None], axis=-1)[:, 0]
    return nll.mean()


# ---------------------------------------------------------------------------
# optimizer / schedule
# ---------------------------------------------------------------------------

def warmup_linear(step: jax.Array, lr: float, warmup: int,
                  total: int) -> jax.Array:
    """optim/sched.py warmup_linear: ramp to lr over `warmup`, linear decay
    to 0 at `total`."""
    step = jnp.asarray(step, jnp.float32)
    warm = lr * step / max(warmup, 1)
    decay = lr * jnp.maximum(
        (total - step) / max(total - warmup, 1), 0.0)
    return jnp.where(step < warmup, warm, decay)


def noam_schedule(step: jax.Array, lr: float, warmup: int) -> jax.Array:
    """optim/sched.py:10-14: linear warmup then inverse-sqrt decay."""
    step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
    return lr * jnp.where(step <= warmup, step / max(warmup, 1),
                          (warmup ** 0.5) * step ** -0.5)


def lookahead(base: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6) -> optax.GradientTransformation:
    """Lookahead wrapper (optim/lookahead.py:12-53): keep slow weights;
    every k steps pull fast weights toward slow by alpha and reset fast to
    slow. Implemented as a pure gradient transform keeping the slow copy
    in optimizer state (the torch version mutates params in place)."""

    def init(params):
        # copy, don't alias: params are donated by the train step, and the
        # slow weights live across steps in optimizer state
        return {"base": base.init(params),
                "slow": jax.tree_util.tree_map(
                    lambda x: jnp.array(x, copy=True), params),
                "step": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        u, bstate = base.update(updates, state["base"], params)
        step = state["step"] + 1
        sync = (step % k) == 0
        fast = jax.tree_util.tree_map(lambda p, du: p + du, params, u)
        slow_new = jax.tree_util.tree_map(
            lambda s, f: s + alpha * (f - s.astype(f.dtype)),
            state["slow"], fast)
        out_u = jax.tree_util.tree_map(
            lambda f, sn, p, du: jnp.where(sync, sn - p, du),
            fast, slow_new, params, u)
        slow = jax.tree_util.tree_map(
            lambda s, sn: jnp.where(sync, sn, s), state["slow"], slow_new)
        return out_u, {"base": bstate, "slow": slow, "step": step}

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """Optimizer family per pretrain.optim (optim/misc.py:26-37:
    adam/adamax/adamw/rangerlars; radam/ralamb are their building blocks,
    optim/{radam,ralamb}.py) with no-decay groups on biases/LayerNorms,
    global-norm clipping, and warmup-linear or noam schedule."""
    pt = cfg.pretrain
    b1, b2 = pt.betas

    def decay_mask(params):
        def is_decay(kp, _):
            path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in kp)
            if path.endswith("/b") or path.endswith("bias"):
                return False
            if "/ln/" in path or path.endswith("scale"):
                return False
            return True
        return jax.tree_util.tree_map_with_path(is_decay, params)

    if pt.lr_sched == "noam":
        sched = lambda step: noam_schedule(step, pt.learning_rate,
                                           pt.warmup_steps)
    elif pt.lr_sched == "warmup_linear":
        # get_lr_sched floors the LR at 1e-8 (optim/sched.py:27-29)
        sched = lambda step: jnp.maximum(
            warmup_linear(step, pt.learning_rate, pt.warmup_steps,
                          pt.num_train_steps), 1e-8)
    else:
        raise ValueError(f"unknown lr_sched {pt.lr_sched!r}")

    wd = optax.add_decayed_weights(pt.weight_decay, mask=decay_mask)
    if pt.optim == "adamw":
        core = optax.chain(optax.scale_by_adam(b1=b1, b2=b2), wd)
    elif pt.optim == "adam":
        # torch Adam folds L2 into grads before the moments
        core = optax.chain(wd, optax.scale_by_adam(b1=b1, b2=b2))
    elif pt.optim == "adamax":
        core = optax.chain(wd, optax.scale_by_adamax(b1=b1, b2=b2))
    elif pt.optim == "radam":
        core = optax.chain(optax.scale_by_radam(b1=b1, b2=b2), wd)
    elif pt.optim in ("ralamb", "rangerlars"):
        # Ralamb = RAdam update scaled by the layer-wise trust ratio
        core = optax.chain(optax.scale_by_radam(b1=b1, b2=b2), wd,
                           optax.scale_by_trust_ratio())
    else:
        raise ValueError(f"unknown optim {pt.optim!r}")

    tx = optax.chain(
        optax.clip_by_global_norm(pt.grad_norm),
        core,
        optax.scale_by_learning_rate(sched),
    )
    if pt.optim == "rangerlars":
        tx = lookahead(tx, pt.lookahead_alpha, pt.lookahead_k)
    return tx


# ---------------------------------------------------------------------------
# SPMD train step + trainer
# ---------------------------------------------------------------------------

_LOSS_FNS = {"mlm": mlm_loss, "sap": sap_loss, "mrc": mrc_loss,
             "og": og_loss}


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "task"),
                   donate_argnames=("params", "opt_state"))
def pretrain_step(params, opt_state, cfg: PlannerConfig, tx, task: str,
                  batch, rng):
    loss_fn = _LOSS_FNS[task]
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, batch, rng)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


class PretrainTrainer:
    def __init__(self, cfg: ExperimentConfig, shapes: PretrainShapes, *,
                 mesh=None, seed: int = 0, num_scans: int = 8,
                 scan_size: int = 24):
        self.cfg = cfg
        self.shapes = shapes
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            dp=cfg.mesh.dp, mp=cfg.mesh.mp)
        key = jax.random.PRNGKey(seed)
        params = init_pretrain_params(key, cfg.planner, cfg.pretrain.tasks,
                                      cfg.pretrain.image_prob_size)
        self.params = meshlib.shard_params(self.mesh, params)
        self.tx = make_optimizer(cfg)
        self.opt_state = self.tx.init(self.params)
        # per-process data stream (DistributedSampler semantics,
        # loader.py:127-149): each process samples its own shard-distinct
        # examples; MetaSampler keeps the shared seed so the TASK pick
        # stays synchronized across processes (loader.py:56-59).
        data_seed = seed + 100003 * jax.process_index()
        self.sampler = PretrainSampler(shapes, seed=data_seed,
                                       num_scans=num_scans,
                                       scan_size=scan_size)
        self.meta = iter(MetaSampler(self.sampler, cfg.pretrain.batch_size,
                                     cfg.pretrain.task_ratios, seed=seed,
                                     tasks=cfg.pretrain.tasks))
        # dropout keys per step: cfg.pretrain.rng_impl (see ILConfig.rng_impl)
        self.rng = jax.random.key(seed + 1, impl=cfg.pretrain.rng_impl)
        self.step = 0

    def _put(self, batch: Dict[str, np.ndarray]):
        return meshlib.shard_batch(self.mesh, batch)

    def train_steps(self, n: int, *, ckpt_dir: Optional[str] = None
                    ) -> Dict[str, float]:
        """n steps of task-mixed training. With ckpt_dir, validates and
        saves every cfg.pretrain.valid_steps (train_r2r.py:319-324 +
        ModelSaver)."""
        pt = self.cfg.pretrain
        losses = {t: [] for t in pt.tasks}
        out: Dict[str, float] = {}
        for _ in range(n):
            task, batch = next(self.meta)
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, loss = pretrain_step(
                self.params, self.opt_state, self.cfg.planner, self.tx,
                task, self._put(batch), sub)
            losses[task].append(float(loss))
            self.step += 1
            if ckpt_dir and self.step % pt.valid_steps == 0:
                # log + return validation like the reference's periodic
                # validate_mlm/validate_sap (train_r2r.py:319-324,355-444)
                val = self.validate(n_batches=1)
                logger.info("step %d validation: %s", self.step, val)
                out.update({f"val_{k}": v for k, v in val.items()})
                self.save_checkpoint(
                    f"{ckpt_dir}/model_step_{self.step}")
        out.update({f"{k}_loss": float(np.mean(v))
                    for k, v in losses.items() if v})
        return out

    # ---- checkpointing (ModelSaver, pretrain utils/save.py:23-45) ----

    def _state(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "step": np.int64(self.step), "rng": self.rng}

    def save_checkpoint(self, path: str):
        from etpnav_tpu.training.checkpoints import save_checkpoint
        save_checkpoint(path, self._state())

    def load_checkpoint(self, path: str):
        from etpnav_tpu.training.checkpoints import load_checkpoint
        state = load_checkpoint(path, self._state())
        self.params = meshlib.shard_params(self.mesh, state["params"])
        self.opt_state = jax.device_put(state["opt_state"])
        self.step = int(state["step"])
        self.rng = jnp.asarray(state["rng"])

    def resume_latest(self, ckpt_dir: str) -> bool:
        """Requeue-style resume from the newest checkpoint (is_requeue,
        ss_trainer_ETP.py:216-236 applied to pretraining)."""
        from etpnav_tpu.training.checkpoints import latest_checkpoint
        ckpt = latest_checkpoint(ckpt_dir, pattern="model_step_*")
        if ckpt is None:
            return False
        self.load_checkpoint(ckpt)
        return True

    # ---- validation (train_r2r.py:355-444) ----

    def validate(self, n_batches: int = 4) -> Dict[str, float]:
        mlm_correct = mlm_total = 0
        sap_correct = sap_total = 0
        for _ in range(n_batches):
            batch = self.sampler.sample_batch(self.cfg.pretrain.batch_size,
                                              "mlm")
            logits = forward_mlm(self.params, self.cfg.planner,
                                 self._put(batch))
            pred = np.asarray(jnp.argmax(logits, -1))
            labels = batch["txt_labels"]
            valid = labels >= 0
            mlm_correct += int((pred[valid] == labels[valid]).sum())
            mlm_total += int(valid.sum())

            batch = self.sampler.sample_batch(self.cfg.pretrain.batch_size,
                                              "sap")
            logits = forward_sap(self.params, self.cfg.planner,
                                 self._put(batch))
            pred = np.asarray(jnp.argmax(logits, -1))
            labels = batch["global_act_labels"]
            valid = labels >= 0
            sap_correct += int((pred[valid] == labels[valid]).sum())
            sap_total += int(valid.sum())
        out = {
            "mlm_acc": mlm_correct / max(mlm_total, 1),
            "sap_acc": sap_correct / max(sap_total, 1),
        }
        tasks = self.cfg.pretrain.tasks
        if "mrc" in tasks or "og" in tasks:
            mrc_kl, og_correct, og_total = [], 0, 0
            for _ in range(n_batches):
                if "mrc" in tasks:
                    batch = self._put(self.sampler.sample_batch(
                        self.cfg.pretrain.batch_size, "mrc"))
                    mrc_kl.append(float(_masked_kl(
                        forward_mrc(self.params, self.cfg.planner, batch),
                        batch)))
                if "og" in tasks:
                    batch = self.sampler.sample_batch(
                        self.cfg.pretrain.batch_size, "og")
                    logits = forward_og(self.params, self.cfg.planner,
                                        self._put(batch))
                    pred = np.asarray(jnp.argmax(logits, -1))
                    og_correct += int((pred == batch["obj_labels"]).sum())
                    og_total += len(pred)
            if "mrc" in tasks:
                out["mrc_kl"] = float(np.mean(mrc_kl))
            if "og" in tasks:
                out["og_acc"] = og_correct / max(og_total, 1)
        return out
