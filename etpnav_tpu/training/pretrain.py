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


def init_pretrain_params(key: jax.Array, cfg: PlannerConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = planner.init_planner_params(k1, cfg, use_lang2visn=True)
    params["mlm_head"] = planner.mlm_head_init(k2, cfg)
    return params


# ---------------------------------------------------------------------------
# forwards (shared trunk)
# ---------------------------------------------------------------------------

def _trunk(params: dict, cfg: PlannerConfig, batch: dict,
           rng: Optional[jax.Array], train: bool):
    """text encoder + pano encoder over all steps + W aggregation ->
    (txt_embeds, gmap_img_fts)."""
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
    pano_flat = pano.reshape(B, T * P, -1)
    step_tok_mask = jnp.repeat(batch["step_valid"], P, axis=1)
    pano_flat = pano_flat * step_tok_mask[..., None]
    gmap_img = jnp.einsum("bgs,bsd->bgd",
                          batch["agg_w"].astype(pano_flat.dtype), pano_flat,
                          preferred_element_type=jnp.float32
                          ).astype(pano_flat.dtype)
    return txt, gmap_img


def forward_sap(params: dict, cfg: PlannerConfig, batch: dict,
                rng: Optional[jax.Array] = None, train: bool = False
                ) -> jax.Array:
    """-> (B, G) global action logits (pretrain_cmt.py:223-263)."""
    r_t, r_nav = (jax.random.split(rng) if rng is not None
                  else (None, None))
    txt, gmap_img = _trunk(params, cfg, batch, r_t, train)
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
    txt, gmap_img = _trunk(params, cfg, batch, r_t, train)
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


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """AdamW with no-decay on biases/LayerNorms (optim/misc.py:12-40) +
    global-norm clipping + warmup-linear schedule."""
    pt = cfg.pretrain

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

    sched = lambda step: warmup_linear(step, pt.learning_rate,
                                       pt.warmup_steps, pt.num_train_steps)
    return optax.chain(
        optax.clip_by_global_norm(pt.grad_norm),
        optax.adamw(sched, weight_decay=pt.weight_decay, mask=decay_mask),
    )


# ---------------------------------------------------------------------------
# SPMD train step + trainer
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "tx", "task"),
                   donate_argnames=("params", "opt_state"))
def pretrain_step(params, opt_state, cfg: PlannerConfig, tx, task: str,
                  batch, rng):
    loss_fn = mlm_loss if task == "mlm" else sap_loss
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
        params = init_pretrain_params(key, cfg.planner)
        self.params = meshlib.shard_params(self.mesh, params)
        self.tx = make_optimizer(cfg)
        self.opt_state = self.tx.init(self.params)
        self.sampler = PretrainSampler(shapes, seed=seed,
                                       num_scans=num_scans,
                                       scan_size=scan_size)
        self.meta = iter(MetaSampler(self.sampler, cfg.pretrain.batch_size,
                                     cfg.pretrain.task_ratios, seed=seed))
        self.rng = jax.random.PRNGKey(seed + 1)
        self.step = 0

    def _put(self, batch: Dict[str, np.ndarray]):
        return meshlib.shard_batch(self.mesh, batch)

    def train_steps(self, n: int) -> Dict[str, float]:
        losses = {"mlm": [], "sap": []}
        for _ in range(n):
            task, batch = next(self.meta)
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, loss = pretrain_step(
                self.params, self.opt_state, self.cfg.planner, self.tx,
                task, self._put(batch), sub)
            losses[task].append(float(loss))
            self.step += 1
        return {f"{k}_loss": float(np.mean(v)) for k, v in losses.items()
                if v}

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
        return {
            "mlm_acc": mlm_correct / max(mlm_total, 1),
            "sap_acc": sap_correct / max(sap_total, 1),
        }
