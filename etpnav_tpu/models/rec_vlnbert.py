"""Recurrent VLN-BERT (PREVALENT) legacy policy, TPU-native.

Capability target: the reference's legacy waypoint-candidate policy —
vlnce_baselines/models/vlnbert/vlnbert_PREVALENT.py (VLNBert: 9 language
layers + 4 LXRT cross-modal layers with a recurrent [STATE] token) plus
the candidate-feature fusion its dagger_trainer drives through
``policy.net(mode='navigation', cand_rgb=..., cand_depth=...,
cand_direction=...)`` (dagger_trainer.py:291-302). Note the reference
repo itself ships this path without the fusing policy module (the CMA
policy class was dropped when ETPNav was extracted from the VLN-CE
waypoint codebase), so the dagger trainer there is partially dead code;
here the full path is implemented and tested.

Behavioral map (reference -> here):
- ``mode='language'`` (vlnbert_PREVALENT.py:400-416): BERT embeddings ->
  9 self-attention layers -> (pooled state h_t, sequence features).
  RxR instructions arrive as precomputed 768-d features and skip the
  embedding table (vlnbert_PREVALENT.py:402-404).
- ``mode='visual'`` (vlnbert_PREVALENT.py:419-447): per navigation step,
  the state token (lang slot 0, refreshed with h_t) is prepended to the
  candidate tokens; each LXRT layer runs cross-attention ([state; cand]
  attends language[1:]), then self-attention over [state; cand], then an
  FFN (LXRTXLayer.forward:322-342). Action logits are the LAST layer's
  state-row self-attention scores over the candidate rows, averaged over
  heads *pre-softmax* (vlnbert_PREVALENT.py:340,445); the new h_t is the
  pooler applied to the updated state token (:443).
- The reference initializes language-branch modules inside every
  LXRTXLayer (lang_self_att/lang_inter/lang_output, :296-298) but its
  forward never calls them (:322-342 only touch the visual branch) —
  dead parameters. They are deliberately not replicated here.

TPU design: the 9 language layers and 4 cross-modal layers are stacked
on a leading axis and executed with lax.scan (one compiled body per
stack); all candidate sets are fixed-size masked arrays; the per-step
recurrence is a single jitted device program whose state is an explicit
(B, H) array carried by the trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from etpnav_tpu.models.bert_core import (
    BertDims,
    bert_embeddings,
    bert_embeddings_init,
    bert_ffn,
    bert_ffn_init,
    bert_stack,
    bert_stack_init,
)
from etpnav_tpu.ops.attention import (
    cross_attention_block,
    mha,
    self_attention_block_init,
)
from etpnav_tpu.ops.basic import (
    layer_norm,
    linear,
    linear_init,
    ln_init,
    maybe_dropout,
)

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class RecVLNBertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    la_layers: int = 9          # language self-attention depth
    vl_layers: int = 4          # cross-modal LXRT depth
    max_pos: int = 512
    type_vocab: int = 2
    eps: float = 1e-12
    rgb_dim: int = 512          # CLIP ViT-B/32 pooled feature
    depth_dim: int = 128        # DD-PPO ResNet bottleneck feature
    angle_dim: int = 4          # [sin h, cos h, sin e, cos e]
    max_cands: int = 12         # fixed candidate slots (masked)
    hidden_dropout: float = 0.1
    attn_dropout: float = 0.1
    pad_token_id: int = 0

    def dims(self) -> BertDims:
        return BertDims(self.hidden, self.heads, self.intermediate,
                        self.eps, self.hidden_dropout, self.attn_dropout)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _xlayer_init(key: jax.Array, cfg: RecVLNBertConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        # BertXAttention: q from visn, kv from language (:304)
        "cross": self_attention_block_init(k1, cfg.hidden),
        # visn self-attention over [state; candidates] (:300)
        "self": self_attention_block_init(k2, cfg.hidden),
        # visn FFN (:301-302)
        "ffn": bert_ffn_init(k3, cfg.hidden, cfg.intermediate),
    }


def init_params(key: jax.Array, cfg: RecVLNBertConfig) -> dict:
    keys = jax.random.split(key, 9)
    xlayers = [_xlayer_init(k, cfg)
               for k in jax.random.split(keys[2], cfg.vl_layers)]
    return {
        "embeddings": bert_embeddings_init(
            keys[0], cfg.vocab_size, cfg.hidden, cfg.max_pos,
            cfg.type_vocab),
        "lalayer": bert_stack_init(keys[1], cfg.la_layers, cfg.hidden,
                                   cfg.intermediate),
        "addlayer": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *xlayers),
        "pooler": linear_init(keys[3], cfg.hidden, cfg.hidden),
        # candidate fusion: per-modality projection + LN, merged linearly
        # (the VLN-CE waypoint codebase's vismerge pattern; absent from
        # the reference repo — see module docstring)
        "rgb_proj": linear_init(keys[4], cfg.rgb_dim, cfg.hidden),
        "rgb_ln": ln_init(cfg.hidden),
        "depth_proj": linear_init(keys[5], cfg.depth_dim, cfg.hidden),
        "depth_ln": ln_init(cfg.hidden),
        "dir_proj": linear_init(keys[6], cfg.angle_dim, cfg.hidden),
        "dir_ln": ln_init(cfg.hidden),
        "vismerge": linear_init(keys[7], 3 * cfg.hidden, cfg.hidden),
        "vis_ln": ln_init(cfg.hidden),
    }


# ---------------------------------------------------------------------------
# language branch (mode='language')
# ---------------------------------------------------------------------------

def _mask_bias(mask: jax.Array) -> jax.Array:
    """(B, L) boolean -> additive (B, 1, 1, L) bias
    (vlnbert_PREVALENT.py:393-396 uses -10000; NEG_INF keeps masked rows
    numerically inert in fp32)."""
    return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, None]


def _pooler(params: dict, seq: jax.Array) -> jax.Array:
    """tanh(W seq[:, 0]) (BertPooler, vlnbert_PREVALENT.py:208-220)."""
    return jnp.tanh(linear(params["pooler"], seq[:, 0]))


def encode_language(params: dict, cfg: RecVLNBertConfig,
                    tokens: Optional[jax.Array],
                    mask: jax.Array, *,
                    text_feats: Optional[jax.Array] = None,
                    rng: Optional[jax.Array] = None,
                    train: bool = False) -> Tuple[jax.Array, jax.Array]:
    """(B, L) token ids (R2R) or (B, L, 768) features (RxR) ->
    (state h_t (B, H), lang_feats (B, L, H)).

    vlnbert_PREVALENT.py:400-416: embeddings (skipped for precomputed RxR
    features) -> la_layers self-attention -> pooled first token.
    """
    r1, r2 = _split(rng)
    if text_feats is not None:
        x = text_feats
    else:
        x = bert_embeddings(params["embeddings"], tokens, cfg.eps,
                            hidden_dropout=cfg.hidden_dropout,
                            rng=r1, train=train)
    x = bert_stack(params["lalayer"], x, _mask_bias(mask), cfg.dims(),
                   rng=r2, train=train)
    return _pooler(params, x), x


# ---------------------------------------------------------------------------
# candidate fusion + navigation step (mode='visual')
# ---------------------------------------------------------------------------

def fuse_candidates(params: dict, cfg: RecVLNBertConfig,
                    cand_rgb: jax.Array, cand_depth: jax.Array,
                    cand_dir: jax.Array, *,
                    rng: Optional[jax.Array] = None,
                    train: bool = False) -> jax.Array:
    """(B, K, rgb/depth/angle dims) -> (B, K, H) candidate tokens."""
    r = jax.nn.relu
    h = jnp.concatenate([
        layer_norm(r(linear(params["rgb_proj"], cand_rgb)),
                   params["rgb_ln"]["scale"], params["rgb_ln"]["bias"],
                   cfg.eps),
        layer_norm(r(linear(params["depth_proj"], cand_depth)),
                   params["depth_ln"]["scale"], params["depth_ln"]["bias"],
                   cfg.eps),
        layer_norm(r(linear(params["dir_proj"], cand_dir)),
                   params["dir_ln"]["scale"], params["dir_ln"]["bias"],
                   cfg.eps),
    ], axis=-1)
    h = linear(params["vismerge"], h)
    h = layer_norm(h, params["vis_ln"]["scale"], params["vis_ln"]["bias"],
                   cfg.eps)
    return maybe_dropout(h, cfg.hidden_dropout, rng, train)


def _self_att_scores(block: dict, x: jax.Array, bias: jax.Array,
                     cfg: RecVLNBertConfig, *,
                     rng: Optional[jax.Array] = None,
                     train: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """Self-attention sub-block that also returns the raw pre-softmax
    state-row scores (BertSelfAttention outputs attention_scores,
    vlnbert_PREVALENT.py:132; the action head reads row 0 of them,
    :340). Mirrors ops.attention.self_attention_block exactly, with the
    q/k logits recomputed once more for the score output — two small
    GEMMs, fused by XLA into the same pass."""
    r1, r2 = _split(rng)
    attn_p = {**block["attn"], "o": block["out"]["dense"]}
    h = mha(attn_p, x, x, cfg.heads, bias,
            attn_dropout=cfg.attn_dropout, rng=r1, train=train)
    h = maybe_dropout(h, cfg.hidden_dropout, r2, train)
    out = layer_norm(x + h, block["out"]["ln"]["scale"],
                     block["out"]["ln"]["bias"], cfg.eps)
    B, L, D = x.shape
    hd = D // cfg.heads
    q0 = linear(block["attn"]["q"], x[:, :1]).reshape(B, 1, cfg.heads, hd)
    k = linear(block["attn"]["k"], x).reshape(B, L, cfg.heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhk", q0, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(hd)))
    scores = scores + bias.astype(jnp.float32)[:, :, 0]
    return out, scores               # (B, L, D), (B, heads, L)


def nav_step(params: dict, cfg: RecVLNBertConfig, state: jax.Array,
             lang_feats: jax.Array, lang_mask: jax.Array,
             cand_rgb: jax.Array, cand_depth: jax.Array,
             cand_dir: jax.Array, cand_mask: jax.Array, *,
             rng: Optional[jax.Array] = None, train: bool = False
             ) -> Tuple[jax.Array, jax.Array]:
    """One recurrent navigation decision.

    state (B, H); lang_feats (B, L, H) from encode_language (slot 0 is
    refreshed with the state, dagger_trainer.py:272); candidates are
    fixed (B, K, ·) arrays with cand_mask (B, K). Returns
    (logits (B, K) with masked slots at NEG_INF, new_state (B, H)).
    """
    r1, r2 = _split(rng)
    B = lang_feats.shape[0]

    vis = fuse_candidates(params, cfg, cand_rgb, cand_depth, cand_dir,
                          rng=r1, train=train)
    x = jnp.concatenate([state[:, None], vis], axis=1)  # [state; cands]

    # language keys exclude the state slot (vlnbert_PREVALENT.py:330);
    # the state token participates only via the [state; cands] stream
    lang_kv = lang_feats[:, 1:]
    lang_bias = _mask_bias(lang_mask[:, 1:])
    sv_mask = jnp.concatenate(
        [jnp.ones((B, 1), bool), cand_mask], axis=1)
    sv_bias = _mask_bias(sv_mask)

    num_layers = cfg.vl_layers
    rngs = (jax.random.split(r2, num_layers) if r2 is not None
            else jnp.zeros((num_layers, 2), jnp.uint32))

    def body(h, xs):
        layer, layer_rng = xs
        lr = layer_rng if r2 is not None else None
        l1, l2, l3 = _split3(lr)
        h = cross_attention_block(
            layer["cross"], h, lang_kv, cfg.heads, lang_bias, cfg.eps,
            hidden_dropout=cfg.hidden_dropout,
            attn_dropout=cfg.attn_dropout, rng=l1, train=train)
        h, scores = _self_att_scores(layer["self"], h, sv_bias, cfg,
                                     rng=l2, train=train)
        h = bert_ffn(layer["ffn"], h, cfg.eps,
                     hidden_dropout=cfg.hidden_dropout, rng=l3,
                     train=train)
        return h, scores

    x, all_scores = jax.lax.scan(body, x, (params["addlayer"], rngs))

    # mean over heads of the LAST layer's raw state->candidate scores
    # (vlnbert_PREVALENT.py:340,445)
    logits = all_scores[-1][:, :, 1:].mean(axis=1)     # (B, K)
    logits = jnp.where(cand_mask, logits, NEG_INF)
    new_state = _pooler(params, x)
    return logits, new_state


# ---------------------------------------------------------------------------
# supervised (DAgger) update over recorded candidate steps
# ---------------------------------------------------------------------------

def sequence_nll(params: dict, cfg: RecVLNBertConfig, tokens: jax.Array,
                 lang_mask: jax.Array, cand_rgb: jax.Array,
                 cand_depth: jax.Array, cand_dir: jax.Array,
                 cand_mask: jax.Array, teacher: jax.Array,
                 step_mask: jax.Array, *,
                 rng: Optional[jax.Array] = None,
                 train: bool = True) -> jax.Array:
    """Mean teacher-action cross-entropy over recorded trajectories.

    tokens (B, L); candidate tensors (B, T, K, ·); teacher (B, T) int
    candidate indices; step_mask (B, T). The recurrence runs as a
    lax.scan over T, exactly the online decision path (the reference's
    dagger update replays stored features through the same policy,
    dagger_trainer.py:421-533).
    """
    r1, r2 = _split(rng)
    state0, lang_feats = encode_language(params, cfg, tokens, lang_mask,
                                         rng=r1, train=train)
    T = teacher.shape[1]
    step_rngs = (jax.random.split(r2, T) if r2 is not None
                 else jnp.zeros((T, 2), jnp.uint32))

    def step(state, xs):
        rgb_t, dep_t, dir_t, cm_t, step_rng = xs
        sr = step_rng if r2 is not None else None
        logits, state = nav_step(params, cfg, state, lang_feats,
                                 lang_mask, rgb_t, dep_t, dir_t, cm_t,
                                 rng=sr, train=train)
        return state, logits

    _, logits = jax.lax.scan(
        step, state0,
        (cand_rgb.transpose(1, 0, 2, 3), cand_depth.transpose(1, 0, 2, 3),
         cand_dir.transpose(1, 0, 2, 3), cand_mask.transpose(1, 0, 2),
         step_rngs))
    logits = logits.transpose(1, 0, 2)                 # (B, T, K)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, teacher[..., None], axis=-1)[..., 0]
    return jnp.where(step_mask, nll, 0.0).sum() \
        / jnp.maximum(step_mask.sum(), 1)


def _split(rng):
    if rng is None:
        return None, None
    return jax.random.split(rng)


def _split3(rng):
    if rng is None:
        return None, None, None
    return jax.random.split(rng, 3)
