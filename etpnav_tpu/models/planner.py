"""Cross-modal topological planner (TPU-native GlocalTextPathNavCMT).

Functional parity target: models/etp/vilmodel_cmt.py:663-750 —
- forward_txt       (:684): BERT embeddings + 9-layer language encoder
- forward_panorama  (:690): RGB/depth/angle fusion + 2-layer pre-norm pano
                            encoder
- forward_navigation(:721): graph node embedding + 4 graph-aware cross-modal
                            layers with spatial-relation attention bias +
                            SAP head producing per-node action logits

All inputs are fixed-shape padded arrays with boolean masks (TPU static
shapes); ragged assembly happens host-side in etpnav_tpu.graph.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from etpnav_tpu.config import PlannerConfig
from etpnav_tpu.models import bert_core
from etpnav_tpu.models.bert_core import (
    BertDims,
    bert_embeddings,
    bert_embeddings_init,
    bert_stack,
    bert_stack_init,
    bert_ffn,
    bert_ffn_init,
    prenorm_stack,
    prenorm_stack_init,
)
from etpnav_tpu.ops.attention import (
    cross_attention_block,
    self_attention_block,
    self_attention_block_init,
)
from etpnav_tpu.ops.basic import (
    layer_norm,
    linear,
    linear_init,
    ln_init,
    mask_to_bias,
    maybe_dropout,
    trunc_normal,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_planner_params(key: jax.Array, cfg: PlannerConfig,
                        use_lang2visn: bool = False) -> dict:
    keys = jax.random.split(key, 12)
    params = {
        "embeddings": bert_embeddings_init(
            keys[0], cfg.vocab_size, cfg.hidden_size,
            cfg.max_position_embeddings, cfg.type_vocab_size),
        "lang_encoder": bert_stack_init(
            keys[1], cfg.num_l_layers, cfg.hidden_size,
            cfg.intermediate_size),
        "img_embeddings": {
            "img_linear": linear_init(keys[2], cfg.image_feat_size,
                                      cfg.hidden_size),
            "img_ln": ln_init(cfg.hidden_size),
            "loc_linear": linear_init(keys[3], cfg.angle_feat_size,
                                      cfg.hidden_size),
            "loc_ln": ln_init(cfg.hidden_size),
            "nav_type_embedding": trunc_normal(
                keys[4], (cfg.num_nav_types, cfg.hidden_size)),
            "ln": ln_init(cfg.hidden_size),
            "pano_encoder": prenorm_stack_init(
                keys[5], cfg.num_pano_layers, cfg.hidden_size,
                cfg.intermediate_size),
        },
        "global_encoder": {
            "gmap_pos_embeddings": {
                "dense": linear_init(keys[6], cfg.angle_feat_size + 3,
                                     cfg.hidden_size),
                "ln": ln_init(cfg.hidden_size),
            },
            "gmap_step_embeddings": trunc_normal(
                keys[7], (cfg.max_action_steps, cfg.hidden_size)),
            "encoder": _x_stack_init(keys[8], cfg, use_lang2visn),
        },
        "global_sap_head": _sap_head_init(keys[9], cfg.hidden_size),
    }
    if cfg.use_depth_embedding:
        params["img_embeddings"]["dep_linear"] = linear_init(
            keys[10], cfg.depth_feat_size, cfg.hidden_size)
        params["img_embeddings"]["dep_ln"] = ln_init(cfg.hidden_size)
    if cfg.graph_sprels:
        params["global_encoder"]["sprel_linear"] = linear_init(
            keys[11], 1, 1)
    return params


def _x_layer_init(key: jax.Array, cfg: PlannerConfig,
                  use_lang2visn: bool = False) -> dict:
    """GraphLXRTXLayer params (vilmodel_cmt.py:365-398):
    cross-attn + visn self-attn + FFN; pretraining adds the lang branch
    (lang_self_att + lang FFN) used by forward_lang2visn
    (pretrain vilmodel.py:400-411)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "visual_attention": self_attention_block_init(k1, cfg.hidden_size),
        "visn_self_att": self_attention_block_init(k2, cfg.hidden_size),
        "visn_ffn": bert_ffn_init(k3, cfg.hidden_size,
                                  cfg.intermediate_size),
    }
    if use_lang2visn:
        params["lang_self_att"] = self_attention_block_init(
            k4, cfg.hidden_size)
        params["lang_ffn"] = bert_ffn_init(k5, cfg.hidden_size,
                                           cfg.intermediate_size)
    return params


def _x_stack_init(key: jax.Array, cfg: PlannerConfig,
                  use_lang2visn: bool = False) -> dict:
    keys = jax.random.split(key, cfg.num_x_layers)
    layers = [_x_layer_init(k, cfg, use_lang2visn) for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _sap_head_init(key: jax.Array, hidden: int) -> dict:
    """NextActionPrediction (vilmodel_cmt.py:651-661):
    Linear, ReLU, LN(1e-12), Dropout(0.1), Linear(h,1)."""
    k1, k2 = jax.random.split(key)
    return {
        "dense1": linear_init(k1, hidden, hidden),
        "ln": ln_init(hidden),
        "dense2": linear_init(k2, hidden, 1),
    }


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------

def _lang_dims(cfg: PlannerConfig) -> BertDims:
    return BertDims(cfg.hidden_size, cfg.num_heads, cfg.intermediate_size,
                    cfg.lang_layer_norm_eps, cfg.hidden_dropout,
                    cfg.attn_dropout)


def _vis_dims(cfg: PlannerConfig) -> BertDims:
    return BertDims(cfg.hidden_size, cfg.num_heads, cfg.intermediate_size,
                    cfg.vis_layer_norm_eps, cfg.hidden_dropout,
                    cfg.attn_dropout)


def forward_txt(params: dict, cfg: PlannerConfig, txt_ids: jax.Array,
                txt_masks: jax.Array, *, rng: Optional[jax.Array] = None,
                train: bool = False) -> jax.Array:
    """(B, L) token ids + (B, L) bool mask -> (B, L, D) text memory."""
    r1, r2 = _split(rng)
    x = bert_embeddings(params["embeddings"], txt_ids,
                        cfg.lang_layer_norm_eps,
                        hidden_dropout=cfg.hidden_dropout, rng=r1,
                        train=train)
    bias = mask_to_bias(txt_masks)[:, None, None, :]
    # bf16 activations in train too (the reference trains under AMP
    # fp16, ss_trainer_ETP.py:463,502-506); params stay fp32 masters
    if cfg.use_bf16:
        x = x.astype(jnp.bfloat16)
    return bert_stack(params["lang_encoder"], x, bias, _lang_dims(cfg),
                      rng=r2, train=train).astype(jnp.float32)


def forward_panorama(params: dict, cfg: PlannerConfig, rgb_fts: jax.Array,
                     dep_fts: jax.Array, loc_fts: jax.Array,
                     nav_types: jax.Array, view_masks: jax.Array, *,
                     rng: Optional[jax.Array] = None,
                     train: bool = False):
    """Panorama view fusion + 2-layer pre-norm encoder
    (vilmodel_cmt.py:690-719).

    rgb_fts (B,P,512), dep_fts (B,P,128), loc_fts (B,P,4),
    nav_types (B,P) int {0,1}, view_masks (B,P) bool.
    Returns pano_embeds (B,P,D), view_masks.
    """
    ie = params["img_embeddings"]
    r1, r2 = _split(rng)

    x = layer_norm(linear(ie["img_linear"], rgb_fts),
                   ie["img_ln"]["scale"], ie["img_ln"]["bias"],
                   cfg.vis_layer_norm_eps)
    if cfg.use_depth_embedding:
        x = x + layer_norm(linear(ie["dep_linear"], dep_fts),
                           ie["dep_ln"]["scale"], ie["dep_ln"]["bias"],
                           cfg.vis_layer_norm_eps)
    x = x + layer_norm(linear(ie["loc_linear"], loc_fts),
                       ie["loc_ln"]["scale"], ie["loc_ln"]["bias"],
                       cfg.vis_layer_norm_eps)
    x = x + ie["nav_type_embedding"][nav_types]
    # + token_type_embeddings(1) from the text embedding table
    x = x + params["embeddings"]["token_type_embeddings"][1][None, None, :]
    x = layer_norm(x, ie["ln"]["scale"], ie["ln"]["bias"],
                   cfg.vis_layer_norm_eps)
    x = maybe_dropout(x, cfg.hidden_dropout, r1, train)

    bias = mask_to_bias(view_masks)[:, None, None, :]
    # torch MultiheadAttention LayerNorms inside the pre-norm layer use 1e-5
    pano_dims = BertDims(cfg.hidden_size, cfg.num_heads,
                         cfg.intermediate_size, 1e-5, cfg.hidden_dropout,
                         cfg.attn_dropout)
    if cfg.use_bf16:
        x = x.astype(jnp.bfloat16)
    x = prenorm_stack(ie["pano_encoder"], x, bias, pano_dims,
                      cfg.vis_layer_norm_eps, rng=r2, train=train)
    return x.astype(jnp.float32), view_masks


def _x_layer(layer_params: dict, cfg: PlannerConfig, visn: jax.Array,
             txt: jax.Array, txt_bias: jax.Array, visn_bias: jax.Array, *,
             rng: Optional[jax.Array] = None, train: bool = False
             ) -> jax.Array:
    """GraphLXRTXLayer.forward (vilmodel_cmt.py:383-398): cross-attn into
    text, then self-attn with sprel-augmented bias, then FFN."""
    r1, r2, r3 = _split3(rng)
    dims = _vis_dims(cfg)
    visn = cross_attention_block(
        layer_params["visual_attention"], visn, txt, cfg.num_heads,
        txt_bias, dims.eps, hidden_dropout=dims.hidden_dropout,
        attn_dropout=dims.attn_dropout, rng=r1, train=train)
    visn = self_attention_block(
        layer_params["visn_self_att"], visn, cfg.num_heads, visn_bias,
        dims.eps, hidden_dropout=dims.hidden_dropout,
        attn_dropout=dims.attn_dropout, rng=r2, train=train)
    return bert_ffn(layer_params["visn_ffn"], visn, dims.eps,
                    hidden_dropout=dims.hidden_dropout, rng=r3, train=train)


def _x_stack(params: dict, cfg: PlannerConfig, visn: jax.Array,
             txt: jax.Array, txt_bias: jax.Array, visn_bias: jax.Array, *,
             rng: Optional[jax.Array] = None, train: bool = False
             ) -> jax.Array:
    num_layers = cfg.num_x_layers
    remat_kw = {}
    if cfg.remat_scan and cfg.remat_policy:
        # named saveable policy (e.g. dots_with_no_batch_dims_saveable):
        # backward keeps the policy's tensors and recomputes the rest
        remat_kw["policy"] = getattr(jax.checkpoint_policies,
                                     cfg.remat_policy)
    if rng is None:
        def body(h, layer_params):
            return _x_layer(layer_params, cfg, h, txt, txt_bias, visn_bias,
                            train=train), None
        if cfg.remat_scan:
            body = jax.checkpoint(body, **remat_kw)
        visn, _ = jax.lax.scan(body, visn, params,
                               unroll=bert_core.SCAN_UNROLL)
    else:
        rngs = jax.random.split(rng, num_layers)

        def body(h, xs):
            layer_params, layer_rng = xs
            return _x_layer(layer_params, cfg, h, txt, txt_bias, visn_bias,
                            rng=layer_rng, train=train), None
        if cfg.remat_scan:
            # per-layer remat: backward saves only the (B, G, D) layer
            # boundary and recomputes each layer's attention internals —
            # the (B, heads, G, L)/(B, heads, G, G) probs never persist
            # across the whole stack. No-op for forward-only programs.
            body = jax.checkpoint(body, **remat_kw)
        visn, _ = jax.lax.scan(body, visn, (params, rngs),
                               unroll=bert_core.SCAN_UNROLL)
    return visn


def _lang2visn_layer(layer_params: dict, cfg: PlannerConfig,
                     lang: jax.Array, visn: jax.Array, lang_bias: jax.Array,
                     visn_bias: jax.Array, *,
                     rng: Optional[jax.Array] = None,
                     train: bool = False) -> jax.Array:
    """GraphLXRTXLayer.forward_lang2visn (vilmodel_cmt.py:400-411): lang
    cross-attends into visn (sharing visual_attention weights), then lang
    self-attn + FFN."""
    r1, r2, r3 = _split3(rng)
    dims = _vis_dims(cfg)
    lang = cross_attention_block(
        layer_params["visual_attention"], lang, visn, cfg.num_heads,
        visn_bias, dims.eps, hidden_dropout=dims.hidden_dropout,
        attn_dropout=dims.attn_dropout, rng=r1, train=train)
    lang = self_attention_block(
        layer_params["lang_self_att"], lang, cfg.num_heads, lang_bias,
        dims.eps, hidden_dropout=dims.hidden_dropout,
        attn_dropout=dims.attn_dropout, rng=r2, train=train)
    return bert_ffn(layer_params["lang_ffn"], lang, dims.eps,
                    hidden_dropout=dims.hidden_dropout, rng=r3, train=train)


def lang2visn_stack(params: dict, cfg: PlannerConfig, lang: jax.Array,
                    visn: jax.Array, lang_bias: jax.Array,
                    visn_bias: jax.Array, *,
                    rng: Optional[jax.Array] = None,
                    train: bool = False) -> jax.Array:
    """MLM path over the global-encoder x-layers (pretrain
    vilmodel.py:731-741)."""
    if rng is None:
        def body(h, layer_params):
            return _lang2visn_layer(layer_params, cfg, h, visn, lang_bias,
                                    visn_bias, train=train), None
        lang, _ = jax.lax.scan(body, lang, params,
                               unroll=bert_core.SCAN_UNROLL)
    else:
        rngs = jax.random.split(rng, cfg.num_x_layers)

        def body(h, xs):
            layer_params, layer_rng = xs
            return _lang2visn_layer(layer_params, cfg, h, visn, lang_bias,
                                    visn_bias, rng=layer_rng,
                                    train=train), None
        lang, _ = jax.lax.scan(body, lang, (params, rngs),
                               unroll=bert_core.SCAN_UNROLL)
    return lang


def local_encoder_init(key: jax.Array, cfg: PlannerConfig) -> dict:
    """LocalVPEncoder (pretrain vilmodel.py:537-568): 14-d vp position
    embedding + CrossmodalEncoder over the final viewpoint's tokens. The
    reference defines this class but leaves its wiring commented out
    (vilmodel.py:663,700-704); here it is a live branch used by the MRC/OG
    proxy tasks."""
    k1, k2 = jax.random.split(key)
    return {
        "vp_pos_embeddings": {
            "dense": linear_init(k1, cfg.angle_feat_size * 2 + 6,
                                 cfg.hidden_size),
            "ln": ln_init(cfg.hidden_size),
        },
        "encoder": _x_stack_init(k2, cfg),
    }


def forward_local(params: dict, cfg: PlannerConfig, txt_embeds: jax.Array,
                  txt_masks: jax.Array, vp_tok_embeds: jax.Array,
                  vp_tok_masks: jax.Array, vp_pos_fts: jax.Array, *,
                  rng: Optional[jax.Array] = None,
                  train: bool = False) -> jax.Array:
    """LocalVPEncoder.forward (pretrain vilmodel.py:561-568).

    vp_tok_embeds (B,P,D) pano-encoder outputs of the FINAL step,
    vp_tok_masks (B,P) bool, vp_pos_fts (B,1+P,14) with row 0 = [stop].
    Returns vp_embeds (B,1+P,D): [stop] token first.
    """
    le = params["local_encoder"]
    B, P, D = vp_tok_embeds.shape
    stop = jnp.zeros((B, 1, D), vp_tok_embeds.dtype)
    x = jnp.concatenate([stop, vp_tok_embeds], axis=1)
    pos = layer_norm(linear(le["vp_pos_embeddings"]["dense"], vp_pos_fts),
                     le["vp_pos_embeddings"]["ln"]["scale"],
                     le["vp_pos_embeddings"]["ln"]["bias"],
                     cfg.vis_layer_norm_eps)
    x = x + pos
    masks = jnp.concatenate(
        [jnp.ones((B, 1), bool), vp_tok_masks], axis=1)
    txt_bias = mask_to_bias(txt_masks)[:, None, None, :]
    visn_bias = mask_to_bias(masks)[:, None, None, :]
    dtype = jnp.bfloat16 if cfg.use_bf16 else x.dtype
    return _x_stack(le["encoder"], cfg, x.astype(dtype),
                    txt_embeds.astype(dtype), txt_bias, visn_bias, rng=rng,
                    train=train).astype(jnp.float32)


def region_head_init(key: jax.Array, hidden: int, label_dim: int) -> dict:
    """RegionClassification for MRC (pretrain_cmt.py:12-23):
    Linear(h,h), ReLU, LN(1e-12), Linear(h,label_dim)."""
    k1, k2 = jax.random.split(key)
    return {
        "dense1": linear_init(k1, hidden, hidden),
        "ln": ln_init(hidden),
        "dense2": linear_init(k2, hidden, label_dim),
    }


def region_head(params: dict, x: jax.Array, eps: float) -> jax.Array:
    h = jax.nn.relu(linear(params["dense1"], x))
    h = layer_norm(h, params["ln"]["scale"], params["ln"]["bias"], eps)
    return linear(params["dense2"], h)


def cls_head_init(key: jax.Array, hidden: int) -> dict:
    """ClsPrediction (pretrain_cmt.py:25-35): Linear, ReLU, LN(1e-12),
    Linear(h,1) — used by the OG head."""
    k1, k2 = jax.random.split(key)
    return {
        "dense1": linear_init(k1, hidden, hidden),
        "ln": ln_init(hidden),
        "dense2": linear_init(k2, hidden, 1),
    }


def cls_head(params: dict, x: jax.Array, eps: float) -> jax.Array:
    h = jax.nn.relu(linear(params["dense1"], x))
    h = layer_norm(h, params["ln"]["scale"], params["ln"]["bias"], eps)
    return linear(params["dense2"], h)[..., 0]


def mlm_head_init(key: jax.Array, cfg: PlannerConfig) -> dict:
    """BertOnlyMLMHead (vilmodel_cmt.py:258-299): transform dense + LN +
    tied decoder (weights = word embeddings) + output bias."""
    return {
        "transform": linear_init(key, cfg.hidden_size, cfg.hidden_size),
        "ln": ln_init(cfg.hidden_size),
        "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def mlm_head(params: dict, word_embeddings: jax.Array, x: jax.Array,
             eps: float) -> jax.Array:
    """x (..., D) -> vocab logits, decoder tied to word embeddings
    (pretrain_cmt.py:80-83)."""
    from etpnav_tpu.ops.basic import gelu_erf
    h = gelu_erf(linear(params["transform"], x))
    h = layer_norm(h, params["ln"]["scale"], params["ln"]["bias"], eps)
    logits = jnp.dot(h, word_embeddings.T.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    return logits + params["bias"]


def sap_head(params: dict, x: jax.Array, eps: float, *,
             rng: Optional[jax.Array] = None, train: bool = False,
             dropout: float = 0.1) -> jax.Array:
    """NextActionPrediction -> (B, G) scalar logits."""
    h = jax.nn.relu(linear(params["dense1"], x))
    h = layer_norm(h, params["ln"]["scale"], params["ln"]["bias"], eps)
    h = maybe_dropout(h, dropout, rng, train)
    return linear(params["dense2"], h)[..., 0]


def forward_navigation(params: dict, cfg: PlannerConfig,
                       txt_embeds: jax.Array, txt_masks: jax.Array,
                       gmap_img_fts: jax.Array, gmap_step_ids: jax.Array,
                       gmap_pos_fts: jax.Array, gmap_masks: jax.Array,
                       gmap_visited_masks: jax.Array,
                       gmap_pair_dists: jax.Array, *,
                       rng: Optional[jax.Array] = None,
                       train: bool = False) -> dict:
    """Global action scoring (vilmodel_cmt.py:721-750).

    gmap_img_fts (B,G,D) pre-aggregated node features, gmap_step_ids (B,G)
    int, gmap_pos_fts (B,G,7), masks (B,G) bool, pair_dists (B,G,G).
    Returns {'gmap_embeds': (B,G,D), 'global_logits': (B,G)}.
    """
    ge = params["global_encoder"]
    r1, r2 = _split(rng)

    pos = layer_norm(linear(ge["gmap_pos_embeddings"]["dense"],
                            gmap_pos_fts),
                     ge["gmap_pos_embeddings"]["ln"]["scale"],
                     ge["gmap_pos_embeddings"]["ln"]["bias"],
                     cfg.vis_layer_norm_eps)
    x = gmap_img_fts + ge["gmap_step_embeddings"][gmap_step_ids] + pos

    txt_bias = mask_to_bias(txt_masks)[:, None, None, :]
    visn_bias = mask_to_bias(gmap_masks)[:, None, None, :]
    if cfg.graph_sprels:
        sl = ge["sprel_linear"]
        sprel = gmap_pair_dists[..., None] * sl["w"][0, 0] + sl["b"][0]
        visn_bias = visn_bias + sprel[..., 0][:, None, :, :]

    nav_bf16 = (cfg.use_bf16 if cfg.nav_use_bf16 is None
                else cfg.nav_use_bf16)
    dtype = jnp.bfloat16 if nav_bf16 else x.dtype
    gmap_embeds = _x_stack(ge["encoder"], cfg, x.astype(dtype),
                           txt_embeds.astype(dtype), txt_bias, visn_bias,
                           rng=r1, train=train).astype(jnp.float32)

    logits = sap_head(params["global_sap_head"], gmap_embeds,
                      cfg.vis_layer_norm_eps, rng=r2, train=train)
    logits = jnp.where(gmap_visited_masks, -jnp.inf, logits)
    logits = jnp.where(gmap_masks, logits, -jnp.inf)
    return {"gmap_embeds": gmap_embeds, "global_logits": logits}


def _split(rng):
    if rng is None:
        return None, None
    return jax.random.split(rng)


def _split3(rng):
    if rng is None:
        return None, None, None
    return jax.random.split(rng, 3)
