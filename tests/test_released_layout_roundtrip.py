"""Released-checkpoint key-layout round-trips with LOGIT equality.

A torch transcription of GlocalTextPathNavCMT (vilmodel_cmt.py:663-750)
and BinaryDistPredictor_TRM (waypoint_pred/TRM_net.py:9-88) whose
state_dicts use the EXACT released naming — including the DDP `module.`
wrapping, the fine-tune policy nesting ({'state_dict':
{'net.module.vln_bert.*', ...}}, ss_trainer_ETP.py:74-83,211-212), and
the pretrain layout (`bert.*` backbone + top-level `global_sap_head.*`)
that vlnbert_init.py:21-30 performs key surgery on. Round-tripping these
through models/convert.py and asserting logit equality pins the
converters to the real layouts before the released files are available
(VERDICT r1 Next #5).

The torch modules below are transcriptions for testing: module/attribute
names follow the reference exactly so .state_dict() emits the released
keys; forward math mirrors vilmodel_cmt.py eval behavior.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from etpnav_tpu.config import PlannerConfig, WaypointConfig
from etpnav_tpu.models import planner, waypoint
from etpnav_tpu.models.convert import (
    convert_full_policy,
    convert_planner,
    convert_waypoint,
)

CFG = PlannerConfig(
    vocab_size=99, hidden_size=48, num_heads=4, intermediate_size=96,
    max_position_embeddings=32, num_l_layers=3, num_pano_layers=2,
    num_x_layers=2, image_feat_size=24, depth_feat_size=12,
    max_txt_len=12, use_bf16=False, hidden_dropout=0.0, attn_dropout=0.0,
)

EPS = 1e-12


# ---------------------------------------------------------------------------
# torch building blocks with the reference's exact parameter naming
# ---------------------------------------------------------------------------

def _mh_attn(query_mod, key_mod, value_mod, x, kv, bias, heads):
    """Multi-head attention math of the vendored BertSelfAttention
    (additive mask bias already extended)."""
    B, Lq, D = x.shape
    dh = D // heads
    q = query_mod(x).view(B, Lq, heads, dh).transpose(1, 2)
    k = key_mod(kv).view(B, kv.shape[1], heads, dh).transpose(1, 2)
    v = value_mod(kv).view(B, kv.shape[1], heads, dh).transpose(1, 2)
    scores = q @ k.transpose(-1, -2) / math.sqrt(dh)
    if bias is not None:
        scores = scores + bias
    ctx = torch.softmax(scores, dim=-1) @ v
    return ctx.transpose(1, 2).reshape(B, Lq, D)


class _SelfAtt(nn.Module):                      # BertSelfAttention names
    def __init__(self, d):
        super().__init__()
        self.query = nn.Linear(d, d)
        self.key = nn.Linear(d, d)
        self.value = nn.Linear(d, d)


class _SelfOut(nn.Module):                      # BertSelfOutput names
    def __init__(self, d):
        super().__init__()
        self.dense = nn.Linear(d, d)
        self.LayerNorm = nn.LayerNorm(d, eps=EPS)

    def forward(self, ctx, residual):
        return self.LayerNorm(self.dense(ctx) + residual)


class _Attention(nn.Module):                    # BertAttention: self+output
    def __init__(self, d):
        super().__init__()
        self.add_module("self", _SelfAtt(d))
        self.output = _SelfOut(d)

    def forward(self, x, bias, heads):
        sa = getattr(self, "self")
        return self.output(_mh_attn(sa.query, sa.key, sa.value, x, x,
                                    bias, heads), x)


class _Intermediate(nn.Module):                 # BertIntermediate
    def __init__(self, d, ff):
        super().__init__()
        self.dense = nn.Linear(d, ff)

    def forward(self, x):
        return torch.nn.functional.gelu(self.dense(x))


class _Output(nn.Module):                       # BertOutput
    def __init__(self, ff, d):
        super().__init__()
        self.dense = nn.Linear(ff, d)
        self.LayerNorm = nn.LayerNorm(d, eps=EPS)

    def forward(self, h, residual):
        return self.LayerNorm(self.dense(h) + residual)


class _BertLayer(nn.Module):                    # BertLayer
    def __init__(self, d, ff):
        super().__init__()
        self.attention = _Attention(d)
        self.intermediate = _Intermediate(d, ff)
        self.output = _Output(ff, d)

    def forward(self, x, bias, heads):
        x = self.attention(x, bias, heads)
        return self.output(self.intermediate(x), x)


class _XAttention(nn.Module):                   # BertXAttention: att+output
    def __init__(self, d):
        super().__init__()
        self.att = _SelfAtt(d)
        self.output = _SelfOut(d)

    def forward(self, x, ctx, ctx_bias, heads):
        return self.output(_mh_attn(self.att.query, self.att.key,
                                    self.att.value, x, ctx, ctx_bias,
                                    heads), x)


class _GraphLXRTXLayer(nn.Module):              # GraphLXRTXLayer names
    def __init__(self, d, ff):
        super().__init__()
        self.visual_attention = _XAttention(d)
        self.visn_self_att = _Attention(d)
        self.visn_inter = _Intermediate(d, ff)
        self.visn_output = _Output(ff, d)

    def forward(self, txt, txt_bias, visn, visn_bias, heads):
        visn = self.visual_attention(visn, txt, txt_bias, heads)
        visn = self.visn_self_att(visn, visn_bias, heads)
        return self.visn_output(self.visn_inter(visn), visn)


class _Embeddings(nn.Module):                   # BertEmbeddings names
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_size
        self.word_embeddings = nn.Embedding(cfg.vocab_size, d)
        self.position_embeddings = nn.Embedding(
            cfg.max_position_embeddings, d)
        self.token_type_embeddings = nn.Embedding(cfg.type_vocab_size, d)
        self.LayerNorm = nn.LayerNorm(d, eps=EPS)

    def forward(self, ids):
        L = ids.shape[1]
        pos = torch.arange(L).unsqueeze(0)
        x = (self.word_embeddings(ids) + self.position_embeddings(pos)
             + self.token_type_embeddings(torch.zeros_like(ids)))
        return self.LayerNorm(x)


class _LangEncoder(nn.Module):                  # LanguageEncoder names
    def __init__(self, cfg):
        super().__init__()
        self.layer = nn.ModuleList(
            [_BertLayer(cfg.hidden_size, cfg.intermediate_size)
             for _ in range(cfg.num_l_layers)])


class _ImageEmbeddings(nn.Module):              # ImageEmbeddings names
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_size
        self.img_linear = nn.Linear(cfg.image_feat_size, d)
        self.img_layer_norm = nn.LayerNorm(d, eps=EPS)
        self.dep_linear = nn.Linear(cfg.depth_feat_size, d)
        self.dep_layer_norm = nn.LayerNorm(d, eps=EPS)
        self.loc_linear = nn.Linear(cfg.angle_feat_size, d)
        self.loc_layer_norm = nn.LayerNorm(d, eps=EPS)
        self.nav_type_embedding = nn.Embedding(2, d)
        self.layer_norm = nn.LayerNorm(d, eps=EPS)
        enc_layer = nn.TransformerEncoderLayer(
            d, cfg.num_heads, dim_feedforward=cfg.intermediate_size,
            dropout=0.0, activation="gelu", batch_first=True,
            norm_first=True)
        self.pano_encoder = nn.TransformerEncoder(
            enc_layer, cfg.num_pano_layers,
            norm=nn.LayerNorm(d, eps=EPS))


class _GlobalEncoder(nn.Module):                # GlobalMapEncoder names
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_size
        self.gmap_pos_embeddings = nn.Sequential(
            nn.Linear(cfg.angle_feat_size + 3, d),
            nn.LayerNorm(d, eps=EPS))
        self.gmap_step_embeddings = nn.Embedding(cfg.max_action_steps, d)

        class _Enc(nn.Module):                  # CrossmodalEncoder names
            def __init__(self):
                super().__init__()
                self.x_layers = nn.ModuleList(
                    [_GraphLXRTXLayer(d, cfg.intermediate_size)
                     for _ in range(cfg.num_x_layers)])
        self.encoder = _Enc()
        self.sprel_linear = nn.Linear(1, 1)


class _SapHead(nn.Module):                      # NextActionPrediction
    def __init__(self, d):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(d, d), nn.ReLU(),
                                 nn.LayerNorm(d, eps=EPS),
                                 nn.Dropout(0.0), nn.Linear(d, 1))


class TorchNavCMT(nn.Module):
    """GlocalTextPathNavCMT transcription (vilmodel_cmt.py:663-750):
    identical submodule names, eval-mode forward math."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.embeddings = _Embeddings(cfg)
        self.lang_encoder = _LangEncoder(cfg)
        self.img_embeddings = _ImageEmbeddings(cfg)
        self.global_encoder = _GlobalEncoder(cfg)
        self.global_sap_head = _SapHead(cfg.hidden_size)

    @staticmethod
    def _ext(mask):                             # extend_neg_masks
        return ((1.0 - mask.float()) * -10000.0)[:, None, None, :]

    def forward_txt(self, ids, mask):
        x = self.embeddings(ids)
        bias = self._ext(mask)
        for layer in self.lang_encoder.layer:
            x = layer(x, bias, self.cfg.num_heads)
        return x

    def forward_panorama(self, rgb, dep, loc, nav_types, view_masks):
        ie = self.img_embeddings
        x = ie.img_layer_norm(ie.img_linear(rgb))
        x = x + ie.dep_layer_norm(ie.dep_linear(dep))
        x = (x + ie.loc_layer_norm(ie.loc_linear(loc))
             + ie.nav_type_embedding(nav_types)
             + self.embeddings.token_type_embeddings(
                 torch.ones(1, 1, dtype=torch.long)))
        x = ie.layer_norm(x)
        return ie.pano_encoder(x, src_key_padding_mask=~view_masks)

    def forward_navigation(self, txt_embeds, txt_masks, gmap_img_fts,
                           gmap_step_ids, gmap_pos_fts, gmap_masks,
                           gmap_visited_masks, gmap_pair_dists):
        ge = self.global_encoder
        x = (gmap_img_fts + ge.gmap_step_embeddings(gmap_step_ids)
             + ge.gmap_pos_embeddings(gmap_pos_fts))
        txt_bias = self._ext(txt_masks)
        sprel = ge.sprel_linear(
            gmap_pair_dists.unsqueeze(3)).squeeze(3).unsqueeze(1)
        visn_bias = self._ext(gmap_masks) + sprel
        for layer in ge.encoder.x_layers:
            x = layer(txt_embeds, txt_bias, x, visn_bias,
                      self.cfg.num_heads)
        logits = self.global_sap_head.net(x).squeeze(2)
        logits = logits.masked_fill(gmap_visited_masks, -float("inf"))
        logits = logits.masked_fill(~gmap_masks, -float("inf"))
        return x, logits


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

def _inputs(g, B=2, G=6):
    L = CFG.max_txt_len
    ids = g.integers(1, CFG.vocab_size, (B, L))
    txt_mask = np.ones((B, L), bool)
    txt_mask[1, 8:] = False
    gmap_img = g.standard_normal((B, G, CFG.hidden_size)).astype(
        np.float32)
    step_ids = g.integers(0, 5, (B, G))
    pos_fts = g.standard_normal((B, G, CFG.angle_feat_size + 3)).astype(
        np.float32)
    gmask = np.ones((B, G), bool)
    gmask[0, 5:] = False
    visited = np.zeros((B, G), bool)
    visited[:, 1] = True
    dists = np.abs(g.standard_normal((B, G, G))).astype(np.float32)
    return ids, txt_mask, gmap_img, step_ids, pos_fts, gmask, visited, \
        dists


def _torch_logits(model, inputs):
    ids, txt_mask, gmap_img, step_ids, pos_fts, gmask, visited, dists = \
        inputs
    with torch.no_grad():
        txt = model.forward_txt(torch.from_numpy(ids),
                                torch.from_numpy(txt_mask))
        _, logits = model.forward_navigation(
            txt, torch.from_numpy(txt_mask), torch.from_numpy(gmap_img),
            torch.from_numpy(step_ids), torch.from_numpy(pos_fts),
            torch.from_numpy(gmask), torch.from_numpy(visited),
            torch.from_numpy(dists))
    return txt.numpy(), logits.numpy()


def _our_logits(params, inputs):
    ids, txt_mask, gmap_img, step_ids, pos_fts, gmask, visited, dists = \
        inputs
    txt = planner.forward_txt(params, CFG, jnp.asarray(ids),
                              jnp.asarray(txt_mask))
    out = planner.forward_navigation(
        params, CFG, txt, jnp.asarray(txt_mask), jnp.asarray(gmap_img),
        jnp.asarray(step_ids), jnp.asarray(pos_fts), jnp.asarray(gmask),
        jnp.asarray(visited), jnp.asarray(dists))
    return np.asarray(txt), np.asarray(out["global_logits"])


def _assert_logits_match(theirs, ours, mask, visited):
    live = mask & ~visited
    np.testing.assert_allclose(ours[live], theirs[live], atol=3e-5)
    assert np.isneginf(ours[~mask]).all()
    assert np.isneginf(ours[visited & mask]).all()


# ---------------------------------------------------------------------------
# the round-trips
# ---------------------------------------------------------------------------

def test_pretrain_layout_roundtrip():
    """Released pretrain ckpt layout (model_step_82500.pt): backbone keys
    under 'bert.', sap head at top level as 'global_sap_head.*' — the
    layout vlnbert_init.py:21-30 re-prefixes at load time. Extra head
    keys (mlm_head) must be ignored."""
    torch.manual_seed(0)
    model = TorchNavCMT(CFG).eval()
    sd = {}
    for k, v in model.state_dict().items():
        if k.startswith("global_sap_head."):
            sd[k] = v                           # saved unprefixed
        else:
            sd["bert." + k] = v                 # backbone under 'bert.'
    sd["mlm_head.predictions.bias"] = torch.zeros(CFG.vocab_size)

    params = convert_planner(sd, CFG.num_l_layers, CFG.num_pano_layers,
                             CFG.num_x_layers)
    inputs = _inputs(np.random.default_rng(0))
    _, theirs = _torch_logits(model, inputs)
    _, ours = _our_logits(params, inputs)
    _assert_logits_match(theirs, ours, inputs[5], inputs[6])


def test_pretrain_layout_roundtrip_module_wrapped():
    """Same layout saved before ModelSaver's module-strip (DDP run killed
    mid-save): every key additionally wrapped in 'module.'."""
    torch.manual_seed(1)
    model = TorchNavCMT(CFG).eval()
    sd = {}
    for k, v in model.state_dict().items():
        key = k if k.startswith("global_sap_head.") else "bert." + k
        sd["module." + key] = v
    params = convert_planner(sd, CFG.num_l_layers, CFG.num_pano_layers,
                             CFG.num_x_layers)
    inputs = _inputs(np.random.default_rng(1))
    _, theirs = _torch_logits(model, inputs)
    _, ours = _our_logits(params, inputs)
    _assert_logits_match(theirs, ours, inputs[5], inputs[6])


def test_finetune_layout_roundtrip_ddp_wrapped():
    """Released fine-tune ckpt (ckpt.iter12000.pth): {'state_dict':
    policy.state_dict()} where policy.net was DDP-wrapped, so planner
    keys read 'net.module.vln_bert.*' (ss_trainer_ETP.py:74-83,211-212).
    """
    torch.manual_seed(2)
    model = TorchNavCMT(CFG).eval()
    wrapped = {"state_dict": {
        f"net.module.vln_bert.{k}": v
        for k, v in model.state_dict().items()}}
    out = convert_full_policy(wrapped, planner_cfg=CFG)
    assert set(out) == {"planner"}
    inputs = _inputs(np.random.default_rng(2))
    _, theirs = _torch_logits(model, inputs)
    _, ours = _our_logits(out["planner"], inputs)
    _assert_logits_match(theirs, ours, inputs[5], inputs[6])


def test_panorama_path_roundtrip():
    """forward_panorama parity through the converted tree, incl. the
    token_type_embeddings(1) quirk and the pre-norm pano stack
    (vilmodel_cmt.py:690-719, MultiheadAttention packed qkv)."""
    torch.manual_seed(3)
    model = TorchNavCMT(CFG).eval()
    sd = {"bert." + k if not k.startswith("global_sap_head.") else k: v
          for k, v in model.state_dict().items()}
    params = convert_planner(sd, CFG.num_l_layers, CFG.num_pano_layers,
                             CFG.num_x_layers)
    g = np.random.default_rng(3)
    B, P = 2, 9
    rgb = g.standard_normal((B, P, CFG.image_feat_size)).astype(
        np.float32)
    dep = g.standard_normal((B, P, CFG.depth_feat_size)).astype(
        np.float32)
    loc = g.standard_normal((B, P, CFG.angle_feat_size)).astype(
        np.float32)
    nav_types = (g.integers(0, 2, (B, P))).astype(np.int64)
    vmask = np.ones((B, P), bool)
    vmask[0, 7:] = False
    with torch.no_grad():
        theirs = model.forward_panorama(
            torch.from_numpy(rgb), torch.from_numpy(dep),
            torch.from_numpy(loc), torch.from_numpy(nav_types),
            torch.from_numpy(vmask)).numpy()
    ours, _ = planner.forward_panorama(
        params, CFG, jnp.asarray(rgb), jnp.asarray(dep),
        jnp.asarray(loc), jnp.asarray(nav_types), jnp.asarray(vmask))
    np.testing.assert_allclose(np.asarray(ours)[vmask], theirs[vmask],
                               atol=3e-5)


# ---------------------------------------------------------------------------
# waypoint predictor ckpt layout (TRM_net.py)
# ---------------------------------------------------------------------------

WCFG = WaypointConfig(hidden_size=48, num_heads=4, num_layers=2,
                      depth_feat_shape=(8, 2, 2), hidden_dropout=0.0,
                      attn_dropout=0.0)


class TorchTRM(nn.Module):
    """BinaryDistPredictor_TRM transcription (TRM_net.py:9-88): exact
    key layout 'visual_fc_depth.1', 'waypoint_TRM.bert.encoder.layer.i',
    'vis_classifier.{0,2}'."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        flat = int(np.prod(cfg.depth_feat_shape))
        self.visual_fc_depth = nn.Sequential(
            nn.Flatten(), nn.Linear(flat, d), nn.ReLU(True))

        class _Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.layer = nn.ModuleList(
                    [_BertLayer(d, d * 4) for _ in range(cfg.num_layers)])

        class _Bert(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = _Enc()

        class _TRM(nn.Module):
            def __init__(self):
                super().__init__()
                self.bert = _Bert()

        self.waypoint_TRM = _TRM()
        per_img = int(cfg.num_distances * cfg.num_angles
                      / cfg.num_images)
        self.vis_classifier = nn.Sequential(
            nn.Linear(d, d), nn.ReLU(), nn.Linear(d, per_img))

    def forward(self, depth_feats):
        cfg = self.cfg
        bsi = depth_feats.shape[0] // cfg.num_images
        x = self.visual_fc_depth(depth_feats).reshape(
            bsi, cfg.num_images, -1)
        mask01 = torch.from_numpy(waypoint.circular_neighbor_mask(
            cfg.num_images, cfg.neighbor)).float()
        bias = ((1.0 - mask01) * -10000.0)[None, None]
        for layer in self.waypoint_TRM.bert.encoder.layer:
            x = layer(x, bias, cfg.num_heads)
        logits = self.vis_classifier(x).reshape(
            bsi, cfg.num_angles, cfg.num_distances)
        return torch.cat((logits[:, cfg.heatmap_offset:],
                          logits[:, :cfg.heatmap_offset]), dim=1)


def test_waypoint_layout_roundtrip():
    torch.manual_seed(4)
    model = TorchTRM(WCFG).eval()
    # released file wraps keys in 'predictor.' + 'module.'
    # (ss_trainer_ETP.py:196-202 strips both at load)
    sd = {f"module.predictor.{k}": v
          for k, v in model.state_dict().items()}
    params = convert_waypoint(sd, WCFG.num_layers)
    g = np.random.default_rng(4)
    B = 3
    dep = g.standard_normal((B * 12,) + WCFG.depth_feat_shape).astype(
        np.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(dep)).numpy()
    ours = np.asarray(waypoint.waypoint_heatmap(
        params, WCFG, jnp.asarray(dep.reshape((B, 12) +
                                              WCFG.depth_feat_shape))))
    np.testing.assert_allclose(ours, theirs, atol=3e-5)
