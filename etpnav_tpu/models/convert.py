"""PyTorch checkpoint -> JAX param-tree converters.

Handles the released ETPNav checkpoint layouts so public weights load
bit-compatibly (BASELINE.md north star):

- pretrain/finetune planner ckpts with `module.` / `bert.` / `vln_bert.`
  prefixes (key surgery mirrors vlnbert_init.py:21-30 and
  ss_trainer_ETP.py:226-236)
- waypoint predictor ckpt (`check_cwp_bestdist_hfov90`, TRM_net.py layout)
- CLIP ViT-B/32 visual tower (openai clip state_dict layout)
- DD-PPO depth ResNet-50 (habitat ResNetEncoder layout,
  resnet_encoders.py:37-50 key surgery)

Tensors arrive as numpy arrays (or torch tensors; we call .numpy()).
Linear weights are transposed torch (out,in) -> ours (in,out).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_prefixes(state_dict: Mapping, prefixes=("module.", "net.",
                                                  "vln_bert.", "bert.")
                   ) -> Dict[str, np.ndarray]:
    """Normalize checkpoint keys: iteratively strip known wrapper prefixes
    (DDP 'module.', policy 'net.'/'vln_bert.', pretrain 'bert.')."""
    out = {}
    for k, v in state_dict.items():
        changed = True
        while changed:
            changed = False
            for p in prefixes:
                if k.startswith(p):
                    k = k[len(p):]
                    changed = True
        out[k] = _np(v)
    return out


def _linear(sd, key):
    return {"w": jnp.asarray(sd[f"{key}.weight"].T),
            "b": jnp.asarray(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": jnp.asarray(sd[f"{key}.weight"]),
            "bias": jnp.asarray(sd[f"{key}.bias"])}


def _attn_block(sd, base, out_base=None):
    """BertSelfAttention + BertSelfOutput -> self_attention_block params."""
    out_base = out_base or f"{base[:base.rfind('.')]}.output"
    return {
        "attn": {
            "q": _linear(sd, f"{base}.query"),
            "k": _linear(sd, f"{base}.key"),
            "v": _linear(sd, f"{base}.value"),
        },
        "out": {
            "dense": _linear(sd, f"{out_base}.dense"),
            "ln": _ln(sd, f"{out_base}.LayerNorm"),
        },
    }


def _ffn(sd, inter_key, out_key):
    return {
        "intermediate": _linear(sd, f"{inter_key}.dense"),
        "output": {
            "dense": _linear(sd, f"{out_key}.dense"),
            "ln": _ln(sd, f"{out_key}.LayerNorm"),
        },
    }


def _stack(layers):
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _bert_layer(sd, base):
    return {
        "attention": _attn_block(sd, f"{base}.attention.self",
                                 f"{base}.attention.output"),
        "ffn": _ffn(sd, f"{base}.intermediate", f"{base}.output"),
    }


def _prenorm_layer(sd, base):
    """torch nn.MultiheadAttention packed qkv -> split q/k/v."""
    w = sd[f"{base}.self_attn.in_proj_weight"]
    b = sd[f"{base}.self_attn.in_proj_bias"]
    d = w.shape[1]
    qw, kw, vw = w[:d], w[d:2 * d], w[2 * d:]
    qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
    return {
        "attn": {
            "q": {"w": jnp.asarray(qw.T), "b": jnp.asarray(qb)},
            "k": {"w": jnp.asarray(kw.T), "b": jnp.asarray(kb)},
            "v": {"w": jnp.asarray(vw.T), "b": jnp.asarray(vb)},
            "o": _linear(sd, f"{base}.self_attn.out_proj"),
        },
        "norm1": _ln(sd, f"{base}.norm1"),
        "norm2": _ln(sd, f"{base}.norm2"),
        "linear1": _linear(sd, f"{base}.linear1"),
        "linear2": _linear(sd, f"{base}.linear2"),
    }


def convert_planner(state_dict: Mapping, num_l_layers: int = 9,
                    num_pano_layers: int = 2, num_x_layers: int = 4) -> dict:
    """ETPNav planner state_dict -> init_planner_params() tree."""
    sd = strip_prefixes(state_dict)
    params = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                sd["embeddings.word_embeddings.weight"]),
            "position_embeddings": jnp.asarray(
                sd["embeddings.position_embeddings.weight"]),
            "token_type_embeddings": jnp.asarray(
                sd["embeddings.token_type_embeddings.weight"]),
            "ln": _ln(sd, "embeddings.LayerNorm"),
        },
        "lang_encoder": _stack([
            _bert_layer(sd, f"lang_encoder.layer.{i}")
            for i in range(num_l_layers)]),
        "img_embeddings": {
            "img_linear": _linear(sd, "img_embeddings.img_linear"),
            "img_ln": _ln(sd, "img_embeddings.img_layer_norm"),
            "loc_linear": _linear(sd, "img_embeddings.loc_linear"),
            "loc_ln": _ln(sd, "img_embeddings.loc_layer_norm"),
            "nav_type_embedding": jnp.asarray(
                sd["img_embeddings.nav_type_embedding.weight"]),
            "ln": _ln(sd, "img_embeddings.layer_norm"),
            "pano_encoder": {
                "layers": _stack([
                    _prenorm_layer(sd, f"img_embeddings.pano_encoder"
                                       f".layers.{i}")
                    for i in range(num_pano_layers)]),
                "final_ln": _ln(sd, "img_embeddings.pano_encoder.norm"),
            },
        },
        "global_encoder": {
            "gmap_pos_embeddings": {
                "dense": _linear(sd, "global_encoder.gmap_pos_embeddings.0"),
                "ln": _ln(sd, "global_encoder.gmap_pos_embeddings.1"),
            },
            "gmap_step_embeddings": jnp.asarray(
                sd["global_encoder.gmap_step_embeddings.weight"]),
            "encoder": _stack([
                _x_layer(sd, f"global_encoder.encoder.x_layers.{i}")
                for i in range(num_x_layers)]),
        },
        "global_sap_head": {
            "dense1": _linear(sd, "global_sap_head.net.0"),
            "ln": _ln(sd, "global_sap_head.net.2"),
            "dense2": _linear(sd, "global_sap_head.net.4"),
        },
    }
    if "img_embeddings.dep_linear.weight" in sd:
        params["img_embeddings"]["dep_linear"] = _linear(
            sd, "img_embeddings.dep_linear")
        params["img_embeddings"]["dep_ln"] = _ln(
            sd, "img_embeddings.dep_layer_norm")
    if "global_encoder.sprel_linear.weight" in sd:
        params["global_encoder"]["sprel_linear"] = _linear(
            sd, "global_encoder.sprel_linear")
    return params


def _x_layer(sd, base):
    return {
        "visual_attention": {
            "attn": {
                "q": _linear(sd, f"{base}.visual_attention.att.query"),
                "k": _linear(sd, f"{base}.visual_attention.att.key"),
                "v": _linear(sd, f"{base}.visual_attention.att.value"),
            },
            "out": {
                "dense": _linear(sd, f"{base}.visual_attention.output.dense"),
                "ln": _ln(sd, f"{base}.visual_attention.output.LayerNorm"),
            },
        },
        "visn_self_att": _attn_block(sd, f"{base}.visn_self_att.self",
                                     f"{base}.visn_self_att.output"),
        "visn_ffn": {
            "intermediate": _linear(sd, f"{base}.visn_inter.dense"),
            "output": {
                "dense": _linear(sd, f"{base}.visn_output.dense"),
                "ln": _ln(sd, f"{base}.visn_output.LayerNorm"),
            },
        },
    }


def convert_waypoint(state_dict: Mapping, num_layers: int = 2) -> dict:
    """Waypoint predictor ckpt -> init_waypoint_params() tree
    (TRM_net.py layout; trainer strips 'predictor.' prefixes,
    ss_trainer_ETP.py:196-202)."""
    sd = strip_prefixes(state_dict, ("module.", "predictor."))
    return {
        "visual_fc_depth": _linear(sd, "visual_fc_depth.1"),
        "waypoint_trm": _stack([
            _bert_layer(sd, f"waypoint_TRM.bert.encoder.layer.{i}")
            for i in range(num_layers)]),
        "vis_classifier": {
            "dense1": _linear(sd, "vis_classifier.0"),
            "dense2": _linear(sd, "vis_classifier.2"),
        },
    }


def convert_full_policy(state_dict: Mapping, planner_cfg=None,
                        clip_cfg=None, depth_cfg=None) -> dict:
    """Released *fine-tune* checkpoint (ss_trainer_ETP.py:74-83 layout:
    {'state_dict': policy params with net./module. prefixes}) -> dict of
    {'planner', 'clip', 'depth'} param trees. The policy owns the frozen
    encoders as submodules (Policy_ViewSelection_ETP.py:118-139):
    net.depth_encoder.visual_encoder.*, net.rgb_encoder.model.visual.*,
    net.vln_bert.*.
    """
    from etpnav_tpu import config as C
    from etpnav_tpu.models.clip_vit import convert_openai_clip
    from etpnav_tpu.models.depth_resnet import convert_ddppo_depth

    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    # iterative strip: DDP-wrapped policies save 'net.module.vln_bert.*'
    # (ss_trainer_ETP.py:211-212 wraps policy.net in DDP), so a single
    # pass over the prefixes would leave 'module.' behind
    flat = strip_prefixes(state_dict, ("module.", "net."))

    planner_sd = {k[len("vln_bert."):]: v for k, v in flat.items()
                  if k.startswith("vln_bert.")}
    depth_sd = {k[len("depth_encoder.visual_encoder."):]: v
                for k, v in flat.items()
                if k.startswith("depth_encoder.visual_encoder.")}
    clip_sd = {k[len("rgb_encoder.model."):]: v for k, v in flat.items()
               if k.startswith("rgb_encoder.model.")}

    pc = planner_cfg or C.r2r_config().planner
    out = {"planner": convert_planner(planner_sd, pc.num_l_layers,
                                      pc.num_pano_layers, pc.num_x_layers)}
    if depth_sd:
        out["depth"] = convert_ddppo_depth(
            depth_sd, depth_cfg or C.r2r_config().depth)
    if clip_sd:
        out["clip"] = convert_openai_clip(
            clip_sd, clip_cfg or C.r2r_config().clip)
    return out


def convert_rec_vlnbert(state_dict: Mapping, base_params: dict,
                        la_layers: int = 9, vl_layers: int = 4) -> dict:
    """PREVALENT `pytorch_model.bin` (the VLNBert layout of
    vlnbert_PREVALENT.py:362-381, loaded by the reference at
    vlnbert_init.py:10-18) -> models/rec_vlnbert.py param tree.

    Converts the transformer subtrees: embeddings, the la_layers
    language stack (`lalayer.{i}.*`), each LXRT layer's VISUAL branch
    (`addlayer.{i}.visual_attention/visn_self_att/visn_inter/
    visn_output`), and the pooler. The candidate-fusion projections
    have no reference counterpart (the fusing policy module is absent
    from the reference repo) and are carried over from base_params.
    The dead lang-branch params inside each LXRTXLayer
    (lang_self_att/lang_inter/lang_output — initialized but never
    called, vlnbert_PREVALENT.py:296-298 vs :322-342) are ignored.
    """
    sd = strip_prefixes(state_dict)
    out = dict(base_params)
    out["embeddings"] = {
        "word_embeddings": jnp.asarray(
            sd["embeddings.word_embeddings.weight"]),
        "position_embeddings": jnp.asarray(
            sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": jnp.asarray(
            sd["embeddings.token_type_embeddings.weight"]),
        "ln": _ln(sd, "embeddings.LayerNorm"),
    }
    out["lalayer"] = _stack([_bert_layer(sd, f"lalayer.{i}")
                             for i in range(la_layers)])
    xl = []
    for i in range(vl_layers):
        b = f"addlayer.{i}"
        xl.append({
            "cross": _attn_block(sd, f"{b}.visual_attention.att",
                                 f"{b}.visual_attention.output"),
            "self": _attn_block(sd, f"{b}.visn_self_att.self",
                                f"{b}.visn_self_att.output"),
            "ffn": _ffn(sd, f"{b}.visn_inter", f"{b}.visn_output"),
        })
    out["addlayer"] = _stack(xl)
    out["pooler"] = _linear(sd, "pooler.dense")
    return out


def convert_hf_bert_encoder(state_dict: Mapping, num_layers: int) -> dict:
    """HF transformers BertModel state_dict -> our embeddings + stacked
    layers; used for golden parity tests and tokenizer-compatible init."""
    sd = strip_prefixes(state_dict, ("bert.",))
    emb = {
        "word_embeddings": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
        "position_embeddings": jnp.asarray(
            sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": jnp.asarray(
            sd["embeddings.token_type_embeddings.weight"]),
        "ln": _ln(sd, "embeddings.LayerNorm"),
    }
    layers = _stack([_bert_layer(sd, f"encoder.layer.{i}")
                     for i in range(num_layers)])
    return {"embeddings": emb, "lang_encoder": layers}
