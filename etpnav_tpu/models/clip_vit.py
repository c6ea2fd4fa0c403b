"""CLIP ViT-B/32 image tower, TPU-native.

Parity target: the frozen `clip.load("ViT-B/32")` RGB encoder used by the
reference (models/encoders/resnet_encoders.py:244-277). Design notes:

- patchify = reshape + one big matmul (MXU) instead of a conv
- pre-norm transformer blocks with QuickGELU, scanned over depth
- runs in bf16 (frozen encoder; output cast to fp32 like the reference's
  `.float()` at resnet_encoders.py:277)
- converter accepts both the openai `visual.*` state_dict layout and the
  HF transformers CLIPVisionModelWithProjection layout
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from etpnav_tpu.config import ClipConfig
from etpnav_tpu.ops.basic import (
    layer_norm,
    linear,
    linear_init,
    ln_init,
    quick_gelu,
    trunc_normal,
)
from etpnav_tpu.ops.attention import mha, mha_init

# CLIP preprocessing constants (resnet_encoders.py:264-267)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# Experimental: run each resblock's attention half (LN+QKV+attn+proj+
# residual) as one Pallas kernel (ops/pallas_attention.py
# fused_prenorm_attention_v2 — the Mosaic-compatible lane-sliced-heads
# formulation). Off until hardware numerics+speed validate
# (tools/exp_prenorm_v2.py is the gate).
USE_FUSED_BLOCK = False


def init_clip_params(key: jax.Array, cfg: ClipConfig) -> dict:
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    keys = jax.random.split(key, 6)
    blocks = [_block_init(k, cfg) for k in
              jax.random.split(keys[0], cfg.layers)]
    return {
        "patch_embed": trunc_normal(
            keys[1], (cfg.patch_size * cfg.patch_size * 3, cfg.width)),
        "class_embedding": trunc_normal(keys[2], (cfg.width,)),
        "positional_embedding": trunc_normal(
            keys[3], (n_patches + 1, cfg.width)),
        "ln_pre": ln_init(cfg.width),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_post": ln_init(cfg.width),
        "proj": trunc_normal(keys[4], (cfg.width, cfg.output_dim)),
    }


def _block_init(key: jax.Array, cfg: ClipConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln_1": ln_init(cfg.width),
        "attn": mha_init(k1, cfg.width),
        "ln_2": ln_init(cfg.width),
        "mlp_fc": linear_init(k2, cfg.width, cfg.width * 4),
        "mlp_proj": linear_init(k3, cfg.width * 4, cfg.width),
    }


def preprocess_rgb(rgb_uint8: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 -> normalized fp32 (ConvertImageDtype+Normalize,
    resnet_encoders.py:263-267)."""
    x = rgb_uint8.astype(jnp.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def _patchify(images: jax.Array, ps: int) -> jax.Array:
    """(B, H, W, C) -> (B, P, ps*ps*C), row-major patch layout. Runs in the
    input dtype (on uint8 this moves 4x less HBM than after fp32
    conversion)."""
    B, H, W, C = images.shape
    gh, gw = H // ps, W // ps
    x = images.reshape(B, gh, ps, gw, ps, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, ps * ps * C)


def _trunk(params: dict, cfg: ClipConfig, x: jax.Array, dtype) -> jax.Array:
    """Patch embeddings (B, P, width) -> (B, output_dim) fp32.

    The final transformer block only computes the class-token row: the
    image embedding reads x[:, 0] alone (ln_post + proj), and within one
    pre-norm block the cls output depends on all 50 tokens only through
    attention keys/values — so q/MLP rows 1..49 of the last block are
    dead compute (49/50 of its MLP+proj, ~6.5% of ViT-B/32 FLOPs)."""
    B = x.shape[0]
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype)[None, None, :],
        (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)[None]
    x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"],
                   cfg.layer_norm_eps)

    def block(h, bp):
        if USE_FUSED_BLOCK and jax.default_backend() == "tpu":
            from etpnav_tpu.ops.pallas_attention import \
                fused_prenorm_attention_v2
            h = fused_prenorm_attention_v2(h, bp["ln_1"], bp["attn"],
                                           cfg.heads, cfg.layer_norm_eps)
        else:
            a = layer_norm(h, bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                           cfg.layer_norm_eps)
            h = h + mha(bp["attn"], a, a, cfg.heads)
        m = layer_norm(h, bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                       cfg.layer_norm_eps)
        m = quick_gelu(linear(bp["mlp_fc"], m))
        h = h + linear(bp["mlp_proj"], m)
        return h, None

    first = jax.tree_util.tree_map(lambda a: a[:-1], params["blocks"])
    last = jax.tree_util.tree_map(lambda a: a[-1], params["blocks"])
    # full unroll on TPU: straight-line blocks let XLA overlap the next
    # block's weight DMA with compute — measured 15.24 -> 14.56 ms
    # (-4.5%) for the 12-layer tower at B=192 on v5e-1
    # (tools/exp_scan_unroll.py: unroll 1/2/4/11 -> 15.24/15.32/15.29/
    # 14.56 ms; partial unrolls don't pay). Kept rolled on CPU to keep
    # test-suite compile times down.
    unroll = jax.default_backend() == "tpu"
    x, _ = jax.lax.scan(block, x, first, unroll=unroll)

    # last block, cls row only (identical math for that row)
    a = layer_norm(x, last["ln_1"]["scale"], last["ln_1"]["bias"],
                   cfg.layer_norm_eps)
    h = x[:, :1] + mha(last["attn"], a[:, :1], a, cfg.heads)
    m = layer_norm(h, last["ln_2"]["scale"], last["ln_2"]["bias"],
                   cfg.layer_norm_eps)
    m = quick_gelu(linear(last["mlp_fc"], m))
    h = h + linear(last["mlp_proj"], m)

    cls_out = layer_norm(h[:, 0], params["ln_post"]["scale"],
                         params["ln_post"]["bias"], cfg.layer_norm_eps)
    out = jnp.dot(cls_out, params["proj"].astype(dtype),
                  preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def encode_image(params: dict, cfg: ClipConfig, images: jax.Array,
                 dtype=jnp.bfloat16) -> jax.Array:
    """images: (B, H, W, 3) normalized fp32 -> (B, output_dim) fp32.

    Patchify-as-matmul: (B,H,W,3) -> (B, P, ps*ps*3) @ (ps*ps*3, width).
    """
    x = _patchify(images, cfg.patch_size).astype(dtype)
    x = jnp.dot(x, params["patch_embed"].astype(dtype),
                preferred_element_type=jnp.float32).astype(dtype)
    return _trunk(params, cfg, x, dtype)


def encode_image_uint8(params: dict, cfg: ClipConfig, rgb_uint8: jax.Array,
                       dtype=jnp.bfloat16) -> jax.Array:
    """(B, H, W, 3) raw uint8 -> (B, output_dim) fp32, with the CLIP
    normalization FOLDED into the patch-embedding matmul.

    preprocess_rgb materializes ~3 fp32 copies of the image batch (230 MB
    at B=384) before any compute; since normalize is per-channel affine
    (n = p*s_c + t_c), patchify runs on uint8 and the affine folds into
    the frozen weights: n @ W = p @ (s ⊙ W) + t @ W. uint8 pixel values
    are exact in bf16. Folding happens in fp32 then casts, so rounding
    matches the unfolded bf16 path's class of error."""
    ps = cfg.patch_size
    s = jnp.tile(1.0 / (255.0 * CLIP_STD), ps * ps)        # (ps*ps*3,)
    t = jnp.tile(-CLIP_MEAN / CLIP_STD, ps * ps)
    w = params["patch_embed"].astype(jnp.float32)
    w_folded = (s[:, None] * w).astype(dtype)
    b_folded = jnp.dot(t, w, preferred_element_type=jnp.float32)
    x = _patchify(rgb_uint8, ps).astype(dtype)
    x = (jnp.dot(x, w_folded, preferred_element_type=jnp.float32)
         + b_folded).astype(dtype)
    return _trunk(params, cfg, x, dtype)


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------

def convert_openai_clip(state_dict: Mapping, cfg: ClipConfig) -> dict:
    """openai clip state_dict (visual.* keys) -> our param tree."""
    sd = {k[len("visual."):]: _np(v) for k, v in state_dict.items()
          if k.startswith("visual.")}
    if not sd:  # maybe already visual-only
        sd = {k: _np(v) for k, v in state_dict.items()}

    def ln(key):
        return {"scale": jnp.asarray(sd[f"{key}.weight"]),
                "bias": jnp.asarray(sd[f"{key}.bias"])}

    conv = sd["conv1.weight"]                       # (width, 3, ps, ps)
    # match patchify layout (ps, ps, 3) flattened row-major
    patch = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])

    blocks = []
    for i in range(cfg.layers):
        b = f"transformer.resblocks.{i}"
        w = sd[f"{b}.attn.in_proj_weight"]
        bias = sd[f"{b}.attn.in_proj_bias"]
        d = w.shape[1]
        blocks.append({
            "ln_1": ln(f"{b}.ln_1"),
            "attn": {
                "q": {"w": jnp.asarray(w[:d].T), "b": jnp.asarray(bias[:d])},
                "k": {"w": jnp.asarray(w[d:2*d].T),
                      "b": jnp.asarray(bias[d:2*d])},
                "v": {"w": jnp.asarray(w[2*d:].T),
                      "b": jnp.asarray(bias[2*d:])},
                "o": {"w": jnp.asarray(sd[f"{b}.attn.out_proj.weight"].T),
                      "b": jnp.asarray(sd[f"{b}.attn.out_proj.bias"])},
            },
            "ln_2": ln(f"{b}.ln_2"),
            "mlp_fc": {"w": jnp.asarray(sd[f"{b}.mlp.c_fc.weight"].T),
                       "b": jnp.asarray(sd[f"{b}.mlp.c_fc.bias"])},
            "mlp_proj": {"w": jnp.asarray(sd[f"{b}.mlp.c_proj.weight"].T),
                         "b": jnp.asarray(sd[f"{b}.mlp.c_proj.bias"])},
        })
    return {
        "patch_embed": jnp.asarray(patch),
        "class_embedding": jnp.asarray(sd["class_embedding"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "ln_pre": ln("ln_pre"),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_post": ln("ln_post"),
        "proj": jnp.asarray(sd["proj"]),
    }


def convert_hf_clip_vision(state_dict: Mapping, cfg: ClipConfig) -> dict:
    """HF CLIPVisionModelWithProjection state_dict -> our param tree."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    pre = "vision_model."

    def lin(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"].T),
                "b": jnp.asarray(sd[f"{key}.bias"])}

    def ln(key):
        return {"scale": jnp.asarray(sd[f"{key}.weight"]),
                "bias": jnp.asarray(sd[f"{key}.bias"])}

    conv = sd[f"{pre}embeddings.patch_embedding.weight"]
    patch = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    blocks = []
    for i in range(cfg.layers):
        b = f"{pre}encoder.layers.{i}"
        blocks.append({
            "ln_1": ln(f"{b}.layer_norm1"),
            "attn": {
                "q": lin(f"{b}.self_attn.q_proj"),
                "k": lin(f"{b}.self_attn.k_proj"),
                "v": lin(f"{b}.self_attn.v_proj"),
                "o": lin(f"{b}.self_attn.out_proj"),
            },
            "ln_2": ln(f"{b}.layer_norm2"),
            "mlp_fc": lin(f"{b}.mlp.fc1"),
            "mlp_proj": lin(f"{b}.mlp.fc2"),
        })
    return {
        "patch_embed": jnp.asarray(patch),
        "class_embedding": jnp.asarray(
            sd[f"{pre}embeddings.class_embedding"]),
        "positional_embedding": jnp.asarray(
            sd[f"{pre}embeddings.position_embedding.weight"]),
        "ln_pre": ln(f"{pre}pre_layrnorm"),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_post": ln(f"{pre}post_layernorm"),
        "proj": jnp.asarray(sd["visual_projection.weight"].T),
    }


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)
