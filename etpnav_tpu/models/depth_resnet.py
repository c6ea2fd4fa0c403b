"""DD-PPO depth encoder: habitat-style GroupNorm ResNet-50, TPU-native.

Parity target: VlnResnetDepthEncoder (models/encoders/resnet_encoders.py:
13-107) wrapping habitat_baselines' ResNetEncoder — a from-scratch ResNet
with GroupNorm (no BatchNorm), baseplanes=32, ngroups=16, bottleneck
expansion 4, followed by a 3x3 "compression" conv + GroupNorm(1) + ReLU
producing (B, 4, 4, 128) for 128x128 depth input.

Design: NHWC convs via lax.conv_general_dilated (XLA maps these onto the
MXU), GroupNorm stats in fp32, whole encoder runs frozen in bf16.
The converter consumes the key layout produced by the reference's ddppo
checkpoint surgery (resnet_encoders.py:40-47): backbone.*, compression.*.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from etpnav_tpu.config import DepthEncoderConfig


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv_init(key: jax.Array, k: int, c_in: int, c_out: int) -> dict:
    """Conv weight in HWIO layout, no bias (habitat convs are bias-free)."""
    fan_in = k * k * c_in
    std = float(np.sqrt(2.0 / fan_in))
    return {"w": jax.random.normal(key, (k, k, c_in, c_out)) * std}


def conv2d(params: dict, x: jax.Array, stride: int = 1,
           padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def gn_init(channels: int) -> dict:
    return {"scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32)}


def group_norm(params: dict, x: jax.Array, groups: int,
               eps: float = 1e-5) -> jax.Array:
    """NHWC GroupNorm matching torch nn.GroupNorm semantics.

    TPU layout note: reducing over a (B,H,W,G,C//G) view splits the
    minor (lane) dimension, forcing strided cross-lane reductions —
    measured ~2.8 ms of a 6.2 ms depth-encoder pass at B=384. Instead:
    one clean channel-major moment pass over HW -> (B, C), combine
    groups on that tiny result, and apply as a per-channel affine
    (x*a + b) that XLA fuses with the surrounding conv/ReLU chain.
    Moments accumulate in fp32 (reads stay in x.dtype); var uses the
    E[x^2]-E[x]^2 form on per-group means."""
    B, H, W, C = x.shape
    dtype = x.dtype
    cg = C // groups
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 2))                    # (B, C)
    s2 = jnp.sum(jnp.square(x32), axis=(1, 2))        # (B, C)
    n = H * W * cg
    g1 = s1.reshape(B, groups, cg).sum(-1) / n        # (B, G) group mean
    g2 = s2.reshape(B, groups, cg).sum(-1) / n        # (B, G) E[x^2]
    inv = jax.lax.rsqrt(jnp.maximum(g2 - jnp.square(g1), 0.0) + eps)
    inv_c = jnp.repeat(inv, cg, axis=1)               # (B, C)
    mean_c = jnp.repeat(g1, cg, axis=1)
    a = inv_c * params["scale"][None]
    b = params["bias"][None] - mean_c * a
    y = x32 * a[:, None, None, :] + b[:, None, None, :]
    return y.astype(dtype)


def max_pool(x: jax.Array, k: int = 3, stride: int = 2,
             padding: int = 1) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


# ---------------------------------------------------------------------------
# bottleneck resnet
# ---------------------------------------------------------------------------

def _bottleneck_init(key, c_in, planes, expansion, has_down) -> dict:
    keys = jax.random.split(key, 4)
    p = {
        "conv1": conv_init(keys[0], 1, c_in, planes),
        "gn1": gn_init(planes),
        "conv2": conv_init(keys[1], 3, planes, planes),
        "gn2": gn_init(planes),
        "conv3": conv_init(keys[2], 1, planes, planes * expansion),
        "gn3": gn_init(planes * expansion),
    }
    if has_down:
        p["down_conv"] = conv_init(keys[3], 1, c_in, planes * expansion)
        p["down_gn"] = gn_init(planes * expansion)
    return p


def _bottleneck(params: dict, x: jax.Array, stride: int,
                ngroups: int, fused_gn: bool = False) -> jax.Array:
    if fused_gn:
        from etpnav_tpu.ops.pallas_groupnorm import group_norm_fused
        h = group_norm_fused(params["gn1"], conv2d(params["conv1"], x),
                             ngroups, relu=True)
        h = group_norm_fused(params["gn2"],
                             conv2d(params["conv2"], h, stride, 1),
                             ngroups, relu=True)
        if "down_conv" in params:
            x = group_norm_fused(params["down_gn"],
                                 conv2d(params["down_conv"], x, stride),
                                 ngroups)
        # gn3 + residual add + relu in the same one-pass kernel
        return group_norm_fused(params["gn3"], conv2d(params["conv3"], h),
                                ngroups, relu=True, residual=x)
    h = jax.nn.relu(group_norm(params["gn1"], conv2d(params["conv1"], x),
                               ngroups))
    h = jax.nn.relu(group_norm(
        params["gn2"], conv2d(params["conv2"], h, stride, 1), ngroups))
    h = group_norm(params["gn3"], conv2d(params["conv3"], h), ngroups)
    if "down_conv" in params:
        x = group_norm(params["down_gn"],
                       conv2d(params["down_conv"], x, stride), ngroups)
    return jax.nn.relu(h + x)


def init_depth_params(key: jax.Array, cfg: DepthEncoderConfig) -> dict:
    keys = jax.random.split(key, 7)
    bp, exp = cfg.baseplanes, cfg.expansion
    params = {
        "stem_conv": conv_init(keys[0], 7, 1, bp),
        "stem_gn": gn_init(bp),
    }
    c_in = bp
    for li, (blocks, kk) in enumerate(zip(cfg.layers, keys[1:5])):
        planes = bp * (2 ** li)
        layer = []
        for bi, bkey in enumerate(jax.random.split(kk, blocks)):
            has_down = bi == 0 and (c_in != planes * exp or li > 0)
            layer.append(_bottleneck_init(bkey, c_in, planes, exp, has_down))
            c_in = planes * exp
        params[f"layer{li + 1}"] = layer
    final_channels = c_in
    final_spatial = cfg.input_size // 32
    comp_channels = int(round(cfg.output_size / (final_spatial ** 2)))
    params["compression_conv"] = conv_init(keys[5], 3, final_channels,
                                           comp_channels)
    params["compression_gn"] = gn_init(comp_channels)
    return params


def _stem_conv_matmul(params: dict, x: jax.Array) -> jax.Array:
    """The 7x7/stride-2 single-channel stem conv as an im2col matmul.

    NOT USED on the hot path. Hypothesis was that a C_in=1 conv maps
    terribly onto the MXU (contraction depth 49) and an explicit
    (B*H'*W', 49) @ (49, C) GEMM would win; measured on v5e-1 at B=192
    the opposite holds: lax.conv 0.79 ms vs 3.59 ms for this (the 49
    strided views + stack dominate), and the im2col layout also slowed
    the downstream trunk (~8.6 ms depth pass vs ~2.7 with lax.conv).
    Kept (with its parity test) as a record of the measured dead end."""
    B, H, W, _ = x.shape
    k, stride, pad = 7, 2, 3
    Ho, Wo = H // stride, W // stride
    xp = jnp.pad(x[..., 0], ((0, 0), (pad, pad), (pad, pad)))
    cols = [xp[:, i:i + Ho * stride:stride, j:j + Wo * stride:stride]
            for i in range(k) for j in range(k)]
    patches = jnp.stack(cols, axis=-1)             # (B, Ho, Wo, 49)
    w = params["w"].astype(x.dtype).reshape(k * k, -1)
    out = jax.lax.dot_general(
        patches.reshape(B * Ho * Wo, k * k), w,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(B, Ho, Wo, -1)


def encode_depth(params: dict, cfg: DepthEncoderConfig, depth: jax.Array,
                 dtype=jnp.bfloat16) -> jax.Array:
    """depth: (B, H, W, 1) in [0,1] -> (B, s, s, C) spatial features
    (s = H/32, C = output_size/s^2; (4,4,128) at H=128)."""
    # Mosaic kernels only lower on TPU; elsewhere (CPU tests) the XLA
    # path runs. The kernel itself is parity-tested in interpret mode.
    fused = (getattr(cfg, "use_fused_gn", False)
             and jax.default_backend() == "tpu")
    if fused:
        from etpnav_tpu.ops.pallas_groupnorm import group_norm_fused

        def gn_relu(p, x, g):
            return group_norm_fused(p, x, g, relu=True)
    else:
        def gn_relu(p, x, g):
            return jax.nn.relu(group_norm(p, x, g))
    x = depth.astype(dtype)
    x = conv2d(params["stem_conv"], x, 2, 3)
    x = gn_relu(params["stem_gn"], x, cfg.ngroups)
    x = max_pool(x)
    for li in range(4):
        stride = 1 if li == 0 else 2
        for bi, bparams in enumerate(params[f"layer{li + 1}"]):
            x = _bottleneck(bparams, x, stride if bi == 0 else 1,
                            cfg.ngroups, fused_gn=fused)
    x = conv2d(params["compression_conv"], x, 1, 1)
    x = gn_relu(params["compression_gn"], x, 1)
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# converter (reference ddppo key layout)
# ---------------------------------------------------------------------------

def convert_ddppo_depth(state_dict: Mapping, cfg: DepthEncoderConfig) -> dict:
    """Keys as produced by resnet_encoders.py:40-47 surgery:
    backbone.conv1.weight, backbone.bn1.{weight,bias},
    backbone.layer{1-4}.{i}.convs.{0,3,6}.weight (convs),
    backbone.layer{1-4}.{i}.convs.{1,4,7}.{weight,bias} (group norms),
    backbone.layer{1-4}.{i}.downsample.{0,1}.*, compression.{0,1}.*.
    Torch conv OIHW -> HWIO."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def conv(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0))}

    def gn(key):
        return {"scale": jnp.asarray(sd[f"{key}.weight"]),
                "bias": jnp.asarray(sd[f"{key}.bias"])}

    params = {
        "stem_conv": conv("backbone.conv1"),
        "stem_gn": gn("backbone.bn1"),
        "compression_conv": conv("compression.0"),
        "compression_gn": gn("compression.1"),
    }
    for li in range(1, 5):
        layer = []
        bi = 0
        while f"backbone.layer{li}.{bi}.convs.0.weight" in sd:
            base = f"backbone.layer{li}.{bi}"
            block = {
                "conv1": conv(f"{base}.convs.0"),
                "gn1": gn(f"{base}.convs.1"),
                "conv2": conv(f"{base}.convs.3"),
                "gn2": gn(f"{base}.convs.4"),
                "conv3": conv(f"{base}.convs.6"),
                "gn3": gn(f"{base}.convs.7"),
            }
            if f"{base}.downsample.0.weight" in sd:
                block["down_conv"] = conv(f"{base}.downsample.0")
                block["down_gn"] = gn(f"{base}.downsample.1")
            layer.append(block)
            bi += 1
        params[f"layer{li}"] = layer
    return params


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)
