"""ImageNet ResNet-50 RGB encoder (legacy CMA-era path), TPU-native.

Parity target: TorchVisionResNet50 (reference
vlnce_baselines/models/encoders/resnet_encoders.py:110-241) — a frozen
torchvision resnet50 truncated after layer4 (children()[:-2]), fed
uint8 RGB scaled to [0,1] and ImageNet-normalized
(mean 0.485/0.456/0.406, std 0.229/0.224/0.225,
resnet_encoders.py:182-186).  With spatial_output=True the reference
appends an adaptive 4x4 average pool plus an identity fc to the
Sequential (resnet_encoders.py:166-176) and concatenates a learned
16-slot x 64-d spatial embedding broadcast over the grid
(resnet_encoders.py:219-236), yielding (B, 2048+64, 4, 4); with
spatial_output=False it returns the raw layer4 map
(resnet_encoders.py:241).

The encoder is dead code on the ETP path (its instantiation at
Policy_ViewSelection_ETP.py:131-137 is commented out; ETP uses CLIP)
but is the RGB encoder of the CMA-era policies and of
MODEL.RGB_ENCODER.cnn_type's only registered value
(config/default.py:159), so it ships for legacy completeness.

TPU design notes: NHWC layout end-to-end (the reference's NCHW tensors
map to our (B, H, W, C); callers of the spatial output get
(B, 4, 4, 2112) instead of (B, 2112, 4, 4)).  The encoder is frozen, so
BatchNorm running stats fold into a per-channel affine at conversion
time — inference carries no BN state and XLA fuses the affine into the
surrounding conv/ReLU chain.  Convs accumulate in fp32 on the MXU.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from etpnav_tpu.models.depth_resnet import conv2d, conv_init, max_pool, _np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_LAYERS = (3, 4, 6, 3)          # torchvision resnet50
_EXPANSION = 4
SPATIAL_GRID = 4                # adaptive pool target (4, 4)
SPATIAL_EMBED_DIM = 64          # resnet_encoders.py:172


# ---------------------------------------------------------------------------
# folded batch-norm affine
# ---------------------------------------------------------------------------

def _affine_init(key: jax.Array, channels: int) -> dict:
    ka, kb = jax.random.split(key)
    return {"a": jax.random.normal(ka, (channels,), jnp.float32) * 0.1 + 1.0,
            "b": jax.random.normal(kb, (channels,), jnp.float32) * 0.1}


def _affine(params: dict, x: jax.Array) -> jax.Array:
    return (x.astype(jnp.float32) * params["a"][None, None, None]
            + params["b"][None, None, None]).astype(x.dtype)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _bottleneck_init(key, c_in, planes, has_down) -> dict:
    keys = jax.random.split(key, 8)
    p = {
        "conv1": conv_init(keys[0], 1, c_in, planes),
        "bn1": _affine_init(keys[1], planes),
        "conv2": conv_init(keys[2], 3, planes, planes),
        "bn2": _affine_init(keys[3], planes),
        "conv3": conv_init(keys[4], 1, planes, planes * _EXPANSION),
        "bn3": _affine_init(keys[5], planes * _EXPANSION),
    }
    if has_down:
        p["down_conv"] = conv_init(keys[6], 1, c_in, planes * _EXPANSION)
        p["down_bn"] = _affine_init(keys[7], planes * _EXPANSION)
    return p


def init_imagenet_resnet_params(key: jax.Array,
                                spatial_output: bool = True) -> dict:
    keys = jax.random.split(key, 7)
    params = {
        "stem_conv": conv_init(keys[0], 7, 3, 64),
        "stem_bn": _affine_init(keys[5], 64),
    }
    c_in = 64
    for li, (blocks, kk) in enumerate(zip(_LAYERS, keys[1:5])):
        planes = 64 * (2 ** li)
        layer = []
        for bi, bkey in enumerate(jax.random.split(kk, blocks)):
            has_down = bi == 0      # layer1: channel jump; layer2-4: stride
            layer.append(_bottleneck_init(bkey, c_in, planes, has_down))
            c_in = planes * _EXPANSION
        params[f"layer{li + 1}"] = layer
    if spatial_output:
        params["spatial_embeddings"] = (
            jax.random.normal(keys[6],
                              (SPATIAL_GRID * SPATIAL_GRID,
                               SPATIAL_EMBED_DIM), jnp.float32))
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _bottleneck(params: dict, x: jax.Array, stride: int) -> jax.Array:
    h = jax.nn.relu(_affine(params["bn1"], conv2d(params["conv1"], x)))
    h = jax.nn.relu(_affine(params["bn2"],
                            conv2d(params["conv2"], h, stride, 1)))
    h = _affine(params["bn3"], conv2d(params["conv3"], h))
    if "down_conv" in params:
        x = _affine(params["down_bn"], conv2d(params["down_conv"], x, stride))
    return jax.nn.relu(h + x)


def adaptive_avg_pool(x: jax.Array, out: int) -> jax.Array:
    """torch F.adaptive_avg_pool2d on NHWC with static window math.

    Bin i covers rows [floor(i*H/out), ceil((i+1)*H/out)) — windows may
    overlap (H=7 -> sizes 2,3,3,2), so this is a small static gather-sum
    per bin, not a reduce_window."""
    B, H, W, C = x.shape
    x32 = x.astype(jnp.float32)
    rows = []
    for i in range(out):
        h0, h1 = (i * H) // out, -(-((i + 1) * H) // out)
        cols = []
        for j in range(out):
            w0, w1 = (j * W) // out, -(-((j + 1) * W) // out)
            cols.append(jnp.mean(x32[:, h0:h1, w0:w1], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1).astype(x.dtype)       # (B, out, out, C)


def encode_imagenet_rgb(params: dict, rgb: jax.Array,
                        spatial_output: bool = True,
                        dtype=jnp.bfloat16) -> jax.Array:
    """rgb: (B, H, W, 3) uint8 -> (B, 4, 4, 2112) spatial features, or the
    raw (B, H/32, W/32, 2048) layer4 map when spatial_output=False."""
    x = rgb.astype(jnp.float32) / 255.0
    x = ((x - IMAGENET_MEAN) / IMAGENET_STD).astype(dtype)
    x = conv2d(params["stem_conv"], x, 2, 3)
    x = jax.nn.relu(_affine(params["stem_bn"], x))
    x = max_pool(x)
    for li in range(4):
        stride = 1 if li == 0 else 2
        for bi, bparams in enumerate(params[f"layer{li + 1}"]):
            x = _bottleneck(bparams, x, stride if bi == 0 else 1)
    if not spatial_output:
        return x.astype(jnp.float32)
    x = adaptive_avg_pool(x, SPATIAL_GRID)               # (B, 4, 4, 2048)
    # Reference quirk (resnet_encoders.py:222-233): the (16, 64) embedding
    # table is `.view(1, -1, h, w)`-ed, i.e. its flat buffer reinterpreted
    # as a (64, 4, 4) channel-major block — NOT one 64-d embedding per grid
    # cell.  NHWC equivalent: reshape to (C, H, W) then move C last.
    emb = params["spatial_embeddings"].reshape(
        SPATIAL_EMBED_DIM, SPATIAL_GRID, SPATIAL_GRID).transpose(1, 2, 0)
    emb = jnp.broadcast_to(emb[None], (x.shape[0], *emb.shape))
    return jnp.concatenate([x.astype(jnp.float32),
                            emb.astype(jnp.float32)], axis=-1)


# ---------------------------------------------------------------------------
# converter (torchvision resnet50 state_dict)
# ---------------------------------------------------------------------------

def convert_torchvision_resnet50(state_dict: Mapping,
                                 prefix: str = "",
                                 eps: float = 1e-5) -> dict:
    """torchvision key layout: conv1.weight, bn1.{weight,bias,running_mean,
    running_var}, layer{1-4}.{i}.conv{1-3}.weight / bn{1-3}.* /
    downsample.{0,1}.*; the reference wraps these under `cnn.` plus a
    sibling spatial_embeddings.weight (resnet_encoders.py:158,172).
    BN running stats fold into the inference affine:
    a = gamma/sqrt(var+eps), b = beta - mean*a.  Torch conv OIHW -> HWIO."""
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items()
          if k.startswith(prefix)}

    def conv(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0))}

    def bn(key):
        gamma, beta = sd[f"{key}.weight"], sd[f"{key}.bias"]
        mean, var = sd[f"{key}.running_mean"], sd[f"{key}.running_var"]
        a = gamma / np.sqrt(var + eps)
        return {"a": jnp.asarray(a), "b": jnp.asarray(beta - mean * a)}

    cnn = "cnn." if f"cnn.conv1.weight" in sd else ""
    params = {"stem_conv": conv(f"{cnn}conv1"), "stem_bn": bn(f"{cnn}bn1")}
    for li in range(1, 5):
        layer = []
        bi = 0
        while f"{cnn}layer{li}.{bi}.conv1.weight" in sd:
            base = f"{cnn}layer{li}.{bi}"
            block = {
                "conv1": conv(f"{base}.conv1"), "bn1": bn(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2"), "bn2": bn(f"{base}.bn2"),
                "conv3": conv(f"{base}.conv3"), "bn3": bn(f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in sd:
                block["down_conv"] = conv(f"{base}.downsample.0")
                block["down_bn"] = bn(f"{base}.downsample.1")
            layer.append(block)
            bi += 1
        params[f"layer{li}"] = layer
    if "spatial_embeddings.weight" in sd:
        params["spatial_embeddings"] = jnp.asarray(
            sd["spatial_embeddings.weight"])
    return params
