"""Parity tests for the frozen visual encoders (fp32 mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from etpnav_tpu.config import ClipConfig, DepthEncoderConfig
from etpnav_tpu.models import clip_vit, depth_resnet


def test_clip_vit_matches_hf(rng):
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = ClipConfig(image_size=32, patch_size=16, width=64, layers=2,
                     heads=4, output_dim=32)
    hf_cfg = CLIPVisionConfig(
        hidden_size=cfg.width, intermediate_size=cfg.width * 4,
        num_hidden_layers=cfg.layers, num_attention_heads=cfg.heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        projection_dim=cfg.output_dim, hidden_act="quick_gelu",
        layer_norm_eps=cfg.layer_norm_eps, attention_dropout=0.0)
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(hf_cfg).eval()

    params = clip_vit.convert_hf_clip_vision(model.state_dict(), cfg)
    imgs = rng.standard_normal(
        (3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = np.asarray(clip_vit.encode_image(params, cfg, jnp.asarray(imgs),
                                            dtype=jnp.float32))
    with torch.no_grad():
        theirs = model(torch.from_numpy(
            imgs.transpose(0, 3, 1, 2))).image_embeds.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_clip_uint8_folded_path_matches(rng):
    """encode_image_uint8 (normalization folded into the patch matmul)
    must equal preprocess_rgb + encode_image."""
    cfg = ClipConfig(image_size=32, patch_size=16, width=64, layers=2,
                     heads=4, output_dim=32)
    params = clip_vit.init_clip_params(jax.random.PRNGKey(0), cfg)
    img = rng.integers(0, 256, (3, 32, 32, 3)).astype(np.uint8)
    ref = np.asarray(clip_vit.encode_image(
        params, cfg, clip_vit.preprocess_rgb(jnp.asarray(img)),
        dtype=jnp.float32))
    fused = np.asarray(clip_vit.encode_image_uint8(
        params, cfg, jnp.asarray(img), dtype=jnp.float32))
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_clip_preprocess_matches_torchvision(rng):
    img = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    ours = np.asarray(clip_vit.preprocess_rgb(jnp.asarray(img)))
    x = torch.from_numpy(img.transpose(0, 3, 1, 2)).float() / 255.0
    mean = torch.tensor(clip_vit.CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(clip_vit.CLIP_STD).view(1, 3, 1, 1)
    theirs = ((x - mean) / std).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


class _TorchBottleneck(nn.Module):
    """Bespoke golden replicating habitat's GroupNorm bottleneck semantics
    (1x1 -> gn -> relu -> 3x3(stride) -> gn -> relu -> 1x1 -> gn, residual
    with optional 1x1(stride)+gn downsample, final relu)."""

    def __init__(self, c_in, planes, ngroups, stride, expansion=4):
        super().__init__()
        c_out = planes * expansion
        self.convs = nn.Sequential(
            nn.Conv2d(c_in, planes, 1, bias=False),
            nn.GroupNorm(ngroups, planes),
            nn.ReLU(True),
            nn.Conv2d(planes, planes, 3, stride, 1, bias=False),
            nn.GroupNorm(ngroups, planes),
            nn.ReLU(True),
            nn.Conv2d(planes, c_out, 1, bias=False),
            nn.GroupNorm(ngroups, c_out),
        )
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.GroupNorm(ngroups, c_out),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        return torch.relu(self.convs(x) + identity)


class _TorchDepthEncoder(nn.Module):
    def __init__(self, cfg: DepthEncoderConfig):
        super().__init__()
        bp, ng = cfg.baseplanes, cfg.ngroups
        self.stem = nn.Sequential(
            nn.Conv2d(1, bp, 7, 2, 3, bias=False),
            nn.GroupNorm(ng, bp), nn.ReLU(True),
            nn.MaxPool2d(3, 2, 1))
        layers = []
        c_in = bp
        self.blocks = nn.ModuleList()
        for li, nblocks in enumerate(cfg.layers):
            planes = bp * (2 ** li)
            for bi in range(nblocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                self.blocks.append(
                    _TorchBottleneck(c_in, planes, ng, stride,
                                     cfg.expansion))
                c_in = planes * cfg.expansion
        spatial = cfg.input_size // 32
        comp = int(round(cfg.output_size / spatial ** 2))
        self.compression = nn.Sequential(
            nn.Conv2d(c_in, comp, 3, 1, 1, bias=False),
            nn.GroupNorm(1, comp), nn.ReLU(True))

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.compression(x)


def _torch_to_ref_state_dict(model: _TorchDepthEncoder,
                             cfg: DepthEncoderConfig):
    """Re-key the torch golden into the reference ddppo layout."""
    sd = {}
    st = model.stem
    sd["backbone.conv1.weight"] = st[0].weight.detach().numpy()
    sd["backbone.bn1.weight"] = st[1].weight.detach().numpy()
    sd["backbone.bn1.bias"] = st[1].bias.detach().numpy()
    bi_global = 0
    for li, nblocks in enumerate(cfg.layers):
        for bi in range(nblocks):
            blk = model.blocks[bi_global]
            base = f"backbone.layer{li + 1}.{bi}"
            for j in (0, 3, 6):
                sd[f"{base}.convs.{j}.weight"] = \
                    blk.convs[j].weight.detach().numpy()
            for j in (1, 4, 7):
                sd[f"{base}.convs.{j}.weight"] = \
                    blk.convs[j].weight.detach().numpy()
                sd[f"{base}.convs.{j}.bias"] = \
                    blk.convs[j].bias.detach().numpy()
            if blk.downsample is not None:
                sd[f"{base}.downsample.0.weight"] = \
                    blk.downsample[0].weight.detach().numpy()
                sd[f"{base}.downsample.1.weight"] = \
                    blk.downsample[1].weight.detach().numpy()
                sd[f"{base}.downsample.1.bias"] = \
                    blk.downsample[1].bias.detach().numpy()
            bi_global += 1
    sd["compression.0.weight"] = model.compression[0].weight.detach().numpy()
    sd["compression.1.weight"] = model.compression[1].weight.detach().numpy()
    sd["compression.1.bias"] = model.compression[1].bias.detach().numpy()
    return sd


def test_depth_resnet_matches_torch_golden(rng):
    cfg = DepthEncoderConfig(input_size=32, baseplanes=8, ngroups=4,
                             layers=(1, 1, 1, 1), output_size=16)
    torch.manual_seed(0)
    model = _TorchDepthEncoder(cfg).eval()
    sd = _torch_to_ref_state_dict(model, cfg)
    params = depth_resnet.convert_ddppo_depth(sd, cfg)

    depth = rng.random((2, cfg.input_size, cfg.input_size, 1)).astype(
        np.float32)
    ours = np.asarray(depth_resnet.encode_depth(
        params, cfg, jnp.asarray(depth), dtype=jnp.float32))
    with torch.no_grad():
        theirs = model(torch.from_numpy(depth.transpose(0, 3, 1, 2))
                       ).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_depth_init_shapes():
    cfg = DepthEncoderConfig(input_size=32, baseplanes=8, ngroups=4,
                             layers=(1, 1, 1, 1), output_size=16)
    params = depth_resnet.init_depth_params(jax.random.PRNGKey(0), cfg)
    out = depth_resnet.encode_depth(
        params, cfg, jnp.zeros((1, 32, 32, 1)), dtype=jnp.float32)
    spatial = cfg.input_size // 32
    comp = int(round(cfg.output_size / spatial ** 2))
    assert out.shape == (1, spatial, spatial, comp)


def test_full_size_depth_shape():
    """128x128 depth -> (4,4,128), flattened 2048, matching the reference's
    visual_fc_depth input (TRM_net.py:27-31)."""
    cfg = DepthEncoderConfig()
    params = depth_resnet.init_depth_params(jax.random.PRNGKey(0), cfg)
    out = depth_resnet.encode_depth(
        params, cfg, jnp.zeros((1, 128, 128, 1)), dtype=jnp.float32)
    assert out.shape == (1, 4, 4, 128)


def test_depth_stem_matmul_matches_conv(rng):
    """The im2col-matmul stem is the exact 7x7/s2 conv (same per-output
    summation; ~70x roofline gap of the C_in=1 lax.conv on MXU)."""
    from etpnav_tpu.models import depth_resnet as dr
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    p = dr.conv_init(jax.random.PRNGKey(5), 7, 1, 16)
    want = np.asarray(dr.conv2d(p, x, 2, 3))
    got = np.asarray(dr._stem_conv_matmul(p, x))
    np.testing.assert_allclose(got, want, atol=1e-5)
