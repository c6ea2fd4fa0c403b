"""Parity tests for the legacy ImageNet ResNet-50 RGB encoder.

Golden: a torch transcription of torchvision resnet50 truncated after
layer4 (the reference wraps children()[:-2] in a Sequential,
vlnce_baselines/models/encoders/resnet_encoders.py:146-149) with the
exact torchvision state_dict key layout, plus the reference's
SpatialAvgPool + spatial-embedding concat (resnet_encoders.py:163-236).
torchvision itself is not installed in this image, so the transcription
carries randomized BN running stats to make the folded-affine conversion
load-bearing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from etpnav_tpu.models import imagenet_resnet as ir


class _TVBottleneck(nn.Module):
    """torchvision Bottleneck (stride on conv2, the v1.5 variant)."""

    def __init__(self, c_in, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if stride != 1 or c_in != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        if self.downsample is not None:
            x = self.downsample(x)
        return torch.relu(h + x)


class _TVResNet50Trunk(nn.Module):
    """state_dict keys match torchvision resnet50 exactly."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        c_in = 64
        for li, nblocks in enumerate(ir._LAYERS):
            planes = 64 * 2 ** li
            stride = 1 if li == 0 else 2
            blocks = []
            for bi in range(nblocks):
                blocks.append(_TVBottleneck(
                    c_in, planes, stride if bi == 0 else 1))
                c_in = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x


def _randomize_bn_stats(model, rng):
    """Frozen-encoder conversion folds running stats; make them nontrivial."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            c = m.num_features
            m.weight.data = torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.2 + 1.0)
            m.bias.data = torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.1)
            m.running_mean.data = torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.1)
            m.running_var.data = torch.from_numpy(
                (rng.random(c).astype(np.float32) * 0.5 + 0.5))


@pytest.fixture(scope="module")
def golden():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    model = _TVResNet50Trunk().eval()
    _randomize_bn_stats(model, rng)
    emb = nn.Embedding(ir.SPATIAL_GRID ** 2, ir.SPATIAL_EMBED_DIM)
    sd = {f"cnn.{k}": v for k, v in model.state_dict().items()}
    sd["spatial_embeddings.weight"] = emb.weight.detach()
    params = ir.convert_torchvision_resnet50(sd, prefix="")
    return model, emb, params


def _torch_reference_forward(model, emb, rgb_uint8, spatial_output):
    """Mirror of TorchVisionResNet50.forward (resnet_encoders.py:191-241)."""
    x = torch.from_numpy(rgb_uint8.transpose(0, 3, 1, 2)).float() / 255.0
    mean = torch.tensor(ir.IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(ir.IMAGENET_STD).view(1, 3, 1, 1)
    with torch.no_grad():
        out = model((x - mean) / std)
        if not spatial_output:
            return out.numpy().transpose(0, 2, 3, 1)
        out = F.adaptive_avg_pool2d(out, (4, 4))
        b, c, h, w = out.shape
        spatial = emb(torch.arange(0, emb.num_embeddings)).view(
            1, -1, h, w).expand(b, ir.SPATIAL_EMBED_DIM, h, w)
        return torch.cat([out, spatial], dim=1).numpy().transpose(0, 2, 3, 1)


def test_adaptive_avg_pool_matches_torch(rng):
    for hw, out in ((7, 4), (5, 3), (4, 4), (3, 4)):
        x = rng.random((2, hw, hw, 6)).astype(np.float32)
        ours = np.asarray(ir.adaptive_avg_pool(jnp.asarray(x), out))
        theirs = F.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (out, out)
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_imagenet_resnet_matches_torch_golden(golden, rng):
    model, emb, params = golden
    # 96x96 -> 3x3 layer4 map: exercises the overlapping-bin 3->4 pool.
    rgb = (rng.random((1, 96, 96, 3)) * 255).astype(np.uint8)

    ours = np.asarray(ir.encode_imagenet_rgb(
        params, jnp.asarray(rgb), spatial_output=True, dtype=jnp.float32))
    theirs = _torch_reference_forward(model, emb, rgb, spatial_output=True)
    assert ours.shape == theirs.shape == (1, 4, 4, 2048 + 64)
    np.testing.assert_allclose(ours, theirs, atol=2e-3)

    raw = np.asarray(ir.encode_imagenet_rgb(
        params, jnp.asarray(rgb), spatial_output=False, dtype=jnp.float32))
    raw_t = _torch_reference_forward(model, emb, rgb, spatial_output=False)
    assert raw.shape == raw_t.shape == (1, 3, 3, 2048)
    np.testing.assert_allclose(raw, raw_t, atol=2e-3)


def test_init_params_roundtrip_shapes():
    params = ir.init_imagenet_resnet_params(jax.random.PRNGKey(0))
    out = ir.encode_imagenet_rgb(params, jnp.zeros((1, 96, 96, 3), jnp.uint8),
                                 dtype=jnp.float32)
    assert out.shape == (1, 4, 4, 2048 + 64)
