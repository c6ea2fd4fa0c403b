"""Parity of the one-pass fused GroupNorm Pallas kernel
(ops/pallas_groupnorm.py) against the XLA path
(models/depth_resnet.group_norm) in interpret mode, at every activation
shape the depth trunk produces (VERDICT r3 #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etpnav_tpu.models.depth_resnet import group_norm
from etpnav_tpu.ops.pallas_groupnorm import group_norm_fused

# (B, H, W, C, groups): stem, layer1..4 block outputs, compression —
# full r2r depth trunk at 128x128 input (ngroups=16; compression GN(1))
TRUNK_SHAPES = [
    (2, 64, 64, 32, 16),
    (2, 32, 32, 32, 16), (2, 32, 32, 128, 16),
    (2, 16, 16, 64, 16), (2, 16, 16, 256, 16),
    (2, 8, 8, 128, 16), (2, 8, 8, 512, 16),
    (2, 4, 4, 256, 16), (2, 4, 4, 1024, 16),
    (2, 4, 4, 8, 1),
]


@pytest.mark.parametrize("shape", TRUNK_SHAPES,
                         ids=[f"{h}x{w}x{c}" for _, h, w, c, _
                              in TRUNK_SHAPES])
def test_fused_gn_parity(shape, rng):
    B, H, W, C, G = shape
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    p = {"scale": jnp.asarray(rng.standard_normal(C) + 1.0, jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    ref = jax.nn.relu(group_norm(p, x, G))
    got = group_norm_fused(p, x, G, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_gn_residual_and_bf16(rng):
    B, H, W, C, G = 2, 8, 8, 64, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    p = {"scale": jnp.ones(C, jnp.float32),
         "bias": jnp.zeros(C, jnp.float32)}
    ref = jax.nn.relu(group_norm(p, x, G) + res)
    got = group_norm_fused(p, x, G, relu=True, residual=res,
                           interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05)


def test_fused_trunk_matches_xla_trunk(rng):
    """encode_depth with use_fused_gn on a TPU-less backend silently uses
    the XLA path (backend gate) — identical outputs by construction. The
    kernel-vs-XLA trunk A/B runs on TPU via tools/exp_gn_pallas.py."""
    import dataclasses

    from etpnav_tpu.config import tiny_config
    from etpnav_tpu.models.depth_resnet import encode_depth, \
        init_depth_params
    cfg = tiny_config().depth
    params = init_depth_params(jax.random.PRNGKey(0), cfg)
    d = jnp.asarray(rng.random((2, cfg.input_size, cfg.input_size, 1)),
                    jnp.float32)
    base = encode_depth(params, cfg, d)
    fused_cfg = dataclasses.replace(cfg, use_fused_gn=True)
    out = encode_depth(params, fused_cfg, d)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
