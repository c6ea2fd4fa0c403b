"""Fused biased attention: interpret-mode parity with the XLA path and
custom-VJP gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etpnav_tpu.ops.pallas_attention import (
    _attention_xla,
    fused_attention,
    fused_bias_attention,
)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("B,H,Lq,Lk,hd", [(2, 4, 16, 16, 32),
                                          (1, 2, 8, 24, 16)])
def test_fused_matches_xla(rng, B, H, Lq, Lk, hd):
    q = jnp.asarray(_rand(rng, B, H, Lq, hd))
    k = jnp.asarray(_rand(rng, B, H, Lk, hd))
    v = jnp.asarray(_rand(rng, B, H, Lk, hd))
    bias = jnp.asarray(_rand(rng, B, Lq, Lk)) * 3
    scale = 1.0 / np.sqrt(hd)
    ours = fused_bias_attention(q, k, v, bias, scale, True)
    ref = _attention_xla(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize("B,H,Lq,hd,blk,pack",
                         [(6, 4, 16, 32, 4, 1),
                          (5, 2, 8, 16, 8, 1),      # odd B
                          (4, 12, 50, 64, 8, 2),    # CLIP shape, packed
                          (6, 4, 16, 32, 2, 4),
                          (4, 12, 50, 64, 8, None)])  # auto pack
def test_fused_nobias_matches_xla(rng, B, H, Lq, hd, blk, pack):
    q = jnp.asarray(_rand(rng, B, H, Lq, hd))
    k = jnp.asarray(_rand(rng, B, H, Lq, hd))
    v = jnp.asarray(_rand(rng, B, H, Lq, hd))
    scale = 1.0 / np.sqrt(hd)
    ours = fused_attention(q, k, v, scale, block_b=blk, pack=pack,
                           interpret=True)
    ref = _attention_xla(q, k, v, jnp.zeros((B, Lq, Lq)), scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize("B,H,L,hd", [(4, 12, 50, 64),   # CLIP shape
                                      (6, 4, 16, 32)])
def test_fused_nobias_blhd_layout(rng, B, H, L, hd):
    """blhd=True consumes/produces the natural (B, L, H, hd) projection
    layout — same math, no HBM transposes around the kernel."""
    q = jnp.asarray(_rand(rng, B, L, H, hd))
    k = jnp.asarray(_rand(rng, B, L, H, hd))
    v = jnp.asarray(_rand(rng, B, L, H, hd))
    scale = 1.0 / np.sqrt(hd)
    ours = fused_attention(q, k, v, scale, blhd=True, interpret=True)
    ref = _attention_xla(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3), jnp.zeros((B, L, L)),
                         scale).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5)


def test_prenorm_block_interpret_parity(rng):
    """Experimental pre-norm attention half-block: interpret-mode parity
    (hardware lowering is Mosaic-rejected — see kernel docstring)."""
    from etpnav_tpu.ops.basic import layer_norm, ln_init
    from etpnav_tpu.ops.attention import mha, mha_init
    from etpnav_tpu.ops.pallas_attention import fused_prenorm_attention
    B, L, D, H = 6, 50, 64, 4
    x = jnp.asarray(_rand(rng, B, L, D))
    attn = mha_init(jax.random.PRNGKey(0), D)
    ln = ln_init(D)
    a = layer_norm(x, ln["scale"], ln["bias"], 1e-5)
    ref = x + mha(attn, a, a, H)
    out = fused_prenorm_attention(x, ln, attn, H, 1e-5, block_b=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_prenorm_v2_interpret_parity(rng):
    """Mosaic-compatible pre-norm half-block (lane-sliced heads):
    interpret-mode parity with the LN + mha + residual reference."""
    from etpnav_tpu.ops.basic import layer_norm, ln_init
    from etpnav_tpu.ops.attention import mha, mha_init
    from etpnav_tpu.ops.pallas_attention import fused_prenorm_attention_v2
    B, L, D, H = 6, 50, 64, 4
    x = jnp.asarray(_rand(rng, B, L, D))
    attn = mha_init(jax.random.PRNGKey(1), D)
    ln = ln_init(D)
    ln = {"scale": ln["scale"] * 1.1, "bias": ln["bias"] + 0.05}
    a = layer_norm(x, ln["scale"], ln["bias"], 1e-5)
    ref = x + mha(attn, a, a, H)
    out = fused_prenorm_attention_v2(x, ln, attn, H, 1e-5, block_b=2,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_fused_handles_masked_rows(rng):
    B, H, L, hd = 1, 2, 8, 16
    q = jnp.asarray(_rand(rng, B, H, L, hd))
    k = jnp.asarray(_rand(rng, B, H, L, hd))
    v = jnp.asarray(_rand(rng, B, H, L, hd))
    bias = jnp.full((B, L, L), -10000.0)   # everything masked
    out = fused_bias_attention(q, k, v, bias, 0.25, True)
    assert bool(jnp.isfinite(out).all())


def test_fused_gradients_match_xla(rng):
    B, H, L, hd = 1, 2, 8, 16
    q = jnp.asarray(_rand(rng, B, H, L, hd))
    k = jnp.asarray(_rand(rng, B, H, L, hd))
    v = jnp.asarray(_rand(rng, B, H, L, hd))
    bias = jnp.asarray(_rand(rng, B, L, L))
    scale = 0.25

    def loss_fused(q, k, v, bias):
        return fused_bias_attention(q, k, v, bias, scale, True).sum()

    def loss_xla(q, k, v, bias):
        return _attention_xla(q, k, v, bias, scale).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_mha_fused_path_matches_default(rng):
    """Force the fused path through the public mha() and compare."""
    from etpnav_tpu.ops import attention as attn_mod
    from etpnav_tpu.ops.attention import mha, mha_init
    from etpnav_tpu.ops.basic import mask_to_bias

    D, H, B, L = 32, 4, 2, 10
    params = mha_init(jax.random.PRNGKey(0), D)
    x = jnp.asarray(_rand(rng, B, L, D))
    mask = np.ones((B, L), bool)
    mask[0, 6:] = False
    bias = mask_to_bias(jnp.asarray(mask))[:, None, None, :]

    ref = mha(params, x, x, H, bias)
    # patch pallas to interpret mode for CPU execution
    import etpnav_tpu.ops.pallas_attention as pa
    orig = pa.fused_bias_attention

    def interp(q, k, v, b, scale, interpret=False):
        return orig(q, k, v, b, scale, True)

    attn_mod.USE_FUSED_ATTENTION = True
    pa_fused, pa.fused_bias_attention = pa.fused_bias_attention, interp
    try:
        fused = mha(params, x, x, H, bias)
    finally:
        attn_mod.USE_FUSED_ATTENTION = None
        pa.fused_bias_attention = pa_fused
    np.testing.assert_allclose(np.asarray(fused)[mask],
                               np.asarray(ref)[mask], atol=2e-5)


def test_fused_attention_block_interpret_parity(rng):
    """EXPERIMENTAL block kernel (attn + out-proj + residual LN): exact in
    interpret mode; not used in production paths (see module docstring)."""
    from etpnav_tpu.ops.attention import (self_attention_block,
                                          self_attention_block_init)
    from etpnav_tpu.ops.pallas_attention import fused_attention_block
    from etpnav_tpu.ops.basic import mask_to_bias

    D, H, B, L = 64, 4, 2, 16
    params = self_attention_block_init(jax.random.PRNGKey(0), D)
    x = jnp.asarray(_rand(rng, B, L, D))
    mask = np.ones((B, L), bool)
    mask[0, 10:] = False
    ref = self_attention_block(
        params, x, H, mask_to_bias(jnp.asarray(mask))[:, None, None, :],
        1e-12)
    bias3 = jnp.broadcast_to(
        mask_to_bias(jnp.asarray(mask))[:, None, :], (B, L, L))
    ours = fused_attention_block(x, params, bias3, H, 1e-12,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5)


def test_fused_attention_nhd_matches_xla(rng):
    """No-transpose natural-layout kernel (grid over batch x head-group
    lane blocks) matches the einsum formulation exactly; all
    heads_per_block variants and a non-divisible batch."""
    import math

    from etpnav_tpu.ops.pallas_attention import fused_attention_nhd

    B, L, H, hd = 6, 10, 8, 16
    D = H * hd
    scale = 1.0 / math.sqrt(hd)
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    p = jax.nn.softmax(logits, -1)
    want = np.asarray(jnp.einsum("bhqk,bhkd->bhqd", p, vh)
                      .transpose(0, 2, 1, 3).reshape(B, L, D))

    for hpb in (1, 2, 4, 8):
        got = np.asarray(fused_attention_nhd(
            q, k, v, scale, num_heads=H, heads_per_block=hpb,
            block_b=4, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_attention_xbatch_matches_xla(rng):
    """Cross-batch 'one big GEMM + block-diagonal mask' kernel equals
    per-sample attention: the -inf off-diagonal blocks must zero every
    cross-batch probability, including with non-divisible block sizes."""
    import math

    from etpnav_tpu.ops.pallas_attention import fused_attention_xbatch

    B, L, H, hd = 6, 10, 8, 16
    D = H * hd
    scale = 1.0 / math.sqrt(hd)
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    p = jax.nn.softmax(logits, -1)
    want = np.asarray(jnp.einsum("bhqk,bhkd->bhqd", p, vh)
                      .transpose(0, 2, 1, 3).reshape(B, L, D))

    for blk in (1, 2, 3, 4, 6):
        got = np.asarray(fused_attention_xbatch(
            q, k, v, scale, num_heads=H, block_b=blk, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_heatmap_nms_matches_xla_chain(rng):
    """One-kernel softmax+wrap+NMS equals the XLA chain exactly,
    including the reference's asymmetric circular-distance wrap quirk."""
    from etpnav_tpu.ops.nms import heatmap_nms
    from etpnav_tpu.ops.pallas_nms import fused_heatmap_nms

    B, A, D = 4, 120, 12
    logits = jnp.asarray(rng.standard_normal((B, A, D)) * 3, jnp.float32)
    prob = jax.nn.softmax(
        logits.reshape(B, A * D), axis=1).reshape(B, A, D)
    wrapped = jnp.concatenate([prob[:, -1:], prob, prob[:, :1]], axis=1)
    want = np.asarray(heatmap_nms(wrapped, 5, (7.0, 5.0)))
    got = np.asarray(fused_heatmap_nms(logits, 5, (7.0, 5.0),
                                       interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert (np.count_nonzero(got.reshape(B, -1), axis=1) == 5).all()


def test_fused_heatmap_nms_odd_batches(rng):
    """Batches not blockable by 8 (e.g. 7 live envs after one episode
    finishes mid-eval) are padded to a lowerable block and sliced back —
    regression for a Mosaic block-shape failure seen on TPU."""
    from etpnav_tpu.ops.nms import heatmap_nms
    from etpnav_tpu.ops.pallas_nms import fused_heatmap_nms

    A, D = 120, 12
    for B in (1, 3, 7, 9):
        logits = jnp.asarray(rng.standard_normal((B, A, D)) * 3,
                             jnp.float32)
        prob = jax.nn.softmax(
            logits.reshape(B, A * D), axis=1).reshape(B, A, D)
        wrapped = jnp.concatenate([prob[:, -1:], prob, prob[:, :1]],
                                  axis=1)
        want = np.asarray(heatmap_nms(wrapped, 5, (7.0, 5.0)))
        got = np.asarray(fused_heatmap_nms(logits, 5, (7.0, 5.0),
                                           interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-7, err_msg=f"B={B}")
