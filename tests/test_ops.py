"""Golden-value tests for core ops against torch (CPU) references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from etpnav_tpu.ops import (
    gelu_erf,
    layer_norm,
    linear,
    gen_seq_masks,
    mask_to_bias,
    heatmap_nms,
    mha,
    mha_init,
)
from etpnav_tpu.ops.nms import extract_candidates


def test_gelu_matches_torch(rng):
    x = rng.standard_normal((64, 32)).astype(np.float32)
    ours = np.asarray(gelu_erf(jnp.asarray(x)))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("eps", [1e-12, 1e-5])
def test_layer_norm_matches_torch(rng, eps):
    x = rng.standard_normal((4, 10, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), eps))
    ln = torch.nn.LayerNorm(32, eps=eps)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(w))
        ln.bias.copy_(torch.from_numpy(b))
        theirs = ln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_linear_matches_torch(rng):
    x = rng.standard_normal((6, 16)).astype(np.float32)
    w = rng.standard_normal((16, 24)).astype(np.float32)
    b = rng.standard_normal(24).astype(np.float32)
    ours = np.asarray(linear({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                             jnp.asarray(x)))
    theirs = (torch.from_numpy(x) @ torch.from_numpy(w)
              + torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_gen_seq_masks():
    lens = jnp.asarray([0, 2, 5])
    m = gen_seq_masks(lens, 5)
    expected = np.array([
        [0, 0, 0, 0, 0],
        [1, 1, 0, 0, 0],
        [1, 1, 1, 1, 1],
    ], dtype=bool)
    np.testing.assert_array_equal(np.asarray(m), expected)
    bias = np.asarray(mask_to_bias(m))
    assert bias[0, 0] == -10000.0 and bias[2, 4] == 0.0


def test_mha_matches_torch_multihead(rng):
    """Our MHA must match torch.nn.MultiheadAttention (used by the
    reference's pano pre-norm encoder, common/transformer.py:138)."""
    D, H, B, L = 32, 4, 3, 7
    key = jax.random.PRNGKey(0)
    params = mha_init(key, D)

    torch_mha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    qw = np.asarray(params["q"]["w"]).T
    kw = np.asarray(params["k"]["w"]).T
    vw = np.asarray(params["v"]["w"]).T
    with torch.no_grad():
        torch_mha.in_proj_weight.copy_(
            torch.from_numpy(np.concatenate([qw, kw, vw], 0)))
        torch_mha.in_proj_bias.copy_(torch.from_numpy(np.concatenate([
            np.asarray(params["q"]["b"]), np.asarray(params["k"]["b"]),
            np.asarray(params["v"]["b"])])))
        torch_mha.out_proj.weight.copy_(
            torch.from_numpy(np.asarray(params["o"]["w"]).T))
        torch_mha.out_proj.bias.copy_(
            torch.from_numpy(np.asarray(params["o"]["b"])))

    x = rng.standard_normal((B, L, D)).astype(np.float32)
    ours = np.asarray(mha(params, jnp.asarray(x), jnp.asarray(x), H))
    with torch.no_grad():
        theirs = torch_mha(torch.from_numpy(x), torch.from_numpy(x),
                           torch.from_numpy(x), need_weights=False)[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def _nms_golden(pred, max_predictions, sigma):
    """Direct numpy transcription of the reference NMS semantics
    (waypoint_pred/utils.py:37-64) used as test oracle."""
    B, H, W = pred.shape
    out = np.zeros_like(pred)
    supp = pred.copy()
    for _ in range(max_predictions):
        flat = supp.reshape(B, -1)
        ix = flat.argmax(1)
        for b in range(B):
            out.reshape(B, -1)[b, ix[b]] = pred.reshape(B, -1)[b, ix[b]]
            y, x = divmod(ix[b], W)
            xs = np.arange(W)[None, :]
            ys = np.arange(H)[:, None]
            xd = xs - float(x)
            yd = ys - float(y)
            xd = np.minimum(np.abs(xd), np.abs(xd + W))
            g = ((xd <= sigma[0]) & (np.abs(yd) <= sigma[1])).astype(
                pred.dtype)
            supp[b] *= (1 - g)
    out[out < 0] = 0
    return out


def test_heatmap_nms_matches_reference_semantics(rng):
    B, H, W = 3, 122, 12
    logits = rng.standard_normal((B, H * W)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    prob = prob.reshape(B, H, W)
    ours = np.asarray(heatmap_nms(jnp.asarray(prob), 5, (7.0, 5.0)))
    golden = _nms_golden(prob, 5, (7.0, 5.0))
    np.testing.assert_allclose(ours, golden, atol=1e-7)
    # each batch row selects exactly 5 distinct peaks
    assert ((ours > 0).sum(axis=(1, 2)) == 5).all()


def test_extract_candidates_row_major_order(rng):
    m = np.zeros((1, 120, 12), np.float32)
    m[0, 3, 7] = 0.5
    m[0, 50, 2] = 0.9
    m[0, 119, 0] = 0.1
    ang, dist, valid = extract_candidates(jnp.asarray(m), 5)
    np.testing.assert_array_equal(np.asarray(ang[0]), [3, 50, 119, 0, 0])
    np.testing.assert_array_equal(np.asarray(dist[0]), [7, 2, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(valid[0]),
                                  [True, True, True, False, False])


def test_eight_virtual_devices():
    assert jax.device_count() == 8


# ---------------------------------------------------------------------------
# cubemap -> equirect (obs_transformers.py:213-264 CubeMap2Equirect)
# ---------------------------------------------------------------------------

def _render_cube_faces(fn, Hf, Wf):
    """Render the 6 faces (Back Down Front Left Right Up) of an analytic
    direction field fn(d)->(...,C)."""
    from etpnav_tpu.ops.image import _CUBE_FACES
    out = []
    for fwd, right, up in _CUBE_FACES:
        u = (np.arange(Wf) + 0.5) / Wf * 2 - 1
        v = (np.arange(Hf) + 0.5) / Hf * 2 - 1
        uu, vv = np.meshgrid(u, v)
        d = (np.asarray(fwd)[None, None]
             + uu[..., None] * np.asarray(right)[None, None]
             - vv[..., None] * np.asarray(up)[None, None])
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        out.append(fn(d))
    return np.stack(out)


def test_cubemap_to_equirect_analytic_field():
    """Stitching faces rendered from a smooth direction field must
    reproduce the direct equirect render of the same field (bilinear
    tolerance) — validates face selection, orientation conventions, and
    interpolation in one shot."""
    from etpnav_tpu.ops.image import cubemap_to_equirect, \
        equirect_directions

    def field(d):
        # smooth, direction-dependent, 3 channels
        return np.stack([0.5 + 0.5 * d[..., 0],
                         0.5 + 0.5 * d[..., 1],
                         0.5 + 0.5 * d[..., 2]], axis=-1).astype(
                             np.float32)

    Hf = Wf = 64
    faces = _render_cube_faces(field, Hf, Wf)            # (6,Hf,Wf,3)
    out = np.asarray(cubemap_to_equirect(
        jnp.asarray(faces)[None], (32, 64)))[0]
    want = field(equirect_directions((32, 64)))
    # bilinear resampling of a smooth field: small uniform error
    assert np.abs(out - want).max() < 0.03
    assert np.abs(out - want).mean() < 0.005


def test_cubemap_to_equirect_face_placement():
    """Solid-color faces land in the right equirect regions: front at
    the center column, up at the top, down at the bottom, back at the
    seam columns."""
    from etpnav_tpu.ops.image import cubemap_to_equirect
    # Back, Down, Front, Left, Right, Up
    colors = np.arange(6, dtype=np.float32) + 1
    faces = np.ones((6, 16, 16, 1), np.float32) * colors[:, None, None,
                                                         None]
    out = np.asarray(cubemap_to_equirect(jnp.asarray(faces), (32, 64)))
    assert out[16, 32, 0] == 3.0          # center -> Front
    assert out[16, 0, 0] == 1.0           # seam -> Back
    assert out[16, 63, 0] == 1.0
    assert out[0, 32, 0] == 6.0           # zenith -> Up
    assert out[31, 32, 0] == 2.0          # nadir -> Down
    assert out[16, 48, 0] == 5.0          # +90deg column -> Right
    assert out[16, 16, 0] == 4.0          # -90deg column -> Left
    assert set(np.unique(np.round(out, 3))) <= set(colors)


def test_cubemap_to_equirect_uint8_and_batch():
    from etpnav_tpu.ops.image import cubemap_to_equirect
    rng = np.random.default_rng(0)
    faces = rng.integers(0, 256, (2, 6, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(cubemap_to_equirect(jnp.asarray(faces), (16, 32)))
    assert out.shape == (2, 16, 32, 3) and out.dtype == np.uint8
    # jittable with static shapes
    f = jax.jit(lambda x: cubemap_to_equirect(x, (16, 32)))
    np.testing.assert_array_equal(np.asarray(f(jnp.asarray(faces))), out)


def test_maybe_dropout_bits8_mode():
    """DROPOUT_BITS8 (uint8-bits masks, tools/exp_learn_bisect.py bits8
    probe): kept elements scale by 1/keep_eff where keep_eff = n/256, the
    empirical keep rate matches, and rate==0/train=False stay identity."""
    from etpnav_tpu.ops import basic
    x = jnp.ones((64, 256), jnp.float32)
    key = jax.random.key(0, impl="rbg")
    basic.DROPOUT_BITS8 = True
    try:
        out = np.asarray(basic.maybe_dropout(x, 0.1, key, train=True))
        keep_eff = round(0.9 * 256) / 256
        kept = out > 0
        assert set(np.unique(out)) <= {0.0, np.float32(1.0 / keep_eff)}
        assert abs(kept.mean() - keep_eff) < 0.01
        # identity paths unaffected
        np.testing.assert_array_equal(
            np.asarray(basic.maybe_dropout(x, 0.0, key, True)), x)
        np.testing.assert_array_equal(
            np.asarray(basic.maybe_dropout(x, 0.1, key, False)), x)
        # keep quantizing to 256/256 (rate < 1/512) degrades to identity
        np.testing.assert_array_equal(
            np.asarray(basic.maybe_dropout(x, 1e-4, key, True)), x)
    finally:
        basic.DROPOUT_BITS8 = False
