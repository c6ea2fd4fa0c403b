"""Recurrent VLN-BERT (PREVALENT) legacy policy: language encoding,
candidate-masked navigation recurrence, and the supervised DAgger update
(SURVEY.md §2 row 24; vlnbert_PREVALENT.py behavior map in the module
docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from etpnav_tpu.models import rec_vlnbert as rvb

CFG = rvb.RecVLNBertConfig(
    vocab_size=96, hidden=48, heads=4, intermediate=64, la_layers=2,
    vl_layers=2, max_pos=32, rgb_dim=10, depth_dim=6, angle_dim=4,
    max_cands=5, hidden_dropout=0.0, attn_dropout=0.0)

B, L, K = 3, 11, CFG.max_cands


@pytest.fixture(scope="module")
def params():
    return rvb.init_params(jax.random.PRNGKey(0), CFG)


def _tokens(rng, b=B, l=L):
    toks = rng.integers(1, CFG.vocab_size, (b, l))
    toks[:, -3:] = 0                               # padding tail
    mask = toks != 0
    return jnp.asarray(toks), jnp.asarray(mask)


def _cands(rng, b=B, k=K):
    return (jnp.asarray(rng.standard_normal((b, k, CFG.rgb_dim)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal((b, k, CFG.depth_dim)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal((b, k, CFG.angle_dim)),
                        jnp.float32))


def test_language_shapes_and_pooler(params, rng):
    tokens, mask = _tokens(rng)
    state, feats = rvb.encode_language(params, CFG, tokens, mask)
    assert state.shape == (B, CFG.hidden)
    assert feats.shape == (B, L, CFG.hidden)
    # pooler is tanh-bounded (vlnbert_PREVALENT.py:208-220)
    assert np.all(np.abs(np.asarray(state)) <= 1.0)


def test_language_rxr_feature_path(params, rng):
    """RxR instructions arrive as precomputed features and skip the
    embedding table (vlnbert_PREVALENT.py:402-404)."""
    feats_in = jnp.asarray(
        rng.standard_normal((B, L, CFG.hidden)), jnp.float32)
    mask = jnp.ones((B, L), bool)
    state, feats = rvb.encode_language(params, CFG, None, mask,
                                       text_feats=feats_in)
    assert state.shape == (B, CFG.hidden)
    assert feats.shape == (B, L, CFG.hidden)


def test_nav_step_shapes_and_mask(params, rng):
    tokens, mask = _tokens(rng)
    state, feats = rvb.encode_language(params, CFG, tokens, mask)
    rgb, dep, ang = _cands(rng)
    cand_mask = jnp.asarray([[1, 1, 1, 0, 0],
                             [1, 1, 0, 0, 0],
                             [1, 1, 1, 1, 1]], bool)
    logits, state2 = rvb.nav_step(params, CFG, state, feats, mask,
                                  rgb, dep, ang, cand_mask)
    assert logits.shape == (B, K)
    assert state2.shape == (B, CFG.hidden)
    lg = np.asarray(logits)
    assert np.all(lg[~np.asarray(cand_mask)] <= rvb.NEG_INF / 2)
    assert np.all(np.isfinite(lg[np.asarray(cand_mask)]))
    # the recurrence moved
    assert not np.allclose(np.asarray(state2), np.asarray(state))


def test_masked_candidate_features_are_inert(params, rng):
    """Perturbing a masked candidate slot must not change valid logits
    or the new state (fixed-slot masking invariant)."""
    tokens, mask = _tokens(rng)
    state, feats = rvb.encode_language(params, CFG, tokens, mask)
    rgb, dep, ang = _cands(rng)
    cand_mask = jnp.asarray([[1, 1, 1, 0, 0]] * B, bool)
    logits1, s1 = rvb.nav_step(params, CFG, state, feats, mask,
                               rgb, dep, ang, cand_mask)
    rgb2 = rgb.at[:, 4].set(100.0)
    dep2 = dep.at[:, 4].set(-50.0)
    logits2, s2 = rvb.nav_step(params, CFG, state, feats, mask,
                               rgb2, dep2, ang, cand_mask)
    np.testing.assert_allclose(np.asarray(logits1[:, :3]),
                               np.asarray(logits2[:, :3]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=0, atol=1e-5)


def test_recurrence_feeds_back_into_logits(params, rng):
    """Two steps with identical observations must differ in logits
    because the state token advanced (the 'recurrent' in recurrent
    VLN-BERT)."""
    tokens, mask = _tokens(rng)
    state, feats = rvb.encode_language(params, CFG, tokens, mask)
    rgb, dep, ang = _cands(rng)
    cand_mask = jnp.ones((B, K), bool)
    logits1, s1 = rvb.nav_step(params, CFG, state, feats, mask,
                               rgb, dep, ang, cand_mask)
    logits2, _ = rvb.nav_step(params, CFG, s1, feats, mask,
                              rgb, dep, ang, cand_mask)
    assert not np.allclose(np.asarray(logits1), np.asarray(logits2))


def test_sequence_nll_trains(params, rng):
    """A few adam steps on a fixed batch reduce the teacher CE — grads
    flow end-to-end through the scanned recurrence."""
    T = 3
    tokens, mask = _tokens(rng)
    rgb = jnp.asarray(rng.standard_normal((B, T, K, CFG.rgb_dim)),
                      jnp.float32)
    dep = jnp.asarray(rng.standard_normal((B, T, K, CFG.depth_dim)),
                      jnp.float32)
    ang = jnp.asarray(rng.standard_normal((B, T, K, CFG.angle_dim)),
                      jnp.float32)
    cand_mask = jnp.ones((B, T, K), bool)
    teacher = jnp.asarray(rng.integers(0, K, (B, T)))
    step_mask = jnp.ones((B, T), bool).at[0, -1].set(False)

    tx = optax.adam(1e-3)
    p = params
    opt = tx.init(p)

    @jax.jit
    def update(p, opt):
        loss, grads = jax.value_and_grad(rvb.sequence_nll)(
            p, CFG, tokens, mask, rgb, dep, ang, cand_mask, teacher,
            step_mask, train=False)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    losses = []
    for _ in range(4):
        p, opt, loss = update(p, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dropout_rng_path(params, rng):
    """Train-mode dropout draws differ per rng and are disabled in eval."""
    cfg = rvb.RecVLNBertConfig(
        vocab_size=96, hidden=48, heads=4, intermediate=64, la_layers=2,
        vl_layers=2, max_pos=32, rgb_dim=10, depth_dim=6, angle_dim=4,
        max_cands=5, hidden_dropout=0.3, attn_dropout=0.3)
    tokens, mask = _tokens(rng)
    s_eval1, _ = rvb.encode_language(params, cfg, tokens, mask)
    s_eval2, _ = rvb.encode_language(params, cfg, tokens, mask)
    np.testing.assert_array_equal(np.asarray(s_eval1), np.asarray(s_eval2))
    s_tr1, _ = rvb.encode_language(params, cfg, tokens, mask,
                                   rng=jax.random.PRNGKey(1), train=True)
    s_tr2, _ = rvb.encode_language(params, cfg, tokens, mask,
                                   rng=jax.random.PRNGKey(2), train=True)
    assert not np.allclose(np.asarray(s_tr1), np.asarray(s_tr2))


def test_prevalent_checkpoint_conversion(rng):
    """A synthetic PREVALENT-layout state_dict converts into the param
    tree and drives the model; embedding rows and pooler weights land
    exactly where the reference reads them."""
    from etpnav_tpu.models.convert import convert_rec_vlnbert

    H, I = CFG.hidden, CFG.intermediate
    V = CFG.vocab_size
    sd = {}

    def lin(key, din, dout):
        sd[f"{key}.weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) * 0.02
        sd[f"{key}.bias"] = np.zeros(dout, np.float32)

    def ln(key, d):
        sd[f"{key}.weight"] = np.ones(d, np.float32)
        sd[f"{key}.bias"] = np.zeros(d, np.float32)

    sd["embeddings.word_embeddings.weight"] = rng.standard_normal(
        (V, H)).astype(np.float32)
    sd["embeddings.position_embeddings.weight"] = rng.standard_normal(
        (CFG.max_pos, H)).astype(np.float32)
    sd["embeddings.token_type_embeddings.weight"] = rng.standard_normal(
        (CFG.type_vocab, H)).astype(np.float32)
    ln("embeddings.LayerNorm", H)
    for i in range(CFG.la_layers):
        b = f"lalayer.{i}"
        for p in ("query", "key", "value"):
            lin(f"{b}.attention.self.{p}", H, H)
        lin(f"{b}.attention.output.dense", H, H)
        ln(f"{b}.attention.output.LayerNorm", H)
        lin(f"{b}.intermediate.dense", H, I)
        lin(f"{b}.output.dense", I, H)
        ln(f"{b}.output.LayerNorm", H)
    for i in range(CFG.vl_layers):
        b = f"addlayer.{i}"
        for p in ("query", "key", "value"):
            lin(f"{b}.visual_attention.att.{p}", H, H)
            lin(f"{b}.visn_self_att.self.{p}", H, H)
        lin(f"{b}.visual_attention.output.dense", H, H)
        ln(f"{b}.visual_attention.output.LayerNorm", H)
        lin(f"{b}.visn_self_att.output.dense", H, H)
        ln(f"{b}.visn_self_att.output.LayerNorm", H)
        lin(f"{b}.visn_inter.dense", H, I)
        lin(f"{b}.visn_output.dense", I, H)
        ln(f"{b}.visn_output.LayerNorm", H)
        # dead lang branch: present in the ckpt, ignored by conversion
        lin(f"{b}.lang_self_att.self.query", H, H)
    lin("pooler.dense", H, H)

    base = rvb.init_params(jax.random.PRNGKey(1), CFG)
    params = convert_rec_vlnbert(sd, base, CFG.la_layers, CFG.vl_layers)

    np.testing.assert_allclose(
        np.asarray(params["embeddings"]["word_embeddings"]),
        sd["embeddings.word_embeddings.weight"], atol=0)
    np.testing.assert_allclose(
        np.asarray(params["pooler"]["w"]),
        sd["pooler.dense.weight"].T, atol=0)
    assert params["lalayer"]["attention"]["attn"]["q"]["w"].shape == \
        (CFG.la_layers, H, H)
    # fusion projections carried over from base init
    np.testing.assert_array_equal(np.asarray(params["rgb_proj"]["w"]),
                                  np.asarray(base["rgb_proj"]["w"]))

    # the converted tree drives the full decision path
    toks, mask = _tokens(np.random.default_rng(2))
    state, feats = rvb.encode_language(params, CFG, toks, mask)
    rgb, dep, ang = _cands(np.random.default_rng(3))
    logits, state2 = rvb.nav_step(params, CFG, state, feats, mask,
                                  rgb, dep, ang, jnp.ones((B, K), bool))
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(state2)).all()


def test_encode_language_matches_hf_bert_via_released_layout(rng):
    """encode_language pinned to HF BertModel goldens THROUGH the
    released PREVALENT key layout: HF weights re-keyed to the
    pytorch_model.bin naming ('lalayer.{i}.*', 'embeddings.*',
    'pooler.*', vlnbert_PREVALENT.py:362-381), converted with
    convert_rec_vlnbert, and the pooled state + language features
    compared at 2e-5 (the PREVALENT language path IS a 9-layer BERT +
    tanh pooler)."""
    import torch
    from transformers import BertConfig, BertModel

    from etpnav_tpu.models.convert import convert_rec_vlnbert

    hf_cfg = BertConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden,
        num_hidden_layers=CFG.la_layers, num_attention_heads=CFG.heads,
        intermediate_size=CFG.intermediate,
        max_position_embeddings=CFG.max_pos, hidden_act="gelu",
        layer_norm_eps=CFG.eps, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(7)
    model = BertModel(hf_cfg).eval()          # with pooler

    sd = {}
    for k, v in model.state_dict().items():
        if k.startswith("encoder.layer."):
            k = "lalayer." + k[len("encoder.layer."):]
        sd[k] = v                              # embeddings./pooler. as-is
    # the ckpt also carries the cross-modal stack; synthesize it (the
    # language path under test never touches it)
    g = np.random.default_rng(0)
    H, I = CFG.hidden, CFG.intermediate
    for i in range(CFG.vl_layers):
        b = f"addlayer.{i}"
        for mod, din, dout in (
                ("visual_attention.att.query", H, H),
                ("visual_attention.att.key", H, H),
                ("visual_attention.att.value", H, H),
                ("visual_attention.output.dense", H, H),
                ("visn_self_att.self.query", H, H),
                ("visn_self_att.self.key", H, H),
                ("visn_self_att.self.value", H, H),
                ("visn_self_att.output.dense", H, H),
                ("visn_inter.dense", H, I),
                ("visn_output.dense", I, H)):
            sd[f"{b}.{mod}.weight"] = g.standard_normal(
                (dout, din)).astype(np.float32)
            sd[f"{b}.{mod}.bias"] = np.zeros(dout, np.float32)
        for ln in ("visual_attention.output.LayerNorm",
                   "visn_self_att.output.LayerNorm",
                   "visn_output.LayerNorm"):
            sd[f"{b}.{ln}.weight"] = np.ones(H, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(H, np.float32)
    base = rvb.init_params(jax.random.PRNGKey(3), CFG)
    params = convert_rec_vlnbert(sd, base, CFG.la_layers, CFG.vl_layers)

    toks, mask = _tokens(np.random.default_rng(7))
    state, feats = rvb.encode_language(params, CFG, toks, mask)
    with torch.no_grad():
        out = model(torch.from_numpy(np.asarray(toks)),
                    attention_mask=torch.from_numpy(
                        np.asarray(mask)).long())
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(feats)[m],
                               out.last_hidden_state.numpy()[m],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(state),
                               out.pooler_output.numpy(), atol=2e-5)
