"""Legacy CMA/DAgger path: policy step, trajectory store roundtrip,
full DAgger loop on the geometric env, recollection sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.models import cma
from etpnav_tpu.models.cma import CMAConfig
from etpnav_tpu.training.dagger import (
    DaggerConfig,
    DaggerTrainer,
    TeacherRecollectionSampler,
    TrajectoryStore,
)

CFG = CMAConfig(vocab_size=128, embed_dim=16, hidden_dim=32, rgb_dim=8,
                depth_dim=4)


def _feature_fn(obs):
    """Cheap stand-in for frozen encoders: pooled pixels."""
    rgb = np.stack([o["rgb"][0].mean((0, 1)) for o in obs])
    dep = np.stack([o["depth"][0].mean((0, 1)) for o in obs])
    rgb = np.tile(rgb, (1, 3))[:, :8].astype(np.float32)
    dep = np.tile(dep, (1, 4))[:, :4].astype(np.float32)
    return rgb, dep


def _envs(n=2):
    return GeometricNavEnv(num_envs=n, seed=0, vocab_size=CFG.vocab_size,
                           max_instr_len=12, image_size=16, depth_size=16)


def test_cma_step_shapes(rng):
    params = cma.init_cma_params(jax.random.PRNGKey(0), CFG)
    tokens = jnp.asarray(rng.integers(1, CFG.vocab_size, (3, 12)))
    instr, mask = cma.encode_instruction(params, CFG, tokens)
    assert instr.shape == (3, 12, CFG.hidden_dim)
    state = cma.initial_state(CFG, 3)
    logits, state2 = cma.cma_step(
        params, CFG, instr, mask,
        jnp.asarray(rng.standard_normal((3, 8)), jnp.float32),
        jnp.asarray(rng.standard_normal((3, 4)), jnp.float32), state)
    assert logits.shape == (3, 4)
    assert not np.allclose(np.asarray(state2), 0)


def test_trajectory_store_roundtrip(tmp_path):
    store = TrajectoryStore(str(tmp_path / "store"), flush_every=2)
    t1 = {"tokens": np.arange(5), "rgb": np.ones((3, 8), np.float32),
          "teacher": np.asarray([1, 2, 0], np.int32)}
    store.append(t1)
    store.flush()
    back = list(store)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0]["tokens"], t1["tokens"])
    np.testing.assert_array_equal(back[0]["teacher"], t1["teacher"])
    assert back[0]["rgb"].dtype == np.float16


def test_low_level_env_teacher_reaches_goal():
    envs = _envs(1)
    obs = envs.reset()
    for _ in range(200):
        a = envs.shortest_path_action(0)
        res = envs.step_low_level([a])
        if res[0].done:
            break
    assert res[0].done
    assert res[0].info["position"]["distance"][-1] < 1.5


def test_dagger_train_loop(tmp_path):
    envs = _envs(2)
    dcfg = DaggerConfig(iterations=2, episodes_per_iter=2, epochs=1,
                        batch_size=2, max_steps=30)
    tr = DaggerTrainer(envs, CFG, dcfg, _feature_fn,
                       str(tmp_path / "store"), seed=0)
    losses = tr.train()
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)
    assert len(tr.store.shard_files()) >= 1


def test_collect_drops_crashed_episodes(tmp_path):
    """A worker crash (done + info={'crashed': True}) discards that
    env's partial trajectory instead of storing it (ADVICE round 1)."""
    from etpnav_tpu.env.protocol import StepResult

    class CrashFirstEnv:
        def __init__(self, inner):
            self._inner = inner
            self._fired = False

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def step_low_level(self, actions):
            results = self._inner.step_low_level(actions)
            if not self._fired and self._inner.num_envs > 1:
                self._fired = True
                r = results[0]
                results[0] = StepResult(r.observation, True,
                                        {"crashed": True})
            return results

    envs = CrashFirstEnv(_envs(2))
    dcfg = DaggerConfig(episodes_per_iter=1, batch_size=2, max_steps=30)
    tr = DaggerTrainer(envs, CFG, dcfg, _feature_fn,
                       str(tmp_path / "store"), seed=0)
    tr.collect(beta=1.0, episodes=1)
    trajs = list(tr.store)
    assert len(trajs) == 1        # only the surviving env's episode


def test_update_single_compiled_shape(tmp_path):
    """The supervised update pads the final partial batch to the full
    batch size, so _cma_update sees exactly one shape per T (static
    shapes invariant; ADVICE round 1)."""
    from etpnav_tpu.training import dagger as dagger_mod

    envs = _envs(3)               # 3 episodes, batch_size=2 -> 2+1
    dcfg = DaggerConfig(iterations=1, episodes_per_iter=3, epochs=1,
                        batch_size=2, max_steps=10)
    tr = DaggerTrainer(envs, CFG, dcfg, _feature_fn,
                       str(tmp_path / "store"), seed=0)
    tr.collect(beta=1.0, episodes=3)
    shapes = []
    orig = dagger_mod._cma_update

    def recording(params, opt_state, cfg, tx, tokens, rgb, dep, teach,
                  mask):
        shapes.append((tokens.shape, rgb.shape, mask.shape))
        return orig(params, opt_state, cfg, tx, tokens, rgb, dep, teach,
                    mask)

    dagger_mod._cma_update = recording
    try:
        loss = tr.update(epochs=1)
    finally:
        dagger_mod._cma_update = orig
    assert np.isfinite(loss)
    assert len(shapes) == 2                    # ceil(3 / 2) batches
    assert len(set(shapes)) == 1               # ONE compiled shape
    assert shapes[0][0][0] == dcfg.batch_size  # padded to full B


def test_recollection_sampler():
    envs = _envs(2)
    it = iter(TeacherRecollectionSampler(envs, _feature_fn, max_steps=30))
    traj = next(it)
    assert traj["rgb"].shape[0] == traj["teacher"].shape[0]
    assert traj["teacher"][-1] == 0 or traj["rgb"].shape[0] == 30


# ---------------------------------------------------------------------------
# instruction encoder (encoders/instruction_encoder.py:9-101)
# ---------------------------------------------------------------------------

import gzip
import json

import jax.numpy as jnp

from etpnav_tpu.models.cma import (
    InstructionEncoderConfig,
    encode_instruction_rnn,
    init_instruction_encoder,
    load_pretrained_embeddings,
)


def _enc_cfg(**kw):
    base = dict(vocab_size=40, embedding_size=8, hidden_size=12,
                rnn_type="LSTM", bidirectional=True,
                final_state_only=False)
    base.update(kw)
    return InstructionEncoderConfig(**base)


@pytest.mark.parametrize("rnn_type,bidir", [("LSTM", True),
                                            ("LSTM", False),
                                            ("GRU", True),
                                            ("GRU", False)])
def test_instruction_encoder_shapes(rng, rnn_type, bidir):
    cfg = _enc_cfg(rnn_type=rnn_type, bidirectional=bidir)
    params = init_instruction_encoder(jax.random.PRNGKey(0), cfg)
    toks = rng.integers(1, cfg.vocab_size, (3, 9))
    toks[0, 5:] = 0
    ctx, pad = encode_instruction_rnn(params, cfg,
                                      {"instruction": jnp.asarray(toks)})
    assert ctx.shape == (3, 9, cfg.output_size)
    assert pad.shape == (3, 9)
    # outputs zero past each length; pad mask marks exactly the padding
    assert np.allclose(np.asarray(ctx[0, 5:]), 0)
    np.testing.assert_array_equal(np.asarray(pad), toks == 0)


def test_instruction_encoder_packed_semantics(rng):
    """The padded tail must not affect outputs or final state — the
    pack_padded_sequence contract (instruction_encoder.py:84-86)."""
    cfg = _enc_cfg(final_state_only=True)
    params = init_instruction_encoder(jax.random.PRNGKey(0), cfg)
    toks = rng.integers(1, cfg.vocab_size, (2, 8))
    toks[:, 6:] = 0
    toks2 = toks.copy()
    final1 = encode_instruction_rnn(params, cfg,
                                    {"instruction": jnp.asarray(toks)})
    assert final1.shape == (2, cfg.output_size)
    # same content, shorter buffer -> same final state
    final2 = encode_instruction_rnn(
        params, cfg, {"instruction": jnp.asarray(toks2[:, :6])})
    np.testing.assert_allclose(np.asarray(final1), np.asarray(final2),
                               atol=1e-6)


def test_instruction_encoder_rxr_features(rng):
    cfg = _enc_cfg(sensor_uuid="rxr_instruction")
    params = init_instruction_encoder(jax.random.PRNGKey(0), cfg)
    assert "embedding" not in params      # feature path has no table
    feats = rng.standard_normal((2, 7, cfg.embedding_size)).astype(
        np.float32)
    feats[:, 5:] = 0.0                    # padded tail
    ctx, pad = encode_instruction_rnn(
        params, cfg, {"rxr_instruction": jnp.asarray(feats)})
    assert ctx.shape == (2, 7, cfg.output_size)
    assert np.asarray(pad)[:, 5:].all() and not np.asarray(pad)[:, :5].any()


def test_pretrained_embedding_loading(tmp_path, rng):
    table = rng.standard_normal((40, 8)).astype(np.float32)
    path = tmp_path / "embeddings.json.gz"
    with gzip.open(path, "wt") as f:
        json.dump(table.tolist(), f)
    loaded = load_pretrained_embeddings(str(path))
    np.testing.assert_allclose(np.asarray(loaded), table, atol=1e-6)
    cfg = _enc_cfg()
    params = init_instruction_encoder(jax.random.PRNGKey(0), cfg,
                                      embedding_weights=loaded)
    np.testing.assert_allclose(np.asarray(params["embedding"]), table,
                               atol=1e-6)


def test_instruction_encoder_matches_torch(rng):
    """Bit-level parity with torch GRU/LSTM + pack_padded_sequence:
    weights copied into our cells must reproduce torch's outputs and
    final states on a padded batch (instruction_encoder.py:28-33,84-91
    semantics)."""
    import torch

    cfg = _enc_cfg(rnn_type="LSTM", bidirectional=True)
    E, H = cfg.embedding_size, cfg.hidden_size
    t_rnn = torch.nn.LSTM(E, H, bidirectional=True, batch_first=True)
    params = init_instruction_encoder(jax.random.PRNGKey(0), cfg)

    def load_dir(p, sfx):
        # torch gate order (i,f,g,o) matches our _lstm_cell; torch
        # stores (4H, in) weights and two bias vectors
        wi = t_rnn.state_dict()[f"weight_ih_l0{sfx}"].numpy()
        wh = t_rnn.state_dict()[f"weight_hh_l0{sfx}"].numpy()
        bi = t_rnn.state_dict()[f"bias_ih_l0{sfx}"].numpy()
        bh = t_rnn.state_dict()[f"bias_hh_l0{sfx}"].numpy()
        p["wi"] = {"w": jnp.asarray(wi.T), "b": jnp.asarray(bi + bh)}
        p["wh"] = {"w": jnp.asarray(wh.T),
                   "b": jnp.zeros(4 * H, jnp.float32)}

    load_dir(params["fwd"], "")
    load_dir(params["bwd"], "_reverse")

    toks = rng.integers(1, cfg.vocab_size, (3, 9))
    toks[0, 6:] = 0
    toks[2, 4:] = 0
    lengths = (toks != 0).sum(-1)
    emb = np.asarray(params["embedding"])[toks]

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(emb), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False)
    with torch.no_grad():
        t_out, (t_h, _) = t_rnn(packed)
    t_ctx = torch.nn.utils.rnn.pad_packed_sequence(
        t_out, batch_first=True, total_length=9)[0].numpy()

    ctx, pad = encode_instruction_rnn(params, cfg,
                                      {"instruction": jnp.asarray(toks)})
    np.testing.assert_allclose(np.asarray(ctx), t_ctx, atol=2e-6)

    cfg_f = _enc_cfg(rnn_type="LSTM", bidirectional=True,
                     final_state_only=True)
    final = encode_instruction_rnn(params, cfg_f,
                                   {"instruction": jnp.asarray(toks)})
    t_final = np.concatenate([t_h[0].numpy(), t_h[1].numpy()], -1)
    np.testing.assert_allclose(np.asarray(final), t_final, atol=2e-6)


def test_instruction_encoder_matches_torch_gru(rng):
    """Same parity for GRU (torch gate order r,z,n; torch keeps b_hn
    inside the r-gated term — our _gru_cell reproduces that)."""
    import torch

    cfg = _enc_cfg(rnn_type="GRU", bidirectional=False)
    E, H = cfg.embedding_size, cfg.hidden_size
    t_rnn = torch.nn.GRU(E, H, batch_first=True)
    params = init_instruction_encoder(jax.random.PRNGKey(0), cfg)
    sd = t_rnn.state_dict()
    params["fwd"]["wi"] = {"w": jnp.asarray(sd["weight_ih_l0"].numpy().T),
                           "b": jnp.asarray(sd["bias_ih_l0"].numpy())}
    params["fwd"]["wh"] = {"w": jnp.asarray(sd["weight_hh_l0"].numpy().T),
                           "b": jnp.asarray(sd["bias_hh_l0"].numpy())}

    toks = rng.integers(1, cfg.vocab_size, (2, 7))
    toks[1, 5:] = 0
    lengths = (toks != 0).sum(-1)
    emb = np.asarray(params["embedding"])[toks]
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(emb), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False)
    with torch.no_grad():
        t_out, _ = t_rnn(packed)
    t_ctx = torch.nn.utils.rnn.pad_packed_sequence(
        t_out, batch_first=True, total_length=7)[0].numpy()
    ctx, _ = encode_instruction_rnn(params, cfg,
                                    {"instruction": jnp.asarray(toks)})
    np.testing.assert_allclose(np.asarray(ctx), t_ctx, atol=2e-6)
