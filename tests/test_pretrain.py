"""Pretraining pipeline tests: data shapes/semantics, SPMD train steps on
the virtual 8-device mesh (dp=4 x mp=2), loss decrease."""

import dataclasses

import jax
import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.data.pretrain_data import (
    MetaSampler,
    PretrainSampler,
    PretrainShapes,
)
from etpnav_tpu.parallel import mesh as meshlib
from etpnav_tpu.training.pretrain import PretrainTrainer

SHAPES = PretrainShapes(
    max_txt_len=16, max_traj_steps=4, num_views=12, max_cands=4,
    max_gmap_len=24, image_feat_size=32, depth_feat_size=16,
    vocab_size=512, mask_token_id=3, mask_vocab_range=(10, 500))


def _tiny_cfg():
    cfg = tiny_config()
    pl = dataclasses.replace(
        cfg.planner, max_txt_len=16, image_feat_size=32, depth_feat_size=16)
    pt = dataclasses.replace(cfg.pretrain, batch_size=8, warmup_steps=2,
                             num_train_steps=50, learning_rate=5e-4)
    return dataclasses.replace(cfg, planner=pl, pretrain=pt)


def test_sampler_batch_shapes_and_semantics():
    s = PretrainSampler(SHAPES, seed=0, num_scans=2, scan_size=12)
    b = s.sample_batch(3, "sap")
    T, P, G = SHAPES.max_traj_steps, SHAPES.tokens_per_step, \
        SHAPES.max_gmap_len
    assert b["vp_img"].shape == (3, T, P, 32)
    assert b["agg_w"].shape == (3, G, T * P)
    assert b["gmap_pair"].shape == (3, G, G)
    # aggregation rows of valid non-stop slots sum to 1
    for i in range(3):
        sums = b["agg_w"][i].sum(-1)
        valid = b["gmap_mask"][i]
        np.testing.assert_allclose(sums[valid][1:], 1.0, atol=1e-5)
        assert sums[0] == 0
    # labels: 0 (stop) or an unvisited slot or -100
    for i in range(3):
        lab = int(b["global_act_labels"][i])
        assert lab == -100 or lab == 0 or (
            b["gmap_mask"][i][lab] and not b["gmap_visited"][i][lab])
    # visited nodes have step ids 1..T
    assert (b["gmap_step_ids"][b["gmap_visited"]] >= 1).all()


def test_mlm_masking():
    s = PretrainSampler(SHAPES, seed=1, num_scans=2, scan_size=12)
    b = s.sample_batch(4, "mlm")
    labels = b["txt_labels"]
    assert (labels >= 0).any()
    # masked positions only at real-token positions
    assert not (labels[~b["txt_masks"]] >= 0).any()
    # at masked positions, ids are [MASK], random, or original
    picked = labels >= 0
    frac = picked[b["txt_masks"]].mean()
    assert 0.01 < frac < 0.6


def test_meta_sampler_mixes_tasks():
    s = PretrainSampler(SHAPES, seed=2, num_scans=2, scan_size=12)
    meta = iter(MetaSampler(s, 2, (1.0, 1.0), seed=0))
    tasks = [next(meta)[0] for _ in range(12)]
    assert "mlm" in tasks and "sap" in tasks


def test_param_sharding_specs():
    cfg = _tiny_cfg()
    mesh = meshlib.make_mesh(dp=4, mp=2)
    from etpnav_tpu.training.pretrain import init_pretrain_params
    params = init_pretrain_params(jax.random.PRNGKey(0), cfg.planner)
    shardings = meshlib.param_shardings(mesh, params)
    # FFN intermediate kernel is column-sharded over mp (stacked: axis 2)
    s = shardings["lang_encoder"]["ffn"]["intermediate"]["w"]
    assert s.spec == jax.sharding.PartitionSpec(None, None, "mp")
    # word embeddings vocab-sharded
    s = shardings["embeddings"]["word_embeddings"]
    assert s.spec == jax.sharding.PartitionSpec("mp", None)
    # LN replicated
    s = shardings["embeddings"]["ln"]["scale"]
    assert s.spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_pretrain_steps_on_mesh(dp, mp):
    cfg = _tiny_cfg()
    mesh = meshlib.make_mesh(dp=dp, mp=mp)
    tr = PretrainTrainer(cfg, SHAPES, mesh=mesh, seed=0, num_scans=2,
                         scan_size=12)
    logs = tr.train_steps(4)
    assert any(np.isfinite(v) for v in logs.values())
    acc = tr.validate(n_batches=1)
    assert 0.0 <= acc["mlm_acc"] <= 1.0
    assert 0.0 <= acc["sap_acc"] <= 1.0


def test_pretrain_loss_decreases():
    cfg = _tiny_cfg()
    mesh = meshlib.make_mesh(dp=8, mp=1)
    tr = PretrainTrainer(cfg, SHAPES, mesh=mesh, seed=0, num_scans=1,
                         scan_size=10)
    # train only sap for a clean signal
    first = last = None
    for i in range(30):
        batch = tr.sampler.sample_batch(cfg.pretrain.batch_size, "sap")
        tr.rng, sub = jax.random.split(tr.rng)
        from etpnav_tpu.training.pretrain import pretrain_step
        tr.params, tr.opt_state, loss = pretrain_step(
            tr.params, tr.opt_state, cfg.planner, tr.tx, "sap",
            tr._put(batch), sub)
        if i < 5:
            first = float(loss) if first is None else first
        last = float(loss)
    assert last < first, (first, last)


MRC_OG_SHAPES = dataclasses.replace(SHAPES, image_prob_size=24, num_objs=3)


def _mrc_og_cfg():
    cfg = _tiny_cfg()
    pl = dataclasses.replace(cfg.planner, num_nav_types=3, obj_feat_size=32)
    pt = dataclasses.replace(cfg.pretrain,
                             tasks=("mlm", "sap", "mrc", "og"),
                             task_ratios=(1.0, 1.0, 1.0, 1.0),
                             image_prob_size=24)
    return dataclasses.replace(cfg, planner=pl, pretrain=pt)


def test_mrc_batch_semantics():
    s = PretrainSampler(MRC_OG_SHAPES, seed=5, num_scans=2, scan_size=12)
    b = s.sample_batch(4, "mrc")
    P = MRC_OG_SHAPES.tokens_per_step
    assert b["vp_view_mrc_masks"].shape == (4, P)
    assert b["vp_view_probs"].shape == (4, P, 24)
    for i in range(4):
        t = int(b["last_step"][i])
        m = b["vp_view_mrc_masks"][i]
        assert m.any()                       # at least one masked token
        # masked tokens are valid view tokens of the final step (no objs)
        assert b["vp_mask"][i, t][m].all()
        assert (b["vp_nav"][i, t][m] != 2).all()
        # their image features were zeroed
        np.testing.assert_array_equal(b["vp_img"][i, t][m], 0.0)
        # soft labels are distributions on view tokens
        is_view = b["vp_view_probs"][i].sum(-1) > 0
        np.testing.assert_allclose(
            b["vp_view_probs"][i][is_view].sum(-1), 1.0, atol=1e-5)


def test_og_batch_semantics_and_forward():
    import jax.numpy as jnp
    from etpnav_tpu.training.pretrain import forward_og, init_pretrain_params
    s = PretrainSampler(MRC_OG_SHAPES, seed=6, num_scans=2, scan_size=12)
    b = s.sample_batch(3, "og")
    base = 1 + MRC_OG_SHAPES.num_view_tokens
    assert ((b["obj_labels"] >= base)
            & (b["obj_labels"] < base + MRC_OG_SHAPES.num_objs)).all()
    cfg = _mrc_og_cfg()
    params = init_pretrain_params(jax.random.PRNGKey(0), cfg.planner,
                                  cfg.pretrain.tasks,
                                  cfg.pretrain.image_prob_size)
    logits = np.asarray(forward_og(params, cfg.planner, b))
    # only object slots are scoreable
    finite = np.isfinite(logits)
    assert finite[:, base:base + MRC_OG_SHAPES.num_objs].all()
    assert not finite[:, :base].any()


def test_mrc_og_train_steps():
    from etpnav_tpu.training.pretrain import pretrain_step
    cfg = _mrc_og_cfg()
    mesh = meshlib.make_mesh(dp=8, mp=1)
    tr = PretrainTrainer(cfg, MRC_OG_SHAPES, mesh=mesh, seed=0,
                         num_scans=2, scan_size=12)
    for task in ("mrc", "og"):
        batch = tr.sampler.sample_batch(cfg.pretrain.batch_size, task)
        tr.rng, sub = jax.random.split(tr.rng)
        tr.params, tr.opt_state, loss = pretrain_step(
            tr.params, tr.opt_state, cfg.planner, tr.tx, task,
            tr._put(batch), sub)
        assert np.isfinite(float(loss)), task


def test_optimizer_families_and_lookahead():
    import jax.numpy as jnp
    import optax
    from etpnav_tpu.training.pretrain import (lookahead, make_optimizer,
                                              noam_schedule)
    # noam: ramps to lr at warmup then decays as sqrt(warmup/step)
    lr = float(noam_schedule(100, 1e-3, 100))
    assert lr == pytest.approx(1e-3)
    assert float(noam_schedule(400, 1e-3, 100)) == pytest.approx(5e-4)
    # every family builds and takes an update
    for o in ("adam", "adamax", "adamw", "radam", "ralamb", "rangerlars"):
        cfg = _tiny_cfg()
        cfg = dataclasses.replace(
            cfg, pretrain=dataclasses.replace(cfg.pretrain, optim=o))
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones((4, 4)), "ln": {"scale": jnp.ones(4)}}
        state = tx.init(params)
        u, state = tx.update(jax.tree_util.tree_map(jnp.ones_like, params),
                             state, params)
        assert np.isfinite(np.asarray(u["w"])).all(), o
    # lookahead: slow weights pull fast back every k steps
    base = optax.sgd(1.0)
    tx = lookahead(base, alpha=0.5, k=2)
    p = {"w": jnp.zeros(())}
    st = tx.init(p)
    g = {"w": jnp.ones(())}
    u1, st = tx.update(g, st, p)            # fast: -1
    p1 = optax.apply_updates(p, u1)
    assert float(p1["w"]) == -1.0
    u2, st = tx.update(g, st, p1)           # fast: -2, sync -> slow=-1
    p2 = optax.apply_updates(p1, u2)
    assert float(p2["w"]) == -1.0           # pulled halfway back to slow=0


def test_pretrain_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = _tiny_cfg()
    mesh = meshlib.make_mesh(dp=8, mp=1)
    tr = PretrainTrainer(cfg, SHAPES, mesh=mesh, seed=0, num_scans=2,
                         scan_size=12)
    tr.train_steps(2)
    tr.save_checkpoint(str(tmp_path / "model_step_2"))
    before = np.asarray(jax.device_get(
        tr.params["global_sap_head"]["dense2"]["w"]))
    tr.train_steps(1)                       # params move on
    tr2 = PretrainTrainer(cfg, SHAPES, mesh=mesh, seed=7, num_scans=2,
                          scan_size=12)
    assert tr2.resume_latest(str(tmp_path))
    assert tr2.step == 2
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(
            tr2.params["global_sap_head"]["dense2"]["w"])), before)
    tr2.train_steps(1)                      # training continues


def test_tensor_parallel_equivalence():
    """The mp-sharded layout must compute the same loss as unsharded:
    GSPMD partitioning may not change the math (up to fp reduction
    order)."""
    cfg = _tiny_cfg()
    from etpnav_tpu.training.pretrain import (init_pretrain_params,
                                              make_optimizer, pretrain_step)
    # snapshot to host numpy: pretrain_step donates its inputs, and
    # device_put may alias the source buffer, so each mesh config gets a
    # fresh copy
    base_params = jax.tree_util.tree_map(
        lambda x: np.array(x),
        init_pretrain_params(jax.random.PRNGKey(0), cfg.planner))
    sampler = PretrainSampler(SHAPES, seed=3, num_scans=2, scan_size=12)
    batch = sampler.sample_batch(8, "sap")
    rng = jax.random.PRNGKey(9)

    losses = {}
    for dp, mp in ((8, 1), (4, 2), (2, 4)):
        mesh = meshlib.make_mesh(dp=dp, mp=mp)
        params = meshlib.shard_params(mesh, base_params)
        tx = make_optimizer(cfg)
        opt = tx.init(params)
        _, _, loss = pretrain_step(params, opt, cfg.planner, tx, "sap",
                                   meshlib.shard_batch(mesh, batch), rng)
        losses[(dp, mp)] = float(loss)
    ref = losses[(8, 1)]
    for k, v in losses.items():
        assert v == pytest.approx(ref, rel=2e-4), (k, losses)
