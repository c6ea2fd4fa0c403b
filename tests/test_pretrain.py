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
