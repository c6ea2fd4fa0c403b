"""Pretrain -> finetune warm-start seam (training/warm_start.py).

The reference composes its two training stages via MODEL.pretrained_path
(run_r2r/main.bash) with key surgery at vlnbert_init.py:21-30; these tests
pin the JAX-native equivalent: a PretrainTrainer orbax checkpoint loads
into FinetuneTrainer with the trunk transferred exactly and the
pretrain-only heads dropped.
"""

import dataclasses

import jax
import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.data.pretrain_data import PretrainShapes
from etpnav_tpu.models.planner import init_planner_params
from etpnav_tpu.parallel import mesh as meshlib
from etpnav_tpu.training.pretrain import PretrainTrainer, \
    init_pretrain_params
from etpnav_tpu.training.warm_start import (
    LANG2VISN_KEYS,
    PRETRAIN_ONLY_HEADS,
    pretrain_to_planner,
)

SHAPES = PretrainShapes(
    max_txt_len=16, max_traj_steps=4, num_views=12, max_cands=4,
    max_gmap_len=24, image_feat_size=32, depth_feat_size=16,
    vocab_size=512, mask_token_id=3, mask_vocab_range=(10, 500))


def _tiny_cfg():
    cfg = tiny_config()
    pl = dataclasses.replace(
        cfg.planner, max_txt_len=16, image_feat_size=32, depth_feat_size=16)
    pt = dataclasses.replace(cfg.pretrain, batch_size=8, warmup_steps=2)
    return dataclasses.replace(cfg, planner=pl, pretrain=pt)


def test_surgery_matches_finetune_structure():
    """pretrain_to_planner must yield EXACTLY the finetune planner tree."""
    cfg = _tiny_cfg()
    pre = init_pretrain_params(jax.random.PRNGKey(0), cfg.planner,
                               tasks=("mlm", "sap", "mrc", "og"))
    ft_like = init_planner_params(jax.random.PRNGKey(1), cfg.planner)
    trunk = pretrain_to_planner(pre)
    assert (jax.tree_util.tree_structure(trunk)
            == jax.tree_util.tree_structure(ft_like))
    for head in PRETRAIN_ONLY_HEADS:
        assert head not in trunk
    for k in LANG2VISN_KEYS:
        assert k not in trunk["global_encoder"]["encoder"]
    # transfer is by reference, not re-init: trunk leaves ARE pretrain's
    np.testing.assert_array_equal(
        np.asarray(trunk["embeddings"]["word_embeddings"]),
        np.asarray(pre["embeddings"]["word_embeddings"]))


def test_checkpoint_handoff_end_to_end(tmp_path):
    """PretrainTrainer ckpt -> FinetuneTrainer.load_pretrained -> the
    finetune planner carries the pretrained trunk and training runs."""
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.finetune import FinetuneTrainer

    cfg = _tiny_cfg()
    mesh = meshlib.make_mesh(dp=8, mp=1)
    pre = PretrainTrainer(cfg, SHAPES, mesh=mesh, seed=0, num_scans=2,
                          scan_size=12)
    pre.train_steps(2)
    ckpt = str(tmp_path / "model_step_2")
    pre.save_checkpoint(ckpt)

    envs = GeometricNavEnv(
        num_envs=2, seed=0, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)
    tr = FinetuneTrainer(cfg, envs, seed=1)
    before = np.asarray(tr.params.planner["embeddings"]["word_embeddings"])
    tr.load_pretrained(ckpt)
    got = np.asarray(tr.params.planner["embeddings"]["word_embeddings"])
    want = np.asarray(jax.device_get(
        pre.params["embeddings"]["word_embeddings"]))
    np.testing.assert_allclose(got, want, atol=0, rtol=0)
    assert not np.allclose(got, before)   # it actually replaced the init
    # SAP head transfers too (the reference keeps it, vlnbert_init.py:27)
    np.testing.assert_allclose(
        np.asarray(tr.params.planner["global_sap_head"]["dense2"]["w"]),
        np.asarray(jax.device_get(
            pre.params["global_sap_head"]["dense2"]["w"])), atol=0, rtol=0)
    # optimizer state was re-initialized and training proceeds
    logs = tr.train(1)
    assert np.isfinite(logs["IL_loss"])


def test_dim_mismatch_is_a_hard_error(tmp_path):
    """A pretrain ckpt built from a different PlannerConfig must raise,
    not silently partial-load."""
    from etpnav_tpu.training.warm_start import load_pretrained_planner
    from etpnav_tpu.training.checkpoints import save_checkpoint

    cfg = _tiny_cfg()
    small = dataclasses.replace(cfg.planner, hidden_size=32,
                                intermediate_size=64, num_heads=2)
    pre = init_pretrain_params(jax.random.PRNGKey(0), small)
    ckpt = str(tmp_path / "model_step_1")
    save_checkpoint(ckpt, {"params": pre})
    like = init_planner_params(jax.random.PRNGKey(1), cfg.planner)
    with pytest.raises(ValueError, match="different PlannerConfig"):
        load_pretrained_planner(ckpt, like)
