"""CLI entry, YAML config, episode datasets, obs transforms."""

import dataclasses
import gzip
import json

import jax.numpy as jnp
import numpy as np
import pytest

from etpnav_tpu.config_yaml import config_from_dict, load_config, \
    parse_cli_opts
from etpnav_tpu.data.episodes import (
    load_gt_paths,
    load_r2r_episodes,
    load_rxr_episodes,
    shard_episodes_by_scene,
)
from etpnav_tpu.ops.image import apply_obs_transforms, center_crop_batch, \
    resize_batch


def test_config_from_dict_and_overrides(tmp_path):
    y = tmp_path / "exp.yaml"
    y.write_text(
        "BASE: r2r\nIL: {lr: 2.0e-5, iters: 10}\nMESH: {mp: 2}\n")
    cfg = load_config(str(y), parse_cli_opts(["IL.iters=5",
                                              "PLANNER.max_txt_len=64"]))
    assert cfg.il.lr == 2e-5
    assert cfg.il.iters == 5
    assert cfg.mesh.mp == 2
    assert cfg.planner.max_txt_len == 64


def test_eval_inference_sections_parse():
    cfg = config_from_dict({
        "BASE": "tiny",
        "EVAL": {"split": "val_seen", "fast_eval": True,
                 "episode_count": 50},
        "INFERENCE": {"sample": True, "format": "rxr",
                      "predictions_file": "out.jsonl"},
        "PRETRAINED_PATH": "/tmp/model_step_82500.pt",
        "NUM_ENVIRONMENTS": 4,
    })
    assert cfg.eval.split == "val_seen" and cfg.eval.fast_eval
    assert cfg.eval.episode_count == 50
    assert cfg.inference.sample and cfg.inference.format == "rxr"
    assert cfg.pretrained_path.endswith(".pt")
    assert cfg.num_environments == 4


def test_reference_yaml_key_parity():
    """Every key of the reference's run_r2r/iter_train.yaml has a home in
    the config tree (SURVEY.md §2 row 2). Maps reference key -> (section
    attr path). GPU-topology keys map onto the mesh."""
    from etpnav_tpu.config import r2r_config
    cfg = r2r_config()
    mapping = {
        "TRAINER_NAME": "task_type",             # registry name analogue
        "GPU_NUMBERS": "mesh.dp",
        "NUM_ENVIRONMENTS": "num_environments",
        "TENSORBOARD_DIR": "tensorboard_dir",
        "CHECKPOINT_FOLDER": "checkpoint_folder",
        "RESULTS_DIR": "results_dir",
        "VIDEO_DIR": "video_dir",
        "INFERENCE.SPLIT": "inference.split",
        "INFERENCE.SAMPLE": "inference.sample",
        "INFERENCE.CKPT_PATH": "inference.ckpt_path",
        "INFERENCE.PREDICTIONS_FILE": "inference.predictions_file",
        "INFERENCE.FORMAT": "inference.format",
        "INFERENCE.EPISODE_COUNT": "inference.episode_count",
        "INFERENCE.USE_CKPT_CONFIG": "inference.use_ckpt_config",
        "EVAL.SPLIT": "eval.split",
        "EVAL.EPISODE_COUNT": "eval.episode_count",
        "EVAL.CKPT_PATH_DIR": "eval.ckpt_path_dir",
        "EVAL.fast_eval": "eval.fast_eval",
        "EVAL.USE_CKPT_CONFIG": "eval.use_ckpt_config",
        "IL.iters": "il.iters",
        "IL.log_every": "il.log_every",
        "IL.lr": "il.lr",
        "IL.batch_size": "il.batch_size",
        "IL.ml_weight": "il.ml_weight",
        "IL.expert_policy": "il.expert_policy",
        "IL.sample_ratio": "il.sample_ratio",
        "IL.decay_interval": "il.decay_interval",
        "IL.max_traj_len": "il.max_traj_len",
        "IL.max_text_len": "il.max_text_len",
        "IL.loc_noise": "il.loc_noise",
        "IL.waypoint_aug": "il.waypoint_aug",
        "IL.ghost_aug": "il.ghost_aug",
        "IL.back_algo": "il.back_algo",
        "IL.tryout": "il.tryout",
        "MODEL.task_type": "task_type",
        "MODEL.NUM_ANGLES": "waypoint.num_images",
        "MODEL.pretrained_path": "pretrained_path",
        "MODEL.fix_lang_embedding": "il.fix_lang_embedding",
        "MODEL.fix_pano_embedding": "il.fix_pano_embedding",
        "MODEL.use_depth_embedding": "planner.use_depth_embedding",
        "MODEL.use_sprels": "planner.graph_sprels",
        "MODEL.merge_ghost": "graph.merge_ghost",
        "MODEL.consume_ghost": "graph.consume_ghost",
        "MODEL.RGB_ENCODER.output_size": "planner.image_feat_size",
        "MODEL.DEPTH_ENCODER.output_size": "depth.output_size",
        "MODEL.VISUAL_DIM.vis_hidden": "planner.hidden_size",
    }
    for ref_key, path in mapping.items():
        obj = cfg
        for part in path.split("."):
            assert hasattr(obj, part), (ref_key, path)
            obj = getattr(obj, part)


def test_pretrain_cli_ignores_pretrained_path(tmp_path):
    """PRETRAINED_PATH only applies to the finetune trainer; the pretrain
    CLI path must not crash on it (regression: the old hasattr(params)
    guard matched PretrainTrainer's dict params)."""
    from etpnav_tpu.run import run
    y = tmp_path / "pt.yaml"
    y.write_text(
        "BASE: tiny\nPRETRAINED_PATH: /nonexistent/model.pt\n"
        "PRETRAIN: {num_train_steps: 0, batch_size: 2}\n"
        f"CHECKPOINT_FOLDER: {tmp_path}/ck\n")
    logs = run(["--exp-config", str(y), "--trainer", "Pretrain",
                "--run-type", "train"])
    assert logs == {}


def test_config_rejects_unknown_keys():
    with pytest.raises(KeyError):
        config_from_dict({"IL": {"nonexistent_key": 1}})
    with pytest.raises(KeyError):
        config_from_dict({"NOT_A_SECTION": {}})


def test_rxr_preset_differs():
    cfg = config_from_dict({"BASE": "rxr"})
    assert cfg.planner.vocab_size == 250002
    assert cfg.planner.pad_token_id == 1
    assert cfg.il.expert_policy == "ndtw"


def _write_gz(path, payload):
    with gzip.open(path, "wt") as f:
        json.dump(payload, f)


def test_r2r_episode_loading(tmp_path):
    eps = {"episodes": [
        {"episode_id": i, "scene_id": f"scene{i % 2}",
         "start_position": [0, 0, 0],
         "start_rotation": [0, 0, 0, 1],
         "goals": [{"position": [1, 0, 1]}],
         "instruction": {"instruction_text": "go",
                         "instruction_tokens": [5, 6, 7]},
         "reference_path": [[0, 0, 0], [1, 0, 1]]}
        for i in range(4)]}
    p = tmp_path / "train.json.gz"
    _write_gz(p, eps)
    out = load_r2r_episodes(str(p), max_instr_len=8)
    assert len(out) == 4
    assert out[0].instruction_tokens.tolist() == [5, 6, 7, 0, 0, 0, 0, 0]
    out2 = load_r2r_episodes(str(p), episodes_allowed=["1", "3"])
    assert [e.episode_id for e in out2] == ["1", "3"]
    shards = shard_episodes_by_scene(out, 2)
    assert len(shards) == 2
    assert {e.scene_id for e in shards[0]}.isdisjoint(
        {e.scene_id for e in shards[1]})


def test_rxr_episode_loading(tmp_path):
    eps = {"episodes": [
        {"episode_id": 7, "scene_id": "s",
         "start_position": [0, 0, 0], "start_rotation": [0, 0, 0, 1],
         "goals": [{"position": [1, 0, 1]}],
         "instruction": {"instruction_text": "va", "language": "es-ES",
                         "instruction_id": "42",
                         "instruction_tokens": [9, 9]},
         "reference_path": []}]}
    p = tmp_path / "val_guide.json.gz"
    _write_gz(p, eps)
    out = load_rxr_episodes(str(p), languages=("es",), max_instr_len=4)
    assert len(out) == 1 and out[0].instruction_id == 42
    assert out[0].instruction_tokens.tolist() == [9, 9, 1, 1]
    assert load_rxr_episodes(str(p), languages=("en",)) == []


def test_rxr_roles_select_files(tmp_path):
    """Roles select FILES like the reference (task.py:172-190: one
    {split}_{role}.json.gz per role); '*' loads every annotation role."""
    def ep(i):
        return {"episode_id": i, "scene_id": "s",
                "start_position": [0, 0, 0],
                "start_rotation": [0, 0, 0, 1],
                "goals": [{"position": [1, 0, 1]}],
                "instruction": {"instruction_text": "x", "language": "en",
                                "instruction_id": str(i),
                                "instruction_tokens": [4]},
                "reference_path": []}
    _write_gz(tmp_path / "val_guide.json.gz", {"episodes": [ep(1)]})
    _write_gz(tmp_path / "val_follower.json.gz",
              {"episodes": [ep(2), ep(3)]})
    tpl = str(tmp_path / "val_{role}.json.gz")
    assert len(load_rxr_episodes(tpl, roles=("guide",))) == 1
    assert len(load_rxr_episodes(tpl, roles=("follower",))) == 2
    both = load_rxr_episodes(tpl, roles=("*",))
    assert sorted(e.episode_id for e in both) == ["1", "2", "3"]
    import pytest
    with pytest.raises(ValueError, match="unknown RxR roles"):
        load_rxr_episodes(tpl, roles=("pilot",))


def test_latest_checkpoint_skips_orbax_tmp(tmp_path):
    """A preempted save's '.orbax-checkpoint-tmp-*' dir must not win the
    requeue resume over the last completed checkpoint."""
    from etpnav_tpu.training.checkpoints import latest_checkpoint
    (tmp_path / "ckpt_iter90").mkdir()
    (tmp_path / "ckpt_iter100.orbax-checkpoint-tmp-123").mkdir()
    got = latest_checkpoint(str(tmp_path))
    assert got is not None and got.endswith("ckpt_iter90")


def test_gt_paths(tmp_path):
    p = tmp_path / "gt.json.gz"
    _write_gz(p, {"3": {"locations": [[0, 0, 0], [1, 1, 1]]}})
    gt = load_gt_paths(str(p))
    assert gt["3"].shape == (2, 3)


def test_obs_transforms():
    rgb = jnp.zeros((2, 3, 256, 341, 3), jnp.uint8)
    dep = jnp.zeros((2, 3, 256, 256, 1), jnp.float32)
    out = apply_obs_transforms({"rgb": rgb, "depth": dep})
    assert out["rgb"].shape == (2, 3, 224, 224, 3)
    assert out["rgb"].dtype == jnp.uint8
    assert out["depth"].shape == (2, 3, 128, 128, 1)
    # identity when already sized
    same = apply_obs_transforms(out)
    assert same["rgb"] is out["rgb"]


def test_resize_and_crop_values():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    up = resize_batch(img, (8, 8))
    assert up.shape == (1, 8, 8, 1)
    crop = center_crop_batch(up, (4, 4))
    assert crop.shape == (1, 4, 4, 1)


def test_cli_train_tiny(tmp_path, monkeypatch):
    from etpnav_tpu import run as run_mod
    y = tmp_path / "exp.yaml"
    y.write_text("BASE: tiny\nIL: {iters: 1}\n")
    logs = run_mod.run([
        "--exp-config", str(y), "--run-type", "train",
        "--num-envs", "2", "--ckpt-dir", str(tmp_path / "ck")])
    assert "IL_loss" in logs
    import glob
    assert glob.glob(str(tmp_path / "ck" / "ckpt_iter*"))


def test_panorama_to_equirect():
    from etpnav_tpu.ops.image import panorama_to_equirect
    views = jnp.asarray(
        np.arange(12 * 8 * 8 * 1).reshape(12, 8, 8, 1) % 255, jnp.uint8)
    eq = panorama_to_equirect(views, (16, 48))
    assert eq.shape == (16, 48, 1)
    batched = panorama_to_equirect(jnp.stack([views, views]), (8, 24))
    assert batched.shape == (2, 8, 24, 1)


def test_serving_config_nav_fp32():
    """run.py serve runs the nav stack fp32 unless PLANNER.nav_use_bf16
    is set explicitly (tools/exp_nav_bisect.py adoption)."""
    import dataclasses

    from etpnav_tpu.config import tiny_config
    from etpnav_tpu.run import serving_config

    cfg = tiny_config()
    assert cfg.planner.nav_use_bf16 is None
    assert serving_config(cfg).planner.nav_use_bf16 is False
    forced = dataclasses.replace(
        cfg, planner=dataclasses.replace(cfg.planner, nav_use_bf16=True))
    assert serving_config(forced).planner.nav_use_bf16 is True
