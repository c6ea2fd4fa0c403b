"""RxR-CE task variant: xlm-r-style padding (pad id 1), ndtw expert,
jsonl submission format, type_vocab_size=2."""

import dataclasses
import json

import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.training.finetune import FinetuneTrainer


@pytest.fixture(scope="module")
def rxr_trainer():
    cfg = tiny_config()
    pl = dataclasses.replace(cfg.planner, pad_token_id=1)
    il = dataclasses.replace(cfg.il, expert_policy="ndtw")
    cfg = dataclasses.replace(cfg, task_type="rxr", planner=pl, il=il)
    envs = GeometricNavEnv(
        num_envs=2, seed=21, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=1)
    return FinetuneTrainer(cfg, envs, seed=0)


def test_rxr_train_iter(rxr_trainer):
    logs = rxr_trainer.train(iters=1)
    assert np.isfinite(logs["IL_loss"])


def test_rxr_jsonl_submission(rxr_trainer, tmp_path):
    out = tmp_path / "preds.jsonl"
    rxr_trainer.inference(2, str(out), fmt="rxr")
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) >= 2
    assert all("instruction_id" in l and "path" in l for l in lines)
    # sorted by instruction id (ss_trainer_ETP.py:753)
    ids = [l["instruction_id"] for l in lines]
    assert ids == sorted(ids)
