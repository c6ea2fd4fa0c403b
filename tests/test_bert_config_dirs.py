"""The vendored configs/bert_config dirs (reference repo-root bert_config/,
selected at vlnbert_init.py:32-35) must agree with the constants mirrored
in etpnav_tpu.config, or offline-config users and our dataclasses drift."""

import json
import os

from etpnav_tpu import config as cfg_mod
from etpnav_tpu.data import tokenization

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, "configs", "bert_config", name, "config.json")
    with open(path) as f:
        return json.load(f)


def test_bert_base_config_matches_dataclass():
    c = _load("bert-base-uncased")
    p = cfg_mod.PlannerConfig()
    assert c["vocab_size"] == p.vocab_size
    assert c["hidden_size"] == p.hidden_size
    assert c["num_attention_heads"] == p.num_heads
    assert c["layer_norm_eps"] == p.lang_layer_norm_eps
    assert c["pad_token_id"] == p.pad_token_id
    assert c["type_vocab_size"] == p.type_vocab_size


def test_xlmr_config_matches_rxr_planner():
    c = _load("xlm-roberta-base")
    p = cfg_mod.rxr_config().planner
    assert c["vocab_size"] == p.vocab_size
    assert c["layer_norm_eps"] == p.lang_layer_norm_eps
    assert c["pad_token_id"] == p.pad_token_id
    # vlnbert_init.py:34-39 overrides type_vocab_size to 2 for RxR, so the
    # dataclass deliberately diverges from the stock XLM-R config here.
    assert c["type_vocab_size"] == 1 and p.type_vocab_size == 2


def test_default_config_dirs_resolve():
    dirs = tokenization._default_config_dirs()
    vendored = dirs[-1]
    assert os.path.isdir(os.path.join(vendored, "bert-base-uncased"))
    assert os.path.isdir(os.path.join(vendored, "xlm-roberta-base"))
