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


def test_r2r_tokenizer_offline_from_vendored_vocab(monkeypatch):
    """get_tokenizer('r2r') must construct fully offline from the vendored
    vocab.txt (the reference ships bert_config/bert-base-uncased/vocab.txt;
    vlnbert_init.py:4-11 builds the tokenizer from it)."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    tok = tokenization.get_tokenizer("r2r")
    assert tok.pad_token_id == 0
    assert tok.cls_token_id == 101 and tok.sep_token_id == 102


# Canonical bert-base-uncased WordPiece ids for a fixed R2R-style
# instruction. Golden pinned from the vendored vocab (md5 64800d5d…, the
# published artifact): tokenization parity is asserted, not assumed.
R2R_SENT = "Walk past the sofa and stop at the kitchen counter."
R2R_GOLD = [101, 3328, 2627, 1996, 10682, 1998, 2644, 2012, 1996, 3829,
            4675, 1012, 102]


def test_r2r_tokenization_golden(monkeypatch):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    tok = tokenization.get_tokenizer("r2r")
    assert tok(R2R_SENT)["input_ids"] == R2R_GOLD
    out = tokenization.encode_instruction(tok, R2R_SENT, 16)
    assert out.tolist() == R2R_GOLD + [0, 0, 0]
    # truncation keeps the fixed length
    assert len(tokenization.encode_instruction(tok, R2R_SENT, 8)) == 8


def test_r2r_golden_ids_match_vocab_lines():
    """Independent derivation: each uncased whole word's id must equal its
    0-based line index in the vendored vocab.txt (WordPiece id = vocab
    row), so the golden above can't drift from the artifact."""
    path = os.path.join(REPO, "configs", "bert_config",
                        "bert-base-uncased", "vocab.txt")
    with open(path, encoding="utf-8") as f:
        line_of = {w.rstrip("\n"): i for i, w in enumerate(f)}
    assert line_of["[PAD]"] == 0
    assert line_of["[CLS]"] == 101 and line_of["[SEP]"] == 102
    words = ["walk", "past", "the", "sofa", "and", "stop", "at", "the",
             "kitchen", "counter", "."]
    derived = ([line_of["[CLS]"]] + [line_of[w] for w in words]
               + [line_of["[SEP]"]])
    assert derived == R2R_GOLD


def test_missing_tokenizer_artifacts_raise_actionable_error(monkeypatch,
                                                            tmp_path):
    """Offline with no vendored files: a clear RuntimeError naming the
    expected artifact, not a raw hub connection error."""
    import pytest
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    with pytest.raises(RuntimeError, match="sentencepiece"):
        tokenization.get_tokenizer("rxr", bert_config_dir=str(tmp_path))
