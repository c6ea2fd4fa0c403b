"""Tokenizer construction.

Capability target: vlnbert_init.py:4-11 get_tokenizer — bert-base-uncased
for R2R, xlm-roberta-base for RxR, loaded from local `bert_config/` dirs
when present (offline) or from the HF hub name otherwise.
"""

from __future__ import annotations

import os
from typing import Optional


def _default_config_dirs():
    """cwd `bert_config/` (the reference's repo-root layout) first, then
    the vendored `configs/bert_config/` next to this package."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return ["bert_config", os.path.join(repo, "configs", "bert_config")]


def get_tokenizer(task_type: str = "r2r",
                  bert_config_dir: Optional[str] = "bert_config"):
    from transformers import AutoTokenizer
    name = ("xlm-roberta-base" if task_type == "rxr"
            else "bert-base-uncased")
    dirs = ([bert_config_dir] if bert_config_dir not in (None, "bert_config")
            else _default_config_dirs())
    for d in dirs:
        local = os.path.join(d, name)
        # A config dir only makes a usable tokenizer if the vocab files
        # are present; config.json alone falls through to the hub name.
        if os.path.isdir(local) and any(
                os.path.exists(os.path.join(local, f))
                for f in ("vocab.txt", "sentencepiece.bpe.model",
                          "tokenizer.json")):
            return AutoTokenizer.from_pretrained(local)
    try:
        return AutoTokenizer.from_pretrained(name)
    except OSError as e:
        raise RuntimeError(
            f"No vendored tokenizer files for '{name}' under any of {dirs} "
            "and the HF hub is unreachable. Place vocab.txt (bert) or "
            "sentencepiece.bpe.model / tokenizer.json (xlm-roberta) in "
            f"<bert_config_dir>/{name}/ to run offline.") from e


def encode_instruction(tokenizer, text: str, max_len: int):
    """Text -> fixed-length id array with the tokenizer's pad id."""
    import numpy as np
    ids = tokenizer(text, truncation=True, max_length=max_len)["input_ids"]
    out = np.full(max_len, tokenizer.pad_token_id, np.int64)
    out[:len(ids)] = ids
    return out
