"""Tokenizer construction.

Capability target: vlnbert_init.py:4-11 get_tokenizer — bert-base-uncased
for R2R, xlm-roberta-base for RxR, loaded from local `bert_config/` dirs
when present (offline) or from the HF hub name otherwise.
"""

from __future__ import annotations

import os
from typing import Optional


def get_tokenizer(task_type: str = "r2r",
                  bert_config_dir: Optional[str] = "bert_config"):
    from transformers import AutoTokenizer
    name = ("xlm-roberta-base" if task_type == "rxr"
            else "bert-base-uncased")
    local = os.path.join(bert_config_dir or "", name)
    if bert_config_dir and os.path.isdir(local):
        return AutoTokenizer.from_pretrained(local)
    return AutoTokenizer.from_pretrained(name)


def encode_instruction(tokenizer, text: str, max_len: int):
    """Text -> fixed-length id array with the tokenizer's pad id."""
    import numpy as np
    ids = tokenizer(text, truncation=True, max_length=max_len)["input_ids"]
    out = np.full(max_len, tokenizer.pad_token_id, np.int64)
    out[:len(ids)] = ids
    return out
