"""Checkpoint save/load via orbax, plus requeue-style resume.

Capability target: the reference's checkpoint plumbing —
save_checkpoint {state_dict, config, optim_state, iteration}
(ss_trainer_ETP.py:74-83), newest-by-mtime requeue resume (:216-236), and
pretrain ModelSaver (pretrain_src utils/save.py:23-45) — on orbax
PyTreeCheckpointer with fully-addressable JAX pytrees.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any):
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore with `like` as the structure/dtype template."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    template = jax.tree_util.tree_map(np.asarray, jax.device_get(like))
    restored = ckptr.restore(path, item=template)
    return restored


def latest_checkpoint(ckpt_dir: str, pattern: str = "ckpt_iter*"
                      ) -> Optional[str]:
    """Newest checkpoint by iteration number then mtime (requeue resume,
    ss_trainer_ETP.py:216-225)."""
    cands = glob.glob(os.path.join(ckpt_dir, pattern))
    if not cands:
        return None

    def key(p):
        m = re.search(r"(?:iter|step_?)(\d+)", os.path.basename(p))
        return (int(m.group(1)) if m else -1, os.path.getmtime(p))
    return max(cands, key=key)
