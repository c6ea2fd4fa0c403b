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
    """Multi-host discipline: params are replicated (dp shards the
    batch; mp shards within a host), so every process holds the full
    state — process 0 writes, the rest synchronize past the write.
    Racing orbax's tmp-dir+rename from every process corrupts the
    checkpoint; cross-host-sharded (non-addressable) arrays would need
    orbax's multihost path and fail loudly in device_get below."""
    path = os.path.abspath(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        if jax.process_index() == 0:
            ocp.PyTreeCheckpointer().save(path, jax.device_get(state),
                                          force=True)
        multihost_utils.sync_global_devices(f"ckpt:{os.path.basename(path)}")
        return
    ocp.PyTreeCheckpointer().save(path, jax.device_get(state), force=True)


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
    cands = [p for p in glob.glob(os.path.join(ckpt_dir, pattern))
             # a preempted save leaves '<name>.orbax-checkpoint-tmp-*'
             # beside completed checkpoints; resuming from one loads a
             # partial tree — exactly the requeue scenario this exists for
             if ".orbax-checkpoint-tmp" not in os.path.basename(p)]
    if not cands:
        return None

    def key(p):
        m = re.search(r"(?:iter|step_?)(\d+)", os.path.basename(p))
        return (int(m.group(1)) if m else -1, os.path.getmtime(p))
    return max(cands, key=key)
