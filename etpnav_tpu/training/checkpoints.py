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


def _is_key(x) -> bool:
    """True for typed PRNG-key arrays (jax.random.key), which orbax/numpy
    cannot serialize directly."""
    try:
        return jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
    except (AttributeError, TypeError):
        return False


def _unkey(tree: Any) -> Any:
    """Typed key leaves -> raw uint32 key data (serializable)."""
    return jax.tree_util.tree_map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree)


# key-data trailing dim -> PRNG impl, for restoring checkpoints written
# under a different ILConfig.rng_impl than the current run's template
_KEY_WIDTH_IMPL = {2: "threefry2x32", 4: "rbg"}


def _wrap_key(like_leaf, data):
    data = jax.numpy.asarray(data)
    impl = jax.random.key_impl(like_leaf)
    try:
        return jax.random.wrap_key_data(data, impl=impl)
    except (ValueError, TypeError):
        # checkpoint was saved under a different rng_impl (e.g. threefry
        # (2,)-uint32 data restored into an rbg (4,) template). Wrap with
        # the impl the *data* belongs to — the restored key keeps its
        # original stream; callers fold_in per-iteration so mixing impls
        # across a resume is well-defined.
        inferred = _KEY_WIDTH_IMPL.get(int(data.shape[-1]) if data.ndim else 0)
        if inferred is None:
            raise
        import logging
        logging.getLogger(__name__).warning(
            "checkpoint rng key data has trailing dim %d incompatible with "
            "template impl %s; restoring as %s (rng stream preserved under "
            "its original impl)", data.shape[-1], impl, inferred)
        return jax.random.wrap_key_data(data, impl=inferred)


def _rekey(like: Any, restored: Any) -> Any:
    """Re-wrap restored key data as typed keys, preserving each leaf's
    PRNG implementation from the template (ILConfig.rng_impl); falls back
    to the impl inferred from the stored data's width when the template's
    impl changed across the save/restore boundary."""
    return jax.tree_util.tree_map(
        lambda l, r: _wrap_key(l, r) if _is_key(l) else r,
        like, restored)


def save_checkpoint(path: str, state: Any):
    """Multi-host discipline: params are replicated (dp shards the
    batch; mp shards within a host), so every process holds the full
    state after device_get. EVERY process must call orbax save — its
    Checkpointer runs internal cross-process barriers
    (sync_global_processes('Checkpointer:save_start'/finalize)) and
    gates directory create/commit on the primary host itself; a manual
    rank-0-only call deadlocks/mismatches those barriers (verified with
    a 2-process repro on orbax 0.11.32)."""
    path = os.path.abspath(path)
    state = _unkey(state)
    ocp.PyTreeCheckpointer().save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore with `like` as the structure/dtype template."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    template = jax.tree_util.tree_map(
        np.asarray, jax.device_get(_unkey(like)))
    restored = ckptr.restore(path, item=template)
    return _rekey(like, restored)


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
