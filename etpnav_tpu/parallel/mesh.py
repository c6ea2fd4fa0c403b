"""Device mesh + sharding layout (SPMD over ICI).

TPU-native replacement for the reference's NCCL/DDP distribution
(SURVEY.md §2 parallelism table; ss_trainer_ETP.py:151-213,
pretrain_src utils/distributed.py): a single jax.sharding.Mesh with axes

- 'dp' : data parallel — batch sharded, gradients psum'd by XLA
- 'mp' : tensor parallel — attention heads / FFN hidden / vocab table
         sharded; XLA/GSPMD inserts the all-reduces on ICI

DDP => params replicated over 'dp' + batch split; the reference's
all-reduce-in-backward becomes an XLA-inserted psum. Tensor parallelism
(absent in the reference) comes free from the sharding rules below for
larger deployments.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host runtime init — the NCCL rendezvous equivalent
    (pretrain_src utils/distributed.py:66-90 init_method env://;
    ss_trainer_ETP.py:151-157).

    jax.distributed.initialize auto-detects TPU pod / SLURM topology;
    explicit args override. Safe to call in single-process runs: it only
    initializes when a multi-host context is detectable (args given, or
    coordinator/SLURM env vars present). Returns True if a multi-process
    runtime is active afterwards."""
    import os

    # must not touch the backend (jax.process_count/jax.devices) before
    # jax.distributed.initialize — that initializes XLA and the
    # rendezvous then refuses to run. Probe the distributed client state
    # directly instead.
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1
    detectable = (coordinator_address or num_processes
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or os.environ.get("COORDINATOR_ADDRESS")
                  or os.environ.get("SLURM_JOB_NUM_NODES", "1") not in
                  ("", "1")
                  or os.environ.get("TPU_WORKER_HOSTNAMES"))
    if not detectable:
        return False
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)
    return jax.process_count() > 1


def make_mesh(dp: int = -1, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        dp = n // mp
    assert dp * mp == n, f"dp({dp}) * mp({mp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


# ---------------------------------------------------------------------------
# parameter layout
# ---------------------------------------------------------------------------

# path-regex -> PartitionSpec for the weight kernel. Everything else
# (biases of row-sharded layers, LN params) is replicated.
_KERNEL_RULES = [
    # FFN: intermediate column-sharded, output row-sharded
    (re.compile(r"(ffn|visn_ffn|lang_ffn)/intermediate/w$"), P(None, "mp")),
    (re.compile(r"(ffn|visn_ffn|lang_ffn)/output/dense/w$"), P("mp", None)),
    (re.compile(r"linear1/w$"), P(None, "mp")),
    (re.compile(r"linear2/w$"), P("mp", None)),
    # attention: qkv column-sharded (head dim), out row-sharded
    (re.compile(r"attn/[qkv]/w$"), P(None, "mp")),
    (re.compile(r"attn/o/w$"), P("mp", None)),
    (re.compile(r"out/dense/w$"), P("mp", None)),
    # vocab-sharded embedding table (big matmul in the MLM head)
    (re.compile(r"embeddings/word_embeddings$"), P("mp", None)),
    (re.compile(r"mlm_head/bias$"), P("mp",)),
    # column-sharded biases
    (re.compile(r"(ffn|visn_ffn|lang_ffn)/intermediate/b$"), P("mp",)),
    (re.compile(r"linear1/b$"), P("mp",)),
    (re.compile(r"attn/[qkv]/b$"), P("mp",)),
]


def param_spec(path: str, ndim: Optional[int] = None) -> P:
    """Spec for a param; scanned stacks prepend a layer axis, so the rule's
    spec is left-padded with None up to the leaf rank."""
    for rule, spec in _KERNEL_RULES:
        if rule.search(path):
            if ndim is not None and len(spec) < ndim:
                spec = P(*([None] * (ndim - len(spec)) + list(spec)))
            return spec
    return P()


def _path_str(kp) -> str:
    """Key-path -> 'a/b/0/c' — the ONE rendering param_spec rules match
    against (tree_paths and param_shardings must agree on it)."""
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in kp)


def tree_paths(tree) -> list:
    paths = []
    jax.tree_util.tree_map_with_path(
        lambda kp, _: paths.append(_path_str(kp)), tree)
    return paths


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for a param tree using the TP layout rules."""
    def spec_for(kp, leaf):
        return NamedSharding(mesh, param_spec(_path_str(kp),
                                              np.ndim(leaf)))
    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_shardings(mesh: Mesh, batch):
    """Shard the leading (batch) axis of every array over 'dp'."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("dp")), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Lay host param values out on the mesh (TP rules + replication).

    Works across processes too: jax.device_put accepts a global sharding
    when every process holds the same full host value — which params do
    by construction (identical init seed on every process, the SPMD
    analogue of DDP's initial broadcast)."""
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(mesh: Mesh, batch):
    """Shard a batch over 'dp'. Single-process: device_put splits the
    host batch across local devices. Multi-process: each process passes
    its OWN per-process batch (the DistributedSampler semantics of the
    reference, loader.py:127-149) and the global array is their
    concatenation over the dp axis — jax.make_array_from_process_local_data
    builds it without any cross-host data movement."""
    if jax.process_count() > 1:
        def to_global(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("dp")), x)
        return jax.tree_util.tree_map(to_global, batch)
    return jax.device_put(batch, batch_shardings(mesh, batch))


def sync_max(values) -> list:
    """Max of small per-process integer tuples across processes (used to
    agree on the learn-phase (T, G) bucket so every process dispatches
    the same SPMD program — the task-id dist.broadcast analogue,
    loader.py:56-59). Identity on single-process runs."""
    vals = [int(v) for v in values]
    if jax.process_count() == 1:
        return vals
    from jax.experimental import multihost_utils
    arr = multihost_utils.process_allgather(np.asarray(vals, np.int64))
    return [int(v) for v in np.asarray(arr).max(axis=0)]


# ---------------------------------------------------------------------------
# host-side collectives (eval-dict gathers)
# ---------------------------------------------------------------------------

def all_gather_object(obj, axis_name: str = "dp"):
    """Multi-host gather of arbitrary python objects
    (reference all_gather_object, ss_trainer_ETP.py:727-738; pickle
    protocol of pretrain_src utils/distributed.py:91-131). On a
    single-process run this is the identity list.

    Objects are pickled to uint8 and padded to the max length across
    processes before the allgather — each rank's object may have a
    completely different structure (e.g. eval dicts keyed by the rank's
    own episode ids), which rules out gathering the object as a pytree.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([data.size], np.int32))          # (P, 1)
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
            for i in range(gathered.shape[0])]
