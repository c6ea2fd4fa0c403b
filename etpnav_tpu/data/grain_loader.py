"""Multi-host pretraining input: ArrayRecord shards + grain pipeline.

Capability target: the reference's loader stack
(pretrain_src/pretrain_src/data/loader.py:18-164) — MetaLoader multinomial
task mixing synchronized via dist.broadcast (:54-60), DistributedSampler
rank sharding (:127-163), PrefetchLoader H2D overlap (:90-124) — re-homed
for TPU pods:

- records live in ArrayRecord files (random-access, cheap to shard);
- `grain.DataLoader` + `IndexSampler(shard_options=ShardByJaxProcess)`
  replaces DistributedSampler: every host reads a disjoint slice;
- grain `worker_count` processes replace torch DataLoader workers;
- task-mix synchronization needs no collective: `GrainMetaLoader` draws
  tasks from a shared-seed RNG so every host picks the same task per step
  (the TPU-native replacement for the broadcast at loader.py:56-59);
- one record set is written **per task** because the reference's task
  datasets sample different end-viewpoint mixtures at __getitem__ time
  (tasks.py:163,286-293,378); per-record randomness that must differ per
  epoch (MLM token masking, MRC view masking) stays in grain
  RandomMapTransforms applied at load time.

Records are np.savez-encoded dicts of the fixed-shape arrays produced by
PretrainSampler._assemble, so a loaded+batched element is exactly a
`sample_batch` batch.
"""

from __future__ import annotations

import io
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import grain.python as gp

from etpnav_tpu.data.pretrain_data import (
    PretrainSampler,
    PretrainShapes,
    mask_tokens,
    mrc_token_info,
    og_slot_label,
    sample_mrc_mask,
)


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------

def encode_record(sample: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **sample)
    return buf.getvalue()


def decode_record(data: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(data)) as z:
        return {k: z[k] for k in z.files}


def write_task_records(path: str, sampler: PretrainSampler, task: str,
                       num_records: int) -> str:
    """Materialize `num_records` pre-assembled samples for one proxy task
    into an ArrayRecord file. SAP records bake the pos/neg end-viewpoint
    mixture (tasks.py:286-293) and the action label; MRC records carry the
    per-token soft labels + view mask so load-time masking is
    self-contained; OG records bake the object label."""
    from array_record.python.array_record_module import ArrayRecordWriter

    sh = sampler.sh
    end_vp_type = "pos" if task in ("mrc", "og") else None
    writer = ArrayRecordWriter(path, "group_size:1")
    try:
        for _ in range(num_records):
            w, traj = sampler._sample_traj(end_vp_type)
            sample, aux = sampler._assemble(w, traj)
            if task == "mrc":
                is_view, probs = mrc_token_info(sh, sample, aux)
                sample["mrc_is_view"] = is_view
                sample["vp_view_probs"] = probs
            elif task == "og":
                if sh.num_objs <= 0:
                    raise ValueError("og records require num_objs > 0")
                sample["obj_labels"] = np.int64(og_slot_label(sh, aux))
            writer.write(encode_record(sample))
    finally:
        writer.close()
    return path


# ---------------------------------------------------------------------------
# load-time transforms
# ---------------------------------------------------------------------------

class _Decode(gp.MapTransform):
    def map(self, data: bytes) -> Dict[str, np.ndarray]:
        return decode_record(data)


class _Finalize(gp.MapTransform):
    """Derived fields every task needs (txt_masks)."""

    def __init__(self, pad_token_id: int):
        self.pad_token_id = pad_token_id

    def map(self, s: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        s["txt_masks"] = s["txt_ids"] != self.pad_token_id
        return s


class _MlmMask(gp.RandomMapTransform):
    """Fresh 80-10-10 masking per epoch (tasks.py:12-52)."""

    def __init__(self, shapes: PretrainShapes):
        self.shapes = shapes

    def random_map(self, s: Dict[str, np.ndarray],
                   rng: np.random.Generator) -> Dict[str, np.ndarray]:
        masked, labels = mask_tokens(rng, s["txt_ids"], self.shapes)
        s["txt_ids"] = masked
        s["txt_labels"] = labels
        return s


class _MrcMask(gp.RandomMapTransform):
    """Fresh view masking per epoch (tasks.py:142-153,192-194): pick
    masked view tokens, zero their image features on the final step."""

    def __init__(self, shapes: PretrainShapes):
        self.shapes = shapes

    def random_map(self, s: Dict[str, np.ndarray],
                   rng: np.random.Generator) -> Dict[str, np.ndarray]:
        is_view = s.pop("mrc_is_view")
        pick = sample_mrc_mask(rng, is_view, self.shapes.mrc_mask_prob)
        t = int(s["last_step"])
        vp_img = s["vp_img"].copy()
        vp_img[t][pick] = 0.0
        s["vp_img"] = vp_img
        s["vp_view_mrc_masks"] = pick
        return s


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------

def build_task_loader(files: Sequence[str], task: str,
                      shapes: PretrainShapes, batch_size: int, *,
                      seed: int = 0, shuffle: bool = True,
                      num_epochs: Optional[int] = None,
                      shard_options: Optional[gp.ShardOptions] = None,
                      worker_count: int = 0) -> gp.DataLoader:
    """One grain DataLoader for one proxy task. batch_size is PER HOST
    (the global batch is batch_size * process_count, matching the
    reference's per-rank DataLoader batch)."""
    source = gp.ArrayRecordDataSource(list(files))
    if shard_options is None:
        shard_options = gp.ShardByJaxProcess(drop_remainder=True)
    sampler = gp.IndexSampler(
        num_records=len(source), shard_options=shard_options,
        shuffle=shuffle, num_epochs=num_epochs, seed=seed)
    ops: List[gp.Operation] = [_Decode()]
    if task == "mlm":
        ops.append(_MlmMask(shapes))
    elif task == "mrc":
        ops.append(_MrcMask(shapes))
    ops.append(_Finalize(shapes.pad_token_id))
    ops.append(gp.Batch(batch_size, drop_remainder=True))
    return gp.DataLoader(data_source=source, sampler=sampler,
                         operations=ops, worker_count=worker_count)


class GrainMetaLoader:
    """MetaLoader parity (loader.py:18-88): draws the next task from a
    multinomial over `ratios` with a shared seed, then pulls a batch from
    that task's loader. Because every host constructs this with the same
    seed, all hosts agree on the task sequence without any collective."""

    def __init__(self, loaders: Dict[str, gp.DataLoader],
                 ratios: Sequence[float], seed: int = 0):
        assert loaders, "need at least one task loader"
        self.tasks = list(loaders.keys())
        self.iters = {t: iter(dl) for t, dl in loaders.items()}
        self.loaders = loaders
        p = np.asarray(list(ratios), np.float64)
        self.p = p / p.sum()
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[Tuple[str, Dict[str, np.ndarray]]]:
        return self

    def __next__(self) -> Tuple[str, Dict[str, np.ndarray]]:
        task = self.tasks[self.rng.choice(len(self.tasks), p=self.p)]
        try:
            batch = next(self.iters[task])
        except StopIteration:
            self.iters[task] = iter(self.loaders[task])
            try:
                batch = next(self.iters[task])
            except StopIteration:
                # a StopIteration escaping __next__ would just END the
                # meta iterator: training stops silently at an arbitrary
                # step. A task yields zero batches when its per-host
                # record count is below the batch size (ShardByJaxProcess
                # + drop_remainder) — error loudly instead.
                raise RuntimeError(
                    f"task {task!r} yields no full batch on this host "
                    "(record shard smaller than the batch size?)"
                ) from None
        return task, batch
