"""Double-buffered rollout: overlap simulator stepping with device compute.

The reference's rollout is strictly sequential — render, encode, plan,
step, repeat (SURVEY.md §3.1 flags this as the main >=5x lever together
with batched encoding). Per-step the data dependency (action_t needs
logits_t) forbids overlap *within* one env batch, so we pipeline *across
the batch*: the envs are split into two half-batches running as threads;
while half A blocks on its (multi-process) simulators, half B's fused
device programs execute, and vice versa. With ProcessVectorEnv workers the
sim work happens out-of-process, so the GIL is released during env waits
and the device queue stays fed.

Each half runs a full RolloutEngine over its own envs; records concatenate
for the learn step (the batches are independent episodes, so this is
exactly equivalent to one big batch).
"""

from __future__ import annotations

import threading
from typing import List, Optional

import numpy as np

from etpnav_tpu.training.rollout import RolloutEngine, RolloutRecord


def concat_records(records: List[RolloutRecord]) -> RolloutRecord:
    records = [r for r in records if r is not None]
    fields = RolloutRecord.__dataclass_fields__.keys()
    return RolloutRecord(**{
        f: np.concatenate([getattr(r, f) for r in records], axis=0)
        for f in fields})


class PipelinedRollout:
    """Runs N RolloutEngines (disjoint env pools) in threads."""

    def __init__(self, engines: List[RolloutEngine]):
        self.engines = engines

    def run(self, mode: str, sample_ratio: float = 0.0, gt_paths=None,
            stat_eps: Optional[dict] = None,
            path_eps: Optional[dict] = None,
            sample_actions: bool = False,
            video_dir=None) -> Optional[RolloutRecord]:
        results: List[Optional[RolloutRecord]] = [None] * len(self.engines)
        errors: List[Optional[BaseException]] = [None] * len(self.engines)
        # eval/infer share the dedup dicts; dict writes are GIL-atomic
        locks_free_kwargs = dict(gt_paths=gt_paths, stat_eps=stat_eps,
                                 path_eps=path_eps,
                                 sample_actions=sample_actions,
                                 video_dir=video_dir)

        def worker(i):
            try:
                results[i] = self.engines[i].run(
                    mode, sample_ratio=sample_ratio, **locks_free_kwargs)
            except BaseException as e:   # noqa: BLE001
                errors[i] = e

        threads = [threading.Thread(target=worker, args=(i,), daemon=True)
                   for i in range(len(self.engines))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for e in errors:
            if e is not None:
                raise e
        if mode != "train":
            return None
        return concat_records(results)
