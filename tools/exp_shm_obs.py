"""Transport A/B: pickled-pipe vs shared-memory observation plane.

Isolates transport cost with a stub env that returns pre-generated
fixed-shape observations (no rendering), at the production observation
size (12 x 224x224x3 uint8 RGB + 12 x 256x256x1 f32 depth ~= 4.9 MB per
env per step). Reports steps/s for a 4-worker pool over both paths and
the native-gather batch assembly time.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_shm_obs.py
"""

import json
import time

import numpy as np

from etpnav_tpu.env.protocol import StepResult


class StubObsEnv:
    """Minimal VectorNavEnv worker: fixed obs, zero simulation cost."""

    def __init__(self, seed: int, image_size: int = 224,
                 depth_size: int = 256, views: int = 12):
        rng = np.random.default_rng(seed)
        self._obs = {
            "rgb": rng.integers(0, 255, (views, image_size, image_size, 3),
                                np.uint8),
            "depth": rng.random((views, depth_size, depth_size, 1))
            .astype(np.float32),
            "instruction": np.arange(16),
        }

    num_envs = 1

    def reset(self):
        return [self._obs]

    def step(self, actions):
        return [StepResult(self._obs, False, {})]


class StubFactory:
    def __init__(self, seed, **kw):
        self.seed, self.kw = seed, kw

    def __call__(self):
        return StubObsEnv(self.seed, **self.kw)


def run(shm: bool, n_envs: int = 4, steps: int = 50) -> float:
    from etpnav_tpu.env.shm_transport import ObsSpec
    from etpnav_tpu.env.vector import ProcessVectorEnv
    spec = None
    if shm:
        spec = ObsSpec({"rgb": ((12, 224, 224, 3), np.uint8),
                        "depth": ((12, 256, 256, 1), np.float32)})
    envs = ProcessVectorEnv([StubFactory(i) for i in range(n_envs)],
                            shm_obs_spec=spec, shm_copy=False)
    try:
        envs.reset()
        t0 = time.perf_counter()
        for _ in range(steps):
            res = envs.step([{}] * n_envs)
            # consume like the rollout: one gather into the host batch
            from etpnav_tpu import native
            native.stack_arrays([r.observation["rgb"] for r in res])
            native.stack_arrays([r.observation["depth"] for r in res])
        dt = time.perf_counter() - t0
    finally:
        envs.close()
    return steps / dt


def main():
    out = {"n_envs": 4}
    out["pipe_steps_per_s"] = round(run(shm=False), 2)
    out["shm_steps_per_s"] = round(run(shm=True), 2)
    out["speedup"] = round(out["shm_steps_per_s"]
                           / out["pipe_steps_per_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
