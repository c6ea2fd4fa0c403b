"""Shared-memory observation plane (env/shm_transport.py + native io_core).

The pipe path stays the reference-parity baseline (habitat VectorEnv
semantics); these tests pin that the shm path is observation-for-
observation identical to it, that zero-copy view lifetime is enforced
as documented, and that crash recovery keeps working with shm enabled.
"""

import numpy as np
import pytest

from etpnav_tpu.env import shm_transport as shmt
from etpnav_tpu.env.protocol import StepResult
from etpnav_tpu.env.vector import construct_geometric_envs

ENV_KW = dict(vocab_size=64, max_instr_len=8, image_size=16, depth_size=16,
              num_views=4)


def _spec():
    return shmt.ObsSpec({"rgb": ((4, 16, 16, 3), np.uint8),
                         "depth": ((4, 8, 8, 1), np.float32)})


def _obs(rng):
    return {"rgb": rng.integers(0, 255, (4, 16, 16, 3), np.uint8),
            "depth": rng.random((4, 8, 8, 1), np.float32().dtype)
            .astype(np.float32),
            "instruction": np.arange(5)}


def test_spec_layout_aligned():
    spec = _spec()
    assert all(off % 64 == 0 for off in spec.offsets.values())
    assert spec.nbytes >= 64 + 4 * 16 * 16 * 3 + 4 * 8 * 8 * 4


def test_channel_roundtrip_and_staleness():
    spec = _spec()
    parent = shmt.ShmObsChannel(spec, create=True)
    worker = shmt.ShmObsChannel(spec, name=parent.name)
    try:
        rng = np.random.default_rng(0)
        obs = _obs(rng)
        seq = worker.write(obs)
        got = parent.read(seq)
        np.testing.assert_array_equal(got["rgb"], obs["rgb"])
        np.testing.assert_array_equal(got["depth"], obs["depth"])
        assert not got["rgb"].flags.writeable     # views are read-only
        # copies are independent of the next write
        copied = parent.read(seq, copy=True)
        seq2 = worker.write(_obs(rng))
        np.testing.assert_array_equal(copied["rgb"], obs["rgb"])
        with pytest.raises(RuntimeError, match="stale"):
            parent.read(seq)                       # old token now stale
        parent.read(seq2)
        # shape contract is loud
        bad = _obs(rng)
        bad["rgb"] = bad["rgb"][:2]
        with pytest.raises(ValueError, match="spec says"):
            worker.write(bad)
    finally:
        worker.close()
        parent.close()


def test_encode_decode_result_shapes():
    spec = _spec()
    parent = shmt.ShmObsChannel(spec, create=True)
    worker = shmt.ShmObsChannel(spec, name=parent.name)
    try:
        rng = np.random.default_rng(1)
        obs = _obs(rng)
        # reset-style payload: [obs]
        enc = shmt.encode_result(worker, [obs])
        assert shmt.SHM_TOKEN in enc[0]
        dec = shmt.decode_result(parent, enc, copy=True)
        np.testing.assert_array_equal(dec[0]["rgb"], obs["rgb"])
        np.testing.assert_array_equal(dec[0]["instruction"],
                                      obs["instruction"])  # rode the pipe
        # step-style payload: [StepResult]
        obs2 = _obs(rng)
        enc = shmt.encode_result(worker, [StepResult(obs2, True, {"k": 1})])
        dec = shmt.decode_result(parent, enc, copy=True)[0]
        assert dec.done and dec.info == {"k": 1}
        np.testing.assert_array_equal(dec.observation["depth"],
                                      obs2["depth"])
        # non-observation payloads pass through untouched
        arr = np.arange(3.0)
        assert shmt.encode_result(worker, arr) is arr
        # one region holds one observation
        with pytest.raises(RuntimeError, match="one observation"):
            shmt.encode_result(worker, [obs, obs2])
    finally:
        worker.close()
        parent.close()


def _roll(envs, steps=2):
    """Deterministic mini-rollout capturing everything obs-shaped."""
    out = [envs.reset()]
    for _ in range(steps):
        res = envs.step_low_level([1] * envs.num_envs)
        out.append([(r.observation, r.done) for r in res])
    return out


def test_shm_pipe_equivalence():
    """The shm path must be observation-for-observation identical to the
    pickled-pipe path (same seeds, same actions)."""
    pipe = construct_geometric_envs(2, seed=5, **ENV_KW)
    shm = construct_geometric_envs(2, seed=5, shm_obs=True, **ENV_KW)
    try:
        a, b = _roll(pipe), _roll(shm)
        for oa, ob in zip(a[0], b[0]):
            for k in ("rgb", "depth", "instruction"):
                np.testing.assert_array_equal(oa[k], ob[k])
        for ra, rb in zip(a[1:], b[1:]):
            for (oa, da), (ob, db) in zip(ra, rb):
                assert da == db
                np.testing.assert_array_equal(oa["rgb"], ob["rgb"])
                np.testing.assert_array_equal(oa["depth"], ob["depth"])
    finally:
        pipe.close()
        shm.close()


def test_zero_copy_views():
    envs = construct_geometric_envs(2, seed=9, shm_obs=True,
                                    shm_copy=False, **ENV_KW)
    try:
        obs = envs.reset()
        assert not obs[0]["rgb"].flags.writeable
        assert not obs[0]["depth"].flags.writeable
        # consume-before-next-command is the documented lifetime: grab a
        # copy now, step, and the view may change under us — the copy is
        # the ground truth the trainer batches from
        frozen = obs[0]["rgb"].copy()
        envs.step_low_level([1, 1])
        assert frozen.shape == obs[0]["rgb"].shape
    finally:
        envs.close()


def test_crash_recovery_with_shm():
    envs = construct_geometric_envs(2, seed=3, shm_obs=True,
                                    restart_on_crash=True, **ENV_KW)
    try:
        envs.reset()
        envs.inject_worker_crash(0)
        res = envs.step_low_level([1, 1])
        assert res[0].info.get("crashed") and res[0].done
        # the respawned worker reuses the same shm region and keeps serving
        res = envs.step_low_level([1, 1])
        assert res[0].observation["rgb"].shape == (4, 16, 16, 3)
        assert not res[1].info.get("crashed")
    finally:
        envs.close()


def test_native_stack_arrays_parity():
    from etpnav_tpu import native
    rng = np.random.default_rng(2)
    arrays = [rng.integers(0, 255, (12, 24, 24, 3), np.uint8)
              for _ in range(5)]
    out = native.stack_arrays(arrays)
    np.testing.assert_array_equal(out, np.stack(arrays))
    # explicit destination buffer (the pinned host batch pattern)
    dst = np.empty((5, 12, 24, 24, 3), np.uint8)
    native.stack_arrays(arrays, out=dst)
    np.testing.assert_array_equal(dst, np.stack(arrays))


def test_native_gather_copy_direct():
    from etpnav_tpu import native
    if native.get_io_lib() is None:
        pytest.skip("native io_core unavailable")
    rng = np.random.default_rng(4)
    srcs = [np.ascontiguousarray(rng.random((7, 33)).astype(np.float32))
            for _ in range(3)]
    out = np.empty((3, 7, 33), np.float32)
    assert native.gather_copy(srcs, out)
    np.testing.assert_array_equal(out, np.stack(srcs))
