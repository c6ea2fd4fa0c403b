"""Shared-memory observation plane for the vectorized env pool.

Capability target + redesign: habitat VectorEnv ships every observation
through a pickled pipe (habitat-lab's vector_env worker loop — the
process crossing flagged in SURVEY.md §3.1 (a)); serialize + pipe write +
read + deserialize is 3-4 full passes over ~5 MB of RGB-D panorama per
env per step. Here the fixed-shape observation arrays travel through a
per-worker SharedMemory region instead: the worker writes each array
once, the parent maps zero-copy views and gathers them straight into the
contiguous host batch the device feed consumes
(native.stack_arrays → native/io_core.cpp parallel memcpy). Control
messages stay on the pipe, so the synchronous request/reply protocol —
and therefore crash detection — is unchanged.

Layout per worker: a 64-byte header (int64 write sequence number)
followed by one 64-byte-aligned slot per observation field. A worker
holds exactly one in-flight observation: the parent consumes (or copies)
its views before issuing the next command to that worker, which the
strict request→reply alternation of ProcessVectorEnv guarantees.
Observation keys outside the spec (small scalars habitat adds) ride the
pipe as before.
"""

from __future__ import annotations

import dataclasses
import os
from multiprocessing import shared_memory
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from etpnav_tpu.env.protocol import StepResult

SHM_TOKEN = "__shm_obs__"
_HEADER = 64           # one cache line for the sequence counter
_ALIGN = 64


def _aligned(n: int) -> int:
    return (n + _ALIGN - 1) // _ALIGN * _ALIGN


class ObsSpec:
    """Ordered {name: (shape, dtype)} with a fixed shm slot layout."""

    def __init__(self, fields: Mapping[str, Tuple[tuple, Any]]):
        self.fields: Dict[str, Tuple[tuple, np.dtype]] = {}
        self.offsets: Dict[str, int] = {}
        off = _HEADER
        for name in sorted(fields):
            shape, dtype = fields[name]
            shape = tuple(int(s) for s in shape)
            dtype = np.dtype(dtype)
            self.fields[name] = (shape, dtype)
            self.offsets[name] = off
            off += _aligned(int(np.prod(shape)) * dtype.itemsize)
        self.nbytes = off

    @classmethod
    def from_example(cls, obs: Mapping[str, np.ndarray]) -> "ObsSpec":
        return cls({k: (v.shape, v.dtype) for k, v in obs.items()
                    if isinstance(v, np.ndarray)})

    def __eq__(self, other):
        return isinstance(other, ObsSpec) and self.fields == other.fields

    def __repr__(self):
        return f"ObsSpec({self.fields})"


class ShmObsChannel:
    """One worker's observation region; parent creates, worker attaches.

    The attach side maps /dev/shm/<name> directly with mmap instead of
    SharedMemory(name=...): attaching through SharedMemory registers the
    segment with a resource_tracker (CPython gh-82300) — with fork
    workers that unregisters the *parent's* entry in the shared tracker
    (KeyError noise at exit + a leak if the parent dies), and with spawn
    workers the child's own tracker would unlink the live segment when
    the child exits. Raw mmap involves no tracker; the creating parent
    keeps sole ownership and unlinks on close(). Non-POSIX platforms
    fall back to SharedMemory attach."""

    def __init__(self, spec: ObsSpec, name: Optional[str] = None,
                 create: bool = False):
        self.spec = spec
        self._shm = None
        self._mmap = None
        self._owner = bool(create)
        if create:
            self._shm = shared_memory.SharedMemory(create=True,
                                                   size=spec.nbytes)
            self._name = self._shm.name
            buf = self._shm.buf
        else:
            self._name = name
            path = f"/dev/shm/{name.lstrip('/')}"
            if os.path.exists(path):
                import mmap
                fd = os.open(path, os.O_RDWR)
                try:
                    self._mmap = mmap.mmap(fd, spec.nbytes)
                finally:
                    os.close(fd)
                buf = memoryview(self._mmap)
            else:               # non-POSIX fallback: tracked attach
                self._shm = shared_memory.SharedMemory(name=name)
                buf = self._shm.buf
        self._buf = buf
        self._seq = np.ndarray((1,), np.int64, buffer=buf, offset=0)
        if create:
            self._seq[0] = 0
        self._views: Dict[str, np.ndarray] = {}
        for fname, (shape, dtype) in spec.fields.items():
            self._views[fname] = np.ndarray(
                shape, dtype, buffer=buf, offset=spec.offsets[fname])

    @property
    def name(self) -> str:
        return self._name

    def write(self, obs: Mapping[str, np.ndarray]) -> int:
        """Worker side: copy the spec'd arrays in; returns the new seq."""
        for fname, (shape, dtype) in self.spec.fields.items():
            a = obs[fname]
            if a.shape != shape or a.dtype != dtype:
                raise ValueError(
                    f"shm obs field {fname!r}: got {a.shape}/{a.dtype}, "
                    f"spec says {shape}/{dtype}")
            self._views[fname][...] = a
        self._seq[0] += 1
        return int(self._seq[0])

    def read(self, seq: int, copy: bool = False
             ) -> Dict[str, np.ndarray]:
        """Parent side: views (or copies) of the worker's last write.

        Views are valid until the next command is sent to that worker;
        `seq` (from the pipe token) guards against protocol bugs."""
        if int(self._seq[0]) != seq:
            raise RuntimeError(
                f"stale shm observation: header seq {int(self._seq[0])} "
                f"!= token seq {seq}")
        if copy:
            return {k: v.copy() for k, v in self._views.items()}
        out = {}
        for k, v in self._views.items():
            ro = v[...]
            ro.flags.writeable = False
            out[k] = ro
        return out

    def close(self):
        # drop local numpy views of the buffer before closing the mmap
        self._views = {}
        self._seq = None
        self._buf = None
        try:
            if self._shm is not None:
                self._shm.close()
            elif self._mmap is not None:
                self._mmap.close()
        except BufferError:
            # a caller still holds zero-copy views (copy=False reads);
            # leave the mapping to process teardown, but still unlink so
            # the segment is reclaimed once every mapping drops
            pass
        if self._owner:
            try:
                self._shm.unlink()
            except FileNotFoundError:
                pass


# ---------------------------------------------------------------------------
# result (en/de)coding — applied to reset/step replies in the worker loop
# ---------------------------------------------------------------------------

def _is_obs(x, spec: ObsSpec) -> bool:
    return isinstance(x, dict) and all(k in x for k in spec.fields)


def encode_result(channel: ShmObsChannel, res: Any) -> Any:
    """Replace the (single) observation dict inside a reset/step reply
    with a pipe token; spec'd arrays go through shm, extra keys ride the
    token. Replies without an observation pass through unchanged."""
    spec = channel.spec

    def enc_obs(obs: dict) -> dict:
        seq = channel.write(obs)
        extra = {k: v for k, v in obs.items() if k not in spec.fields}
        return {SHM_TOKEN: seq, "extra": extra}

    if _is_obs(res, spec):
        return enc_obs(res)
    if isinstance(res, StepResult):
        if _is_obs(res.observation, spec):
            return dataclasses.replace(res, observation=enc_obs(
                res.observation))
        return res
    if isinstance(res, (list, tuple)):
        found = [i for i, x in enumerate(res)
                 if _is_obs(x, spec) or (isinstance(x, StepResult)
                                         and _is_obs(x.observation, spec))]
        if len(found) > 1:
            raise RuntimeError(
                "shm transport holds one observation per reply; got "
                f"{len(found)} (is this a num_envs>1 worker?)")
        if not found:
            return res
        out = list(res)
        out[found[0]] = encode_result(channel, out[found[0]])
        return type(res)(out)
    return res


def decode_result(channel: ShmObsChannel, res: Any,
                  copy: bool = False) -> Any:
    """Parent-side inverse of encode_result."""
    def dec_obs(token: dict) -> dict:
        obs = channel.read(token[SHM_TOKEN], copy=copy)
        obs.update(token.get("extra", {}))
        return obs

    if isinstance(res, dict) and SHM_TOKEN in res:
        return dec_obs(res)
    if isinstance(res, StepResult):
        if isinstance(res.observation, dict) and SHM_TOKEN in res.observation:
            return dataclasses.replace(
                res, observation=dec_obs(res.observation))
        return res
    if isinstance(res, (list, tuple)):
        return type(res)(decode_result(channel, x, copy=copy) for x in res)
    return res
