"""Coverage for observability + aux-loss utilities."""

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from etpnav_tpu.utils.aux_losses import AuxLosses
from etpnav_tpu.utils.logging import (
    RunningMeter,
    StepTimer,
    TensorboardLogger,
)


def test_aux_losses_registry():
    al = AuxLosses()
    al.register("ignored", jnp.ones(3))          # inactive -> no-op
    al.activate()
    al.register("a", jnp.asarray([1.0, 3.0]), weight=2.0)
    al.register("b", jnp.asarray([2.0, 4.0, 0.0]), weight=1.0,
                mask=jnp.asarray([1.0, 1.0, 0.0]))
    total = float(al.reduce())
    assert total == 2.0 * 2.0 + 3.0       # 2*mean(1,3) + masked-mean(2,4)
    # get() returns the raw registered array (reference get_loss)
    assert np.allclose(np.asarray(al.get("a")), [1.0, 3.0])
    al.deactivate()
    al.clear()
    assert al._losses == {}


def test_aux_losses_reduce_applies_mask():
    """reduce(mask) masks each loss like the reference's
    masked_select(...).mean() (common/aux_losses.py:25-32), composing with
    any registration-time mask."""
    al = AuxLosses()
    al.activate()
    al.register("a", jnp.asarray([1.0, 3.0, 100.0]), weight=2.0)
    al.register("b", jnp.asarray([2.0, 4.0, 6.0]), weight=1.0,
                mask=jnp.asarray([1.0, 1.0, 0.0]))
    total = float(al.reduce(mask=jnp.asarray([True, True, False])))
    assert total == 2.0 * 2.0 + 3.0
    # reduce mask narrows the registration mask, not replaces it
    total2 = float(al.reduce(mask=jnp.asarray([True, False, True])))
    assert total2 == 2.0 * ((1.0 + 100.0) / 2) + 2.0


def test_running_meter():
    m = RunningMeter("x", smooth=0.5)
    assert m.val is None
    m.update(2.0)
    m.update(4.0)
    assert m.val == 3.0


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    means = t.means()
    assert means["a"] >= 0.005


def test_tb_logger_jsonl_fallback(tmp_path, monkeypatch):
    # force the JSONL fallback by hiding torch's SummaryWriter
    import builtins
    real_import = builtins.__import__

    def fake_import(name, *a, **k):
        if name.startswith("torch.utils.tensorboard"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    log = TensorboardLogger(str(tmp_path))
    log.add_scalar("loss", 1.5, 3)
    log.add_scalars({"a": 1.0, "b": 2.0}, 4)
    log.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    assert {"tag": "loss", "value": 1.5, "step": 3} in lines
    assert len(lines) == 3


def test_tb_logger_real_backend(tmp_path):
    log = TensorboardLogger(str(tmp_path))
    log.add_scalar("x", 1.0, 1)
    log.close()
    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_init_distributed_single_process_noop(monkeypatch):
    """No multi-host context detectable -> no-op returning False (calling
    jax.distributed.initialize in a single-process test would raise)."""
    from etpnav_tpu.parallel.mesh import init_distributed
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "SLURM_JOB_NUM_NODES", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() is False
