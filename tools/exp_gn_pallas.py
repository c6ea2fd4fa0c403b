"""Round-4 probe: one-pass fused GroupNorm Pallas kernel A/B
(VERDICT r3 #4 — "build or bury" the fused conv+GN lever).

The kernel (ops/pallas_groupnorm.py) folds stats + normalize + affine +
ReLU + residual-add into a single HBM read+write per GN site (the XLA
path pays two reads: a channel-major moments pass, then the fused
affine). Upper bound on the win from r3 bisects: GN-stats ~0.68 ms of
the 2.56 ms bf16 trunk at B=192 (tools/exp_depth_r3.py), i.e. at most
~4.5% of the 15.1 ms perception pipeline.

Measures (chained-scan harness, inputs perturbed from the xs stream):
  depth_xla / depth_fused     - full depth trunk, both GN paths
  perceive_xla / perceive_fused - full fused perception dispatch
  kernel parity on-device     - fused vs XLA GN outputs (exactness)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_gn_pallas.py
"""

import dataclasses
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import depth_resnet as dr

    cfg_x = r2r_config().depth
    cfg_f = dataclasses.replace(cfg_x, use_fused_gn=True)
    params = jax.device_put(dr.init_depth_params(jax.random.PRNGKey(0),
                                                 cfg_x))
    B = 16 * 12
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((B, 128, 128, 1), np.float32))
    iters = 48
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7
    out = {"backend": jax.default_backend(), "B": B}

    # on-device parity first: same trunk params, both paths, bf16
    y_x = np.asarray(jax.jit(
        lambda p, d: dr.encode_depth(p, cfg_x, d))(params, depth))
    y_f = np.asarray(jax.jit(
        lambda p, d: dr.encode_depth(p, cfg_f, d))(params, depth))
    out["trunk_maxerr"] = float(np.abs(y_x - y_f).max())
    print(json.dumps(out), flush=True)

    def timed(name, fn):
        def chained(p, d, xs):
            def body(c, x):
                return c + fn(p, d + x.astype(jnp.float32) * 1e-6), None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]
        f = jax.jit(chained)
        np.asarray(f(params, depth, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, depth, xs))
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts) / iters * 1e3, 3)
        print(json.dumps(out), flush=True)

    timed("depth_xla", lambda p, d: dr.encode_depth(p, cfg_x, d).sum())
    timed("depth_fused", lambda p, d: dr.encode_depth(p, cfg_f, d).sum())

    # full perception dispatch with each depth path
    from etpnav_tpu.config import r2r_config as full_cfg
    from etpnav_tpu.training import agent as agent_lib
    for name, dcfg in (("perceive_xla", cfg_x), ("perceive_fused", cfg_f)):
        cfg = full_cfg()
        cfg = dataclasses.replace(cfg, depth=dcfg)
        aparams = jax.device_put(agent_lib.init_agent_params(
            jax.random.PRNGKey(0), cfg))
        rgb = jnp.asarray(rng.integers(0, 256, (16, 12, 224, 224, 3)),
                          jnp.uint8)
        dep = jnp.asarray(rng.random((16, 12, 128, 128, 1), np.float32))

        def chained(p, rgb, dep, xs):
            def body(c, x):
                o = agent_lib.perceive(p, cfg, rgb + x.astype(jnp.uint8),
                                       dep)
                return c + o["avg_pano_embeds"].sum(), None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]
        f = jax.jit(chained)
        np.asarray(f(aparams, rgb, dep, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(aparams, rgb, dep, xs))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / iters * 1e3
        out[name] = round(ms, 3)
        out[name + "_panos_per_sec"] = round(16 / (ms / 1e3), 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
