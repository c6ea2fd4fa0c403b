"""Does the Mosaic-compatible fused pre-norm half-block
(fused_prenorm_attention_v2) beat the production path
(XLA LN + XLA q/k/v/o GEMMs + fused_attention_nhd core)?

The v1 fused block was Mosaic-rejected on its minor-dim head-split
reshape; v2 keeps the projections as full-width GEMMs and attends each
head on its 64-lane slice (ops/pallas_attention.py). The fusion claim:
q/k/v/ctx never leave VMEM, removing ~6 (B,L,D) HBM round-trips per
layer and the nhd kernel's separate grid dispatch.

Times one CLIP layer equivalent (attention half only) at B*V = 192, and
both full towers via the clip encoder with USE_FUSED_BLOCK toggled.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_prenorm_v2.py
"""

import json
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.ops import pallas_attention as pa
    from etpnav_tpu.ops.attention import mha, mha_init
    from etpnav_tpu.ops.basic import layer_norm, ln_init

    B, L, H, hd = 192, 50, 12, 64
    D = H * hd
    eps = 1e-5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    attn = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), mha_init(key, D))
    ln = ln_init(D)
    iters = 64
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

    def timed(core):
        def chained(x, xs):
            def body(c, t):
                xx = x + t.astype(x.dtype) * 1e-3
                return c + core(xx).astype(jnp.float32).sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c
        f = jax.jit(chained)
        np.asarray(f(x, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x, xs))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters * 1e3

    def production(xx):
        a = layer_norm(xx, ln["scale"], ln["bias"], eps)
        return xx + mha(attn, a, a, H)

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)   # survive a timeout kill

    out = {"backend": jax.default_backend(), "B": B}
    emit("production_ms", round(timed(production), 3))
    for blk in (8, 16, 32):
        try:
            fn = lambda xx, blk=blk: pa.fused_prenorm_attention_v2(
                xx, ln, attn, H, eps, block_b=blk)
            # numerics first: one shot against the production path
            got = np.asarray(fn(x), np.float32)
            want = np.asarray(production(x), np.float32)
            err = float(np.abs(got - want).max())
            emit(f"v2_blk{blk}_maxerr", round(err, 5))
            emit(f"v2_blk{blk}_ms", round(timed(fn), 3))
        except Exception as e:   # noqa: BLE001 — record Mosaic rejections
            emit(f"v2_blk{blk}_error", repr(e)[:200])

    # full 12-layer tower A/B through the production entry point
    from etpnav_tpu import config as cfgmod
    from etpnav_tpu.models import clip_vit
    cfg = cfgmod.ClipConfig()
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        clip_vit.init_clip_params(jax.random.PRNGKey(1), cfg))
    rgb = jnp.asarray(rng.integers(0, 255, (192, cfg.image_size,
                                            cfg.image_size, 3)), jnp.uint8)
    xs8 = jnp.arange(1, 17, dtype=jnp.uint8)

    def tower(fused: bool):
        clip_vit.USE_FUSED_BLOCK = fused

        def chained(rgb, xs):
            def body(c, t):
                r = rgb + t                 # perturb: no hoisting
                e = clip_vit.encode_image_uint8(params, cfg, r)
                return c + e.astype(jnp.float32).sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c
        f = jax.jit(chained)
        np.asarray(f(rgb, xs8))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(rgb, xs8))
            ts.append(time.perf_counter() - t0)
        return min(ts) / 16 * 1e3

    try:
        emit("tower_prod_ms", round(tower(False), 3))
        emit("tower_fused_ms", round(tower(True), 3))
    except Exception as e:   # noqa: BLE001
        emit("tower_error", repr(e)[:200])
    finally:
        clip_vit.USE_FUSED_BLOCK = False
    print(json.dumps(out))


if __name__ == "__main__":
    main()
