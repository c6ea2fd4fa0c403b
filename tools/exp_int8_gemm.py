"""Is int8 x int8 -> int32 matmul actually ~2x bf16 on this v5e chip at
CLIP shapes, through plain XLA?

v5e peak: 197 TFLOP/s bf16 vs 394 TOPS int8. The CLIP tower is frozen,
so its weights can be quantized once at load (per-output-channel
symmetric scales) and activations quantized dynamically (per-row max).
Before building that path, measure the primitive: this tool times the
two GEMM shapes that dominate the tower at the bench operating point
(B=16 panos -> 192 images -> rows = 192*50 = 9600):

  mlp:  (9600, 768) @ (768, 3072)   - one direction of the FFN
  qkvo: (9600, 768) @ (768, 768)    - one projection

in bf16, raw int8 (quant cost excluded: bounds the MXU speedup), and
int8 with fused dynamic activation quant + f32 dequant epilogue (the
realistic production formulation).

Honest chained-scan harness per bench.py docstring: every iteration
perturbs the activation from the scan xs stream so XLA cannot hoist
the body.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_int8_gemm.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    iters = 256

    def timed(fn, *args):
        xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

        def chained(args, xs):
            def body(c, t):
                out = fn(*args, t)
                return c + out.astype(jnp.float32).sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c

        f = jax.jit(chained)
        np.asarray(f(args, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(args, xs))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters * 1e3

    out = {"backend": jax.default_backend(), "iters": iters}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    for name, (M, K, N) in (("qkvo", (9600, 768, 768)),
                            ("mlp", (9600, 768, 3072))):
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        wscale = jnp.asarray(rng.random((1, N)), jnp.float32) * 0.02

        def bf16(a, w, t):
            return (a + t.astype(jnp.bfloat16)) @ w

        def int8_raw(a8, w8, t):
            aa = a8 + t.astype(jnp.int8)
            return jax.lax.dot_general(
                aa, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def int8_dyn(a, w8, wscale, t):
            # dynamic per-row symmetric activation quant + f32 dequant
            aa = (a + t.astype(jnp.bfloat16)).astype(jnp.float32)
            amax = jnp.max(jnp.abs(aa), axis=1, keepdims=True)
            ascale = amax / 127.0
            q = jnp.clip(jnp.round(aa / ascale), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * ascale * wscale

        gflop = 2 * M * K * N / 1e9
        ms = timed(bf16, a, w)
        emit(f"{name}_bf16_ms", round(ms, 4))
        emit(f"{name}_bf16_tflops", round(gflop / ms, 1))
        ms = timed(int8_raw, a8, w8)
        emit(f"{name}_int8_raw_ms", round(ms, 4))
        emit(f"{name}_int8_raw_tops", round(gflop / ms, 1))
        ms = timed(int8_dyn, a, w8, wscale)
        emit(f"{name}_int8_dyn_ms", round(ms, 4))
        emit(f"{name}_int8_dyn_tops", round(gflop / ms, 1))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
