"""Scratch experiment: where do the CLIP tower's ~33.6 ms go?

Variants (chained-scan harness, per-iteration input perturbation):
  full      - production encode_image_uint8
  noattn    - attention core replaced by v-passthrough (q/k/v/o GEMMs
              kept): isolates the softmax/QK^T/PV core cost
  noproj    - whole attention half removed (MLP+LN+patch only): bounds
              qkv/o GEMM cost on top of noattn
  noln      - all LayerNorms replaced by identity: bounds LN cost
  xlaattn   - fused Pallas kernel disabled (XLA attention): sanity check
              of the kernel's measured win

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_clip_decomp.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import clip_vit
    from etpnav_tpu.ops import attention as attn_lib
    from etpnav_tpu.ops import basic as basic_lib

    cfg = r2r_config().clip
    params = jax.device_put(
        clip_vit.init_clip_params(jax.random.PRNGKey(0), cfg))

    B = 32 * 12
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3)), jnp.uint8)
    iters = 48
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

    def timed():
        def chained(p, r, xs):
            def body(c, x):
                y = clip_vit.encode_image_uint8(
                    p, cfg, r + x.astype(jnp.uint8))
                return c + y.sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c
        f = jax.jit(chained)
        np.asarray(f(params, rgb, xs))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, rgb, xs))
            times.append(time.perf_counter() - t0)
        return round(min(times) / iters * 1e3, 3)

    real_mha = attn_lib.mha
    real_ln = basic_lib.layer_norm

    def mha_noattncore(p, q_in, kv_in, num_heads, bias=None, **kw):
        q = basic_lib.linear(p["q"], q_in)
        k = basic_lib.linear(p["k"], kv_in)
        v = basic_lib.linear(p["v"], kv_in)
        # keep all GEMMs + a trivial mix so nothing is dead code
        return basic_lib.linear(p["o"], v + 1e-6 * (q + k))

    def mha_noproj(p, q_in, kv_in, num_heads, bias=None, **kw):
        return q_in * jnp.bfloat16(1.0000001)

    def ln_identity(x, scale, bias, eps=1e-5):
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)

    out = {}
    out["full"] = timed()
    attn_lib.mha = mha_noattncore
    clip_vit.mha = mha_noattncore
    out["noattn"] = timed()
    attn_lib.mha = mha_noproj
    clip_vit.mha = mha_noproj
    out["noproj"] = timed()
    attn_lib.mha = real_mha
    clip_vit.mha = real_mha
    basic_lib.layer_norm = ln_identity
    clip_vit.layer_norm = ln_identity
    out["noln"] = timed()
    basic_lib.layer_norm = real_ln
    clip_vit.layer_norm = real_ln
    attn_lib.USE_FUSED_ATTENTION_NOBIAS = False
    out["xlaattn"] = timed()
    attn_lib.USE_FUSED_ATTENTION_NOBIAS = None
    print({"backend": jax.default_backend(), "B": B, **out})


if __name__ == "__main__":
    main()
