"""Space-to-depth reformulation of the depth stem conv: does it beat
lax.conv on TPU?

The stem is a 7x7/stride-2 conv on ONE input channel (contraction depth
49) — measured ~0.79 ms at B=192, ~70x off roofline, because a C_in=1
conv gives the MXU almost no contraction depth. The canonical TPU fix
(used by cloud-TPU ResNet reference models for the RGB stem) is
space-to-depth: pack each 2x2 pixel phase into channels, turning the
conv into a 4x4/stride-1 conv over 4 input channels — 4x the
contraction depth and 1/4 the spatial positions, exact same math.

Construction (exactness): pad H,W by 3 (134x134, even), s2d by 2 ->
(B,67,67,4) with channel c = dy*2+dx; embed the 7x7 kernel in 8x8
(zeros at row/col 7) and scatter taps K8[2p+dy, 2q+dx] -> K'[p,q,c];
VALID 4x4 conv -> (B,64,64,C). Every output (i,j) then sums
K8[a,b] * xpad[2i+a, 2j+b] for a,b in 0..7 == the original conv.

Times: stem-only A/B, then the FULL encode_depth with each stem (the
im2col attempt taught us a stem rewrite can poison the trunk layout —
never adopt on the isolated number alone).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_stem_s2d.py
"""

import json
import time

import numpy as np


def pack_stem_kernel(w):
    """(7,7,1,C) -> (4,4,4,C) phase-packed kernel (numpy or jnp)."""
    import jax.numpy as jnp
    k8 = jnp.zeros((8, 8) + w.shape[2:], w.dtype).at[:7, :7].set(w)
    # channel order must match the s2d reshape: c = dy*2 + dx
    return jnp.stack([k8[dy::2, dx::2, 0, :]
                      for dy in range(2) for dx in range(2)], axis=2)


def stem_s2d(wpacked, x):
    """x (B,H,W,1) -> (B,H/2,W/2,C), exact 7x7/s2/pad3 conv."""
    import jax
    import jax.numpy as jnp
    B, H, W, _ = x.shape
    xp = jnp.pad(x[..., 0], ((0, 0), (3, 3), (3, 3)))
    Hp = H + 6
    s2d = xp.reshape(B, Hp // 2, 2, Hp // 2, 2).transpose(0, 1, 3, 2, 4) \
        .reshape(B, Hp // 2, Hp // 2, 4)
    return jax.lax.conv_general_dilated(
        s2d, wpacked.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    import jax
    import jax.numpy as jnp

    from etpnav_tpu.config import r2r_config
    from etpnav_tpu.models import depth_resnet as dr

    cfg = r2r_config().depth
    params = jax.device_put(dr.init_depth_params(jax.random.PRNGKey(0),
                                                 cfg))
    B = 192
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((B, cfg.input_size, cfg.input_size, 1),
                                   np.float32))
    wpacked = pack_stem_kernel(params["stem_conv"]["w"])

    out = {"backend": jax.default_backend(), "B": B}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    # ---- exactness first (fp32) ----
    want = np.asarray(dr.conv2d(params["stem_conv"],
                                depth.astype(jnp.float32), 2, 3))
    got = np.asarray(stem_s2d(wpacked.astype(jnp.float32),
                              depth.astype(jnp.float32)))
    emit("maxerr_fp32", float(np.abs(got - want).max()))

    iters = 64
    xs = jnp.arange(1, iters + 1, dtype=jnp.int32) % 7

    def timed(fn):
        def chained(d, xs):
            def body(c, t):
                dd = d + t.astype(d.dtype) * 1e-6
                return c + fn(dd).astype(jnp.float32).sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return c
        f = jax.jit(chained)
        np.asarray(f(depth, xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(depth, xs))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters * 1e3

    stem_ref = lambda d: dr.conv2d(params["stem_conv"],
                                   d.astype(jnp.bfloat16), 2, 3)
    stem_new = lambda d: stem_s2d(wpacked, d.astype(jnp.bfloat16))
    emit("stem_conv_ms", round(timed(stem_ref), 4))
    emit("stem_s2d_ms", round(timed(stem_new), 4))

    # ---- full encoder with each stem (trunk-interaction guard) ----
    emit("full_conv_ms", round(timed(
        lambda d: dr.encode_depth(params, cfg, d)), 4))

    def encode_with_s2d(d):
        x = stem_s2d(wpacked, d.astype(jnp.bfloat16))
        x = jax.nn.relu(dr.group_norm(params["stem_gn"], x, cfg.ngroups))
        x = dr.max_pool(x)
        for li in range(4):
            stride = 1 if li == 0 else 2
            for bi, bparams in enumerate(params[f"layer{li + 1}"]):
                x = dr._bottleneck(bparams, x, stride if bi == 0 else 1,
                                   cfg.ngroups)
        x = dr.conv2d(params["compression_conv"], x, 1, 1)
        x = jax.nn.relu(dr.group_norm(params["compression_gn"], x, 1))
        return x.astype(jnp.float32)

    emit("full_s2d_ms", round(timed(encode_with_s2d), 4))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
