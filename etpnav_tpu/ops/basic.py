"""Core tensor ops: norms, activations, masking, padding.

TPU-native replacements for the reference's mask/pad helpers
(vlnce_baselines/common/ops.py:25-68). Everything here takes and returns
fixed-shape arrays so it can live under jit without recompilation.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# The reference builds additive masks as (1-m)*-10000 (common/ops.py:33).
# We keep the same magnitude for logit-parity with released checkpoints.
NEG_INF = -10000.0


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact-erf GELU, matching the reference's BERT gelu
    (vilmodel_cmt.py:31-37), not the tanh approximation."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-12) -> jax.Array:
    """TF-style LayerNorm (eps inside sqrt), matching torch nn.LayerNorm and
    the reference's BertLayerNorm (TRM_net.py:91-104). Stats in fp32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


def linear(params: dict, x: jax.Array) -> jax.Array:
    """Dense layer. params = {'w': (in, out), 'b': (out,)}.
    Accumulates in fp32 on the MXU regardless of input dtype."""
    y = jnp.dot(x, params["w"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def trunc_normal(key: jax.Array, shape, std: float = 0.02,
                 dtype=jnp.float32) -> jax.Array:
    """BERT-style truncated normal init (initializer_range=0.02)."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def linear_init(key: jax.Array, d_in: int, d_out: int,
                std: float = 0.02) -> dict:
    return {
        "w": trunc_normal(key, (d_in, d_out), std),
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def ln_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def embedding_init(key: jax.Array, num: int, dim: int,
                   std: float = 0.02) -> jax.Array:
    return trunc_normal(key, (num, dim), std)


def gen_seq_masks(seq_lens: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> (B, max_len) bool validity mask.
    Fixed-shape analogue of common/ops.py:36-44."""
    pos = jnp.arange(max_len, dtype=seq_lens.dtype)[None, :]
    return pos < seq_lens[:, None]


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(..., L) bool -> additive attention bias, 0 where valid, NEG_INF where
    padded. Analogue of extend_neg_masks (common/ops.py:25-34); callers add
    broadcast dims for heads/query as needed."""
    return (1.0 - mask.astype(dtype)) * NEG_INF


#: Experimental (tools/exp_learn_bisect.py bits8 variant): draw dropout
#: masks from uint8 random bits instead of bernoulli's uniform-f32
#: threshold — 4x fewer random bits per element. The keep probability
#: quantizes to n/256 (<=0.4% relative shift); inverted scaling uses the
#: quantized value, so activations stay unbiased at the effective rate.
DROPOUT_BITS8 = False


def maybe_dropout(x: jax.Array, rate: float, rng: Optional[jax.Array],
                  train: bool) -> jax.Array:
    """Inverted dropout; identity when eval or rate==0."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    if DROPOUT_BITS8:
        t = int(round(keep * 256))
        if t >= 256:
            return x
        keep = t / 256.0
        mask = jax.random.bits(rng, x.shape, dtype=jnp.uint8) < jnp.uint8(t)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
