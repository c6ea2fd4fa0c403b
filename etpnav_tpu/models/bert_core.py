"""BERT building blocks: embeddings, post-norm encoder layers (scanned),
and the DETR-style pre-norm layers used by the pano encoder.

Functional parity targets in the reference:
- BertEmbeddings / BertLayer / BertEncoder  (models/etp/vilmodel_cmt.py:48-242)
- pre-norm TransformerEncoderLayer          (common/transformer.py:133-190)

TPU design: all L layers of a stack are stored stacked on a leading axis and
executed with lax.scan — one compiled layer body regardless of depth.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from etpnav_tpu.ops.basic import (
    gelu_erf,
    layer_norm,
    linear,
    linear_init,
    ln_init,
    maybe_dropout,
    trunc_normal,
)
from etpnav_tpu.ops.attention import (
    mha,
    self_attention_block,
    self_attention_block_init,
)


class BertDims(NamedTuple):
    hidden: int
    heads: int
    intermediate: int
    eps: float
    hidden_dropout: float = 0.0
    attn_dropout: float = 0.0


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def bert_embeddings_init(key: jax.Array, vocab: int, hidden: int,
                         max_pos: int, type_vocab: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "word_embeddings": trunc_normal(k1, (vocab, hidden)),
        "position_embeddings": trunc_normal(k2, (max_pos, hidden)),
        "token_type_embeddings": trunc_normal(k3, (type_vocab, hidden)),
        "ln": ln_init(hidden),
    }


def bert_embeddings(params: dict, input_ids: jax.Array, eps: float,
                    token_type_ids: Optional[jax.Array] = None, *,
                    hidden_dropout: float = 0.0,
                    rng: Optional[jax.Array] = None,
                    train: bool = False) -> jax.Array:
    """word + position + type embeddings, LN, dropout
    (vilmodel_cmt.py:62-77).

    Positions are plain arange(L) — deliberately, also for the XLM-R
    (RxR) variant: HF RoBERTa offsets positions by padding_idx+1 over a
    non-pad cumsum, but the reference's own BertEmbeddings uses arange
    (vilmodel_cmt.py:64-66) and the released checkpoints were trained
    that way, so arange is what keeps bit-parity. Do not 'fix' this."""
    B, L = input_ids.shape
    pos_ids = jnp.arange(L, dtype=jnp.int32)[None, :]
    x = params["word_embeddings"][input_ids]
    x = x + params["position_embeddings"][pos_ids]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = x + params["token_type_embeddings"][token_type_ids]
    x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"], eps)
    return maybe_dropout(x, hidden_dropout, rng, train)


# ---------------------------------------------------------------------------
# Post-norm BERT layer (attention + FFN)
# ---------------------------------------------------------------------------

def bert_ffn_init(key: jax.Array, hidden: int, intermediate: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "intermediate": linear_init(k1, hidden, intermediate),
        "output": {"dense": linear_init(k2, intermediate, hidden),
                   "ln": ln_init(hidden)},
    }


def bert_ffn(params: dict, x: jax.Array, eps: float, *,
             hidden_dropout: float = 0.0, rng: Optional[jax.Array] = None,
             train: bool = False) -> jax.Array:
    """BertIntermediate + BertOutput: LN(x + Drop(W2 gelu(W1 x)))."""
    h = gelu_erf(linear(params["intermediate"], x))
    h = linear(params["output"]["dense"], h)
    h = maybe_dropout(h, hidden_dropout, rng, train)
    return layer_norm(x + h, params["output"]["ln"]["scale"],
                      params["output"]["ln"]["bias"], eps)


def bert_layer_init(key: jax.Array, hidden: int, intermediate: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "attention": self_attention_block_init(k1, hidden),
        "ffn": bert_ffn_init(k2, hidden, intermediate),
    }


def bert_layer(params: dict, x: jax.Array, bias: Optional[jax.Array],
               dims: BertDims, *, rng: Optional[jax.Array] = None,
               train: bool = False) -> jax.Array:
    r1, r2 = _split(rng)
    x = self_attention_block(
        params["attention"], x, dims.heads, bias, dims.eps,
        hidden_dropout=dims.hidden_dropout, attn_dropout=dims.attn_dropout,
        rng=r1, train=train)
    return bert_ffn(params["ffn"], x, dims.eps,
                    hidden_dropout=dims.hidden_dropout, rng=r2, train=train)


# lax.scan unroll factor for every transformer stack (bert_stack,
# prenorm_stack, and the planner x-layer stacks, which read this at trace
# time). 1 = rolled (one compiled body). tools/exp_learn_bisect.py A/Bs
# full unroll on the fused learn step the way exp_scan_unroll.py did for
# the ViT (where straight-line blocks let XLA overlap weight DMA).
SCAN_UNROLL: int = 1


def bert_stack_init(key: jax.Array, num_layers: int, hidden: int,
                    intermediate: int) -> dict:
    """Stack num_layers of bert_layer params on a leading axis for scan."""
    keys = jax.random.split(key, num_layers)
    layers = [bert_layer_init(k, hidden, intermediate) for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def bert_stack(params: dict, x: jax.Array, bias: Optional[jax.Array],
               dims: BertDims, *, rng: Optional[jax.Array] = None,
               train: bool = False) -> jax.Array:
    """Run a scanned stack of post-norm BERT layers."""
    num_layers = jax.tree_util.tree_leaves(params)[0].shape[0]

    def body(h, xs):
        layer_params, layer_rng = xs
        h = bert_layer(layer_params, h, bias, dims, rng=layer_rng,
                       train=train)
        return h, None

    rngs = (jax.random.split(rng, num_layers) if rng is not None
            else jnp.zeros((num_layers, 2), jnp.uint32))
    if rng is None:
        def body_norng(h, layer_params):
            return bert_layer(layer_params, h, bias, dims, train=train), None
        x, _ = jax.lax.scan(body_norng, x, params, unroll=SCAN_UNROLL)
    else:
        x, _ = jax.lax.scan(body, x, (params, rngs), unroll=SCAN_UNROLL)
    return x


# ---------------------------------------------------------------------------
# Pre-norm transformer layer (pano encoder, common/transformer.py:170-182)
# ---------------------------------------------------------------------------

def prenorm_layer_init(key: jax.Array, hidden: int, intermediate: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    from etpnav_tpu.ops.attention import mha_init
    return {
        "attn": mha_init(k1, hidden),
        "norm1": ln_init(hidden),
        "norm2": ln_init(hidden),
        "linear1": linear_init(k2, hidden, intermediate),
        "linear2": linear_init(k3, intermediate, hidden),
    }


def prenorm_layer(params: dict, x: jax.Array, bias: Optional[jax.Array],
                  dims: BertDims, *, rng: Optional[jax.Array] = None,
                  train: bool = False) -> jax.Array:
    """x + MHA(LN1(x)); x + W2 drop(gelu(W1 LN2(x))).
    torch nn.MultiheadAttention uses LayerNorm eps 1e-5 here; dims.eps must
    be set accordingly by the caller (the final stack norm uses 1e-12)."""
    r1, r2, r3, r4 = _split4(rng)
    h = layer_norm(x, params["norm1"]["scale"], params["norm1"]["bias"],
                   dims.eps)
    h = mha(params["attn"], h, h, dims.heads, bias,
            attn_dropout=dims.attn_dropout, rng=r1, train=train)
    x = x + maybe_dropout(h, dims.hidden_dropout, r2, train)
    h = layer_norm(x, params["norm2"]["scale"], params["norm2"]["bias"],
                   dims.eps)
    h = gelu_erf(linear(params["linear1"], h))
    h = maybe_dropout(h, dims.hidden_dropout, r3, train)
    h = linear(params["linear2"], h)
    return x + maybe_dropout(h, dims.hidden_dropout, r4, train)


def prenorm_stack_init(key: jax.Array, num_layers: int, hidden: int,
                       intermediate: int) -> dict:
    keys = jax.random.split(key, num_layers)
    layers = [prenorm_layer_init(k, hidden, intermediate) for k in keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {"layers": stacked, "final_ln": ln_init(hidden)}


def prenorm_stack(params: dict, x: jax.Array, bias: Optional[jax.Array],
                  dims: BertDims, final_eps: float, *,
                  rng: Optional[jax.Array] = None,
                  train: bool = False) -> jax.Array:
    num_layers = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    if rng is None:
        def body(h, layer_params):
            return prenorm_layer(layer_params, h, bias, dims,
                                 train=train), None
        x, _ = jax.lax.scan(body, x, params["layers"], unroll=SCAN_UNROLL)
    else:
        rngs = jax.random.split(rng, num_layers)

        def body(h, xs):
            layer_params, layer_rng = xs
            return prenorm_layer(layer_params, h, bias, dims, rng=layer_rng,
                                 train=train), None
        x, _ = jax.lax.scan(body, x, (params["layers"], rngs),
                            unroll=SCAN_UNROLL)
    return layer_norm(x, params["final_ln"]["scale"],
                      params["final_ln"]["bias"], final_eps)


def _split(rng):
    if rng is None:
        return None, None
    return jax.random.split(rng)


def _split4(rng):
    if rng is None:
        return None, None, None, None
    return jax.random.split(rng, 4)
