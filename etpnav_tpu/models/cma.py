"""Legacy CMA policy: cross-modal attention agent over low-level actions.

Capability target: the reference's legacy baseline path — the recurrent
CMA/VLN-BERT policy driven by dagger_trainer (SURVEY.md §2 rows 23-24:
models/vlnbert_PREVALENT.py + encoders/instruction_encoder.py:9) —
re-designed as a compact functional JAX model:

- instruction encoder: embedding + GRU over tokens (lax.scan)
- per-step: attend over instruction with the recurrent state, fuse with
  pooled RGB/depth features, GRU state update, 4-way action logits
  (STOP / FORWARD / TURN-LEFT / TURN-RIGHT).

Runs as one jitted step; the recurrent state is an explicit (B, H) array
carried by the trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from etpnav_tpu.ops.basic import (
    linear,
    linear_init,
    ln_init,
    layer_norm,
    trunc_normal,
)

NUM_LOW_ACTIONS = 4


@dataclasses.dataclass(frozen=True)
class CMAConfig:
    vocab_size: int = 30522
    embed_dim: int = 256
    hidden_dim: int = 512
    rgb_dim: int = 512
    depth_dim: int = 128
    pad_token_id: int = 0


def _gru_init(key: jax.Array, in_dim: int, hid: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "wi": linear_init(k1, in_dim, 3 * hid),
        "wh": linear_init(k2, hid, 3 * hid),
    }


def _gru_cell(params: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    hid = h.shape[-1]
    gi = linear(params["wi"], x)
    gh = linear(params["wh"], h)
    r = jax.nn.sigmoid(gi[..., :hid] + gh[..., :hid])
    z = jax.nn.sigmoid(gi[..., hid:2 * hid] + gh[..., hid:2 * hid])
    n = jnp.tanh(gi[..., 2 * hid:] + r * gh[..., 2 * hid:])
    return (1 - z) * n + z * h


def init_cma_params(key: jax.Array, cfg: CMAConfig) -> dict:
    keys = jax.random.split(key, 8)
    return {
        "embedding": trunc_normal(keys[0], (cfg.vocab_size, cfg.embed_dim)),
        "instr_gru": _gru_init(keys[1], cfg.embed_dim, cfg.hidden_dim),
        "visual_proj": linear_init(
            keys[2], cfg.rgb_dim + cfg.depth_dim, cfg.hidden_dim),
        "attn_q": linear_init(keys[3], cfg.hidden_dim, cfg.hidden_dim),
        "state_gru": _gru_init(keys[4], 2 * cfg.hidden_dim, cfg.hidden_dim),
        "state_ln": ln_init(cfg.hidden_dim),
        "action_head": linear_init(keys[5], cfg.hidden_dim,
                                   NUM_LOW_ACTIONS),
    }


def encode_instruction(params: dict, cfg: CMAConfig, tokens: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """(B, L) -> (B, L, H) GRU outputs + (B, L) mask."""
    mask = tokens != cfg.pad_token_id
    x = params["embedding"][tokens]

    def step(h, xt):
        h = _gru_cell(params["instr_gru"], xt, h)
        return h, h

    B = tokens.shape[0]
    h0 = jnp.zeros((B, params["instr_gru"]["wh"]["w"].shape[0]), x.dtype)
    _, outs = jax.lax.scan(step, h0, x.transpose(1, 0, 2))
    outs = outs.transpose(1, 0, 2) * mask[..., None]
    return outs, mask


def cma_step(params: dict, cfg: CMAConfig, instr_feats: jax.Array,
             instr_mask: jax.Array, rgb_feat: jax.Array,
             dep_feat: jax.Array, state: jax.Array
             ) -> Tuple[jax.Array, jax.Array]:
    """One recurrent decision: -> (logits (B,4), new_state (B,H))."""
    vis = jax.nn.relu(linear(params["visual_proj"],
                             jnp.concatenate([rgb_feat, dep_feat], -1)))
    # attention over instruction with current state as query
    q = linear(params["attn_q"], state)                        # (B, H)
    scores = jnp.einsum("bh,blh->bl", q, instr_feats) \
        / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.where(instr_mask, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    instr_ctx = jnp.einsum("bl,blh->bh", attn, instr_feats)

    x = jnp.concatenate([vis, instr_ctx], -1)
    new_state = _gru_cell(params["state_gru"], x, state)
    new_state = layer_norm(new_state, params["state_ln"]["scale"],
                           params["state_ln"]["bias"], 1e-6)
    logits = linear(params["action_head"], new_state)
    return logits, new_state


def initial_state(cfg: CMAConfig, batch: int) -> jax.Array:
    return jnp.zeros((batch, cfg.hidden_dim))


# ---------------------------------------------------------------------------
# Habitat-lineage instruction encoder (encoders/instruction_encoder.py:9-101)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class InstructionEncoderConfig:
    """Mirrors the reference InstructionEncoder config surface
    (instruction_encoder.py:14-20): GRU/LSTM over GloVe-style embeddings
    (R2R) or precomputed per-token features (RxR)."""

    vocab_size: int = 2504       # R2R vocab in the VLN-CE lineage
    embedding_size: int = 50     # GloVe-50
    hidden_size: int = 128
    rnn_type: str = "LSTM"       # 'GRU' | 'LSTM'
    bidirectional: bool = True
    final_state_only: bool = False
    sensor_uuid: str = "instruction"   # or 'rxr_instruction'

    @property
    def output_size(self) -> int:
        """instruction_encoder.py:49-51."""
        return self.hidden_size * (1 + int(self.bidirectional))


def load_pretrained_embeddings(path: str) -> jax.Array:
    """gzip-JSON embedding table (instruction_encoder.py:53-63): row 0 is
    PAD (zeros), row 1 UNK (mean of all rows)."""
    import gzip
    import json
    with gzip.open(path, "rt") as f:
        return jnp.asarray(json.load(f), jnp.float32)


def _lstm_init(key: jax.Array, in_dim: int, hid: int) -> dict:
    k1, k2 = jax.random.split(key)
    # torch LSTM gate order (i, f, g, o) for convertibility
    return {"wi": linear_init(k1, in_dim, 4 * hid),
            "wh": linear_init(k2, hid, 4 * hid)}


def _lstm_cell(params: dict, x: jax.Array, h: jax.Array, c: jax.Array):
    hid = h.shape[-1]
    g = linear(params["wi"], x) + linear(params["wh"], h)
    i = jax.nn.sigmoid(g[..., :hid])
    f = jax.nn.sigmoid(g[..., hid:2 * hid])
    gg = jnp.tanh(g[..., 2 * hid:3 * hid])
    o = jax.nn.sigmoid(g[..., 3 * hid:])
    c = f * c + i * gg
    return o * jnp.tanh(c), c


def init_instruction_encoder(key: jax.Array, cfg: InstructionEncoderConfig,
                             embedding_weights: jax.Array | None = None
                             ) -> dict:
    """embedding_weights: optional pretrained (frozen GloVe) table
    (instruction_encoder.py:35-40); ignored for the RxR feature sensor."""
    k1, k2, k3 = jax.random.split(key, 3)
    rnn_init = _lstm_init if cfg.rnn_type == "LSTM" else _gru_init
    params = {"fwd": rnn_init(k2, cfg.embedding_size, cfg.hidden_size)}
    if cfg.bidirectional:
        params["bwd"] = rnn_init(k3, cfg.embedding_size, cfg.hidden_size)
    if cfg.sensor_uuid == "instruction":
        params["embedding"] = (
            embedding_weights if embedding_weights is not None
            else trunc_normal(k1, (cfg.vocab_size, cfg.embedding_size)))
    return params


def _run_rnn(params: dict, cfg: InstructionEncoderConfig, x: jax.Array,
             lengths: jax.Array, reverse: bool):
    """Masked scan replicating pack_padded_sequence semantics: the state
    only advances on valid steps, outputs are zero past each sequence's
    length, and the returned final state is the state at the last valid
    step (instruction_encoder.py:84-91)."""
    B, L, _ = x.shape
    hid = cfg.hidden_size
    is_lstm = cfg.rnn_type == "LSTM"

    def step(carry, xs):
        xt, valid = xs
        if is_lstm:
            h, c = carry
            nh, nc = _lstm_cell(params, xt, h, c)
            h = jnp.where(valid[:, None], nh, h)
            c = jnp.where(valid[:, None], nc, c)
            out = jnp.where(valid[:, None], nh, 0.0)
            return (h, c), out
        h = carry
        nh = _gru_cell(params, xt, h)
        h = jnp.where(valid[:, None], nh, h)
        return h, jnp.where(valid[:, None], nh, 0.0)

    valid = jnp.arange(L)[None] < lengths[:, None]     # (B, L)
    xs = (x.transpose(1, 0, 2), valid.T)
    carry0 = ((jnp.zeros((B, hid), x.dtype),) * 2 if is_lstm
              else jnp.zeros((B, hid), x.dtype))
    carry, outs = jax.lax.scan(step, carry0, xs, reverse=reverse)
    final = carry[0] if is_lstm else carry
    return outs.transpose(1, 0, 2), final


def encode_instruction_rnn(params: dict, cfg: InstructionEncoderConfig,
                           observations: dict):
    """observations['instruction'] (B, L) int tokens, or
    observations['rxr_instruction'] (B, L, embedding_size) features.

    Returns final state (B, output_size) when final_state_only, else
    (ctx (B, L, output_size), pad_mask (B, L) True at padding) —
    matching the reference's (ctx, all_lang_masks) contract
    (instruction_encoder.py:93-101).
    """
    if cfg.sensor_uuid == "instruction":
        tokens = observations["instruction"].astype(jnp.int32)
        lengths = (tokens != 0).sum(-1)
        x = params["embedding"][tokens]
    else:
        x = observations["rxr_instruction"]
        lengths = ((x != 0.0).sum(-1) != 0).sum(-1)
    out_f, fin_f = _run_rnn(params["fwd"], cfg, x, lengths, reverse=False)
    if cfg.bidirectional:
        out_b, fin_b = _run_rnn(params["bwd"], cfg, x, lengths,
                                reverse=True)
        ctx = jnp.concatenate([out_f, out_b], -1)
        final = jnp.concatenate([fin_f, fin_b], -1)
    else:
        ctx, final = out_f, fin_f
    if cfg.final_state_only:
        return final
    pad_mask = jnp.arange(ctx.shape[1])[None] >= lengths[:, None]
    return ctx, pad_mask
