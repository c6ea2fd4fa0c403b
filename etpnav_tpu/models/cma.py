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
