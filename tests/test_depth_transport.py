"""uint16 depth transport (ILConfig.depth_transport_uint16): the host
quantizes [0,1] depth to uint16, agent.encode_panorama dequantizes on
device. Halves depth upload bytes on remote-accelerator rigs; math must
match the fp32 path to within the 1/65535 quantization step."""

import dataclasses
import functools

import jax
import numpy as np

from etpnav_tpu.config import tiny_config
from etpnav_tpu.training import agent as agent_lib


def test_uint16_perceive_matches_fp32():
    cfg = tiny_config()
    params = agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 2
    rgb = rng.integers(0, 256, (B, 12, cfg.clip.image_size,
                                cfg.clip.image_size, 3)).astype(np.uint8)
    depth = rng.random((B, 12, cfg.depth.input_size, cfg.depth.input_size,
                        1)).astype(np.float32)
    q = (np.clip(depth, 0.0, 1.0) * 65535.0 + 0.5).astype(np.uint16)
    assert np.abs(q.astype(np.float32) / 65535.0 - depth).max() \
        <= 0.5 / 65535.0 + 1e-7

    fn = jax.jit(functools.partial(agent_lib.perceive, cfg=cfg))
    ref = fn(params, rgb=rgb, depth=depth)
    out = fn(params, rgb=rgb, depth=q)
    np.testing.assert_allclose(np.asarray(out["avg_pano_embeds"]),
                               np.asarray(ref["avg_pano_embeds"]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["dep_fts"]),
                               np.asarray(ref["dep_fts"]), atol=5e-3)


def test_rollout_engine_quantizes_depth():
    """The flagged rollout must run end to end (train interval) and the
    quantized program must produce the same candidate stream as fp32 at
    this tolerance-insensitive discrete level."""
    from etpnav_tpu.env.geometric import GeometricNavEnv
    from etpnav_tpu.training.finetune import FinetuneTrainer

    def make_trainer(u16):
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, il=dataclasses.replace(cfg.il, depth_transport_uint16=u16,
                                        max_traj_len=3))
        envs = GeometricNavEnv(
            num_envs=2, seed=0, vocab_size=cfg.planner.vocab_size,
            max_instr_len=cfg.il.max_text_len,
            image_size=cfg.clip.image_size,
            depth_size=cfg.depth.input_size,
            pad_id=cfg.planner.pad_token_id)
        return FinetuneTrainer(cfg, envs, seed=0)

    logs16 = make_trainer(True).train(1)
    logs32 = make_trainer(False).train(1)
    assert np.isfinite(logs16["IL_loss"])
    # quantization shifts logits by <<1e-2; the sampled trajectory and
    # therefore the loss should agree closely on a 1-iteration run
    assert abs(logs16["IL_loss"] - logs32["IL_loss"]) < 5e-2
