"""Sharded perception: the fused perceive program (CLIP + depth +
waypoint + pano encoder) must compile and run under a dp(+mp) mesh with
per-device batch shards — the v5e-8 scaling path for the panoramas/s
north star (BASELINE.md: >=5x A100 on v5e-8). Batch elements are
independent, so dp sharding must be numerically exact."""

import functools

import jax
import numpy as np
import pytest

from etpnav_tpu.config import tiny_config
from etpnav_tpu.parallel import mesh as meshlib
from etpnav_tpu.training import agent as agent_lib


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = agent_lib.init_agent_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 8
    rgb = rng.integers(0, 256, (B, 12, cfg.clip.image_size,
                                cfg.clip.image_size, 3)).astype(np.uint8)
    depth = rng.random((B, 12, cfg.depth.input_size, cfg.depth.input_size,
                        1)).astype(np.float32)
    fn = jax.jit(functools.partial(agent_lib.perceive, cfg=cfg))
    ref = fn(params, rgb=rgb, depth=depth)
    return cfg, params, rgb, depth, fn, ref


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_perceive_on_mesh_matches_single_device(setup, dp, mp):
    cfg, params, rgb, depth, fn, ref = setup
    mesh = meshlib.make_mesh(dp=dp, mp=mp)
    p_sh = meshlib.shard_params(mesh, params)
    batch = meshlib.shard_batch(mesh, {"rgb": rgb, "depth": depth})
    out = fn(p_sh, rgb=batch["rgb"], depth=batch["depth"])
    np.testing.assert_allclose(
        np.asarray(out["avg_pano_embeds"]),
        np.asarray(ref["avg_pano_embeds"]),
        atol=1e-4 if mp > 1 else 1e-6)
    np.testing.assert_array_equal(np.asarray(out["cand_valid"]),
                                  np.asarray(ref["cand_valid"]))
