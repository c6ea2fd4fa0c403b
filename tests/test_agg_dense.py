"""IL.agg_dense_device: the on-device dense aggregation-matrix rebuild
(training/finetune.py dense_w_from_sparse) must reproduce the sparse
provenance path's math. The variant exists so the learn step's
d(pano tokens) can be one MXU matmul instead of the gather transpose's
scatter-add (tools/exp_learn_bwd.py A/B; VERDICT r4 weak #1).
"""

import dataclasses
import importlib.util
import os

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        f"_tools_{name}", os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_etb = _load_tool("exp_train_bench")


def _tiny_setup(B=2):
    from etpnav_tpu.config import tiny_config
    cfg = tiny_config()
    host = _etb.synth_batch(cfg, B, rng=0)
    return cfg, host


def test_dense_w_matches_numpy_reference():
    """Device W == the numpy dense_from_sparse used for the legacy
    dense-path A/B (same provenance semantics, independent code)."""
    from etpnav_tpu.training.finetune import dense_w_from_sparse
    cfg, host = _tiny_setup()
    P = cfg.waypoint.max_predictions + 12
    w_np = _etb.dense_from_sparse(host, P)
    batch = {k: jax.numpy.asarray(v) for k, v in host.items()}
    w_dev = np.asarray(dense_w_from_sparse(batch, P))
    np.testing.assert_allclose(w_dev, w_np, atol=1e-6)


def test_replay_logits_parity_sparse_vs_dense_device():
    """train=False replay logits agree between the sparse gather path
    and the dense-device path (different fp32 summation order -> loose
    tolerance, same math)."""
    from etpnav_tpu.models.planner import init_planner_params
    from etpnav_tpu.training.finetune import replay_logits
    cfg, host = _tiny_setup()
    params = init_planner_params(jax.random.PRNGKey(0), cfg.planner)
    batch = {k: jax.numpy.asarray(v) for k, v in host.items()}
    lg_sparse = np.asarray(
        replay_logits(params, cfg, batch, None, train=False))
    cfg_d = dataclasses.replace(
        cfg, il=dataclasses.replace(cfg.il, agg_dense_device=True))
    lg_dense = np.asarray(
        replay_logits(params, cfg_d, batch, None, train=False))
    finite = np.isfinite(lg_sparse)
    assert (finite == np.isfinite(lg_dense)).all()
    np.testing.assert_allclose(lg_dense[finite], lg_sparse[finite],
                               rtol=0.05, atol=0.05)


def test_remat_policy_knob():
    """PlannerConfig.remat_policy names a jax.checkpoint_policies
    attribute; the x-stack must run (and differentiate) under it."""
    import jax.numpy as jnp
    from etpnav_tpu.models.planner import (forward_navigation,
                                           init_planner_params)
    from etpnav_tpu.config import tiny_config
    cfg = tiny_config()
    p = dataclasses.replace(
        cfg.planner, remat_scan=True,
        remat_policy="dots_with_no_batch_dims_saveable")
    params = init_planner_params(jax.random.PRNGKey(0), p)
    B, G, L, D = 2, p.max_gmap_len, p.max_txt_len, p.hidden_size
    g = np.random.default_rng(0)
    args = (jnp.asarray(g.standard_normal((B, L, D)), jnp.float32),
            jnp.ones((B, L), bool),
            jnp.asarray(g.standard_normal((B, G, D)), jnp.float32),
            jnp.zeros((B, G), jnp.int32),
            jnp.asarray(g.standard_normal((B, G, 7)), jnp.float32),
            jnp.ones((B, G), bool), jnp.zeros((B, G), bool),
            jnp.asarray(abs(g.standard_normal((B, G, G))), jnp.float32))

    def loss(params_):
        out = forward_navigation(params_, p, *args,
                                 rng=jax.random.PRNGKey(1), train=True)
        lg = out["global_logits"]
        return jnp.where(jnp.isfinite(lg), lg, 0.0).sum()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gnorm = sum(float((x.astype(np.float32) ** 2).sum())
                for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
