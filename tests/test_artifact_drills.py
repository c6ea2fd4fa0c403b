"""One-command drills for the three environment-blocked real-artifact
gates (released checkpoints, MP3D HDF5 stores, habitat-sim). The real
artifacts are absent from this image, so CI proves each drill's plumbing
end-to-end on synthesized files in the EXACT released layouts — when the
artifacts appear, the documented command works first try.

Drills:
1. tools/verify_goldens.py at full r2r dims against synthesized
   released-layout checkpoint files for the planner (pretrain `bert.*`
   AND finetune `net.module.vln_bert.*` layouts) + waypoint
   (`module.predictor.*`), with reference activations computed by the
   exact-naming torch transcriptions. Includes a corrupted-weight
   negative case proving the drill detects mismatches.
2. ddppo depth: the raw released wrapping
   ({'state_dict': {'actor_critic.net.visual_encoder.*'}},
   resnet_encoders.py:37-50 surgery) through convert_cli with forward
   parity against the torch model.
3. MP3D store validation CLI (data/mp3d_pretrain.check_store) over
   synthetic artifacts in the reference file layouts, plus its loud
   failures on broken stores.

The habitat real-sim smoke lives in test_habitat_smoke.py (-m habitat).
"""

import dataclasses
import importlib.util
import json
import os

import numpy as np
import pytest
import torch

from etpnav_tpu.config import PlannerConfig, WaypointConfig, r2r_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# drill 1: verify_goldens end-to-end at full r2r dims
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def goldens_setup(tmp_path_factory):
    """Synthesized released-layout files + reference activations computed
    with the exact-naming torch transcriptions at FULL r2r dims."""
    from test_released_layout_roundtrip import TorchNavCMT, TorchTRM

    tmp = tmp_path_factory.mktemp("goldens_drill")
    capture = _load_tool("capture_goldens")

    pcfg = dataclasses.replace(r2r_config().planner, use_bf16=False,
                               hidden_dropout=0.0, attn_dropout=0.0)
    torch.manual_seed(0)
    model = TorchNavCMT(pcfg).eval()

    # released pretrain layout: backbone under 'bert.', sap head at top
    # level (vlnbert_init.py:21-30)
    sd = model.state_dict()
    pretrain_sd = {k if k.startswith("global_sap_head.") else "bert." + k: v
                   for k, v in sd.items()}
    pretrain_ckpt = str(tmp / "model_step_82500.pt")
    torch.save(pretrain_sd, pretrain_ckpt)
    # released finetune layout: {'state_dict': {'net.module.vln_bert.*'}}
    # (ss_trainer_ETP.py:74-83,211-212)
    finetune_ckpt = str(tmp / "ckpt.iter12000.pth")
    torch.save({"state_dict": {f"net.module.vln_bert.{k}": v
                               for k, v in sd.items()}}, finetune_ckpt)

    wcfg = WaypointConfig(hidden_dropout=0.0, attn_dropout=0.0)
    torch.manual_seed(1)
    wp_model = TorchTRM(wcfg).eval()
    waypoint_ckpt = str(tmp / "check_cwp_bestdist_hfov90")
    torch.save({f"module.predictor.{k}": v
                for k, v in wp_model.state_dict().items()}, waypoint_ckpt)

    # reference activations over the capture_goldens probe set
    probes = capture.make_probes(seed=0)
    goldens = str(tmp / "goldens")
    os.makedirs(goldens)
    np.savez(os.path.join(goldens, "probes.npz"), **probes)
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in probes.items()}
    view_mask = (np.arange(probes["rgb_fts"].shape[1])[None]
                 < probes["view_len"][:, None])
    with torch.no_grad():
        txt = model.forward_txt(t["txt_ids"], t["txt_mask"])
        pano = model.forward_panorama(
            t["rgb_fts"], t["dep_fts"], t["loc_fts"], t["nav_types"],
            torch.from_numpy(view_mask))
        _, logits = model.forward_navigation(
            txt, t["txt_mask"], t["gmap_img_fts"], t["gmap_step_ids"],
            t["gmap_pos_fts"], t["gmap_mask"], t["gmap_visited"],
            t["gmap_pair_dists"])
        hm = wp_model(t["depth_feats"])
    np.savez(os.path.join(goldens, "reference_activations.npz"),
             txt_embeds=txt.numpy(), pano_embeds=pano.numpy(),
             global_logits=logits.numpy(), waypoint_heatmap=hm.numpy())
    return goldens, pretrain_ckpt, finetune_ckpt, waypoint_ckpt


def test_verify_goldens_drill_pretrain_layout(goldens_setup, capsys):
    goldens, pretrain_ckpt, _, waypoint_ckpt = goldens_setup
    vg = _load_tool("verify_goldens")
    assert vg.verify(goldens, pretrain_ckpt, waypoint_ckpt) is True
    out = capsys.readouterr().out
    assert "FAIL" not in out and "OK" in out


def test_verify_goldens_drill_finetune_layout(goldens_setup):
    goldens, _, finetune_ckpt, waypoint_ckpt = goldens_setup
    vg = _load_tool("verify_goldens")
    assert vg.verify(goldens, finetune_ckpt, waypoint_ckpt) is True


def test_verify_goldens_drill_detects_corruption(goldens_setup, tmp_path):
    """A perturbed weight must flip the drill to FAIL — otherwise a
    green run proves nothing."""
    goldens, pretrain_ckpt, _, waypoint_ckpt = goldens_setup
    sd = torch.load(pretrain_ckpt, map_location="cpu")
    key = next(k for k in sd if k.endswith("sprel_linear.weight"))
    sd[key] = sd[key] + 0.05
    bad = str(tmp_path / "corrupt.pt")
    torch.save(sd, bad)
    vg = _load_tool("verify_goldens")
    assert vg.verify(goldens, bad, waypoint_ckpt) is False


# ---------------------------------------------------------------------------
# drill 2: raw released ddppo depth artifact wrapping
# ---------------------------------------------------------------------------

def test_ddppo_raw_released_layout(tmp_path, rng):
    """gibson-2plus-resnet50.pth layout: {'state_dict':
    {'actor_critic.net.visual_encoder.*'}} must convert through
    convert_cli's key surgery (resnet_encoders.py:37-50 equivalent) with
    forward parity against the torch model."""
    import jax.numpy as jnp

    from test_encoders import _TorchDepthEncoder, _torch_to_ref_state_dict

    from etpnav_tpu import convert_cli
    from etpnav_tpu.config import DepthEncoderConfig
    from etpnav_tpu.models import depth_resnet

    cfg = DepthEncoderConfig(input_size=32, baseplanes=8, ngroups=4,
                             layers=(1, 1, 1, 1), output_size=16)
    torch.manual_seed(2)
    model = _TorchDepthEncoder(cfg).eval()
    sd = _torch_to_ref_state_dict(model, cfg)
    raw = {"state_dict": {
        f"actor_critic.net.visual_encoder.{k}": torch.from_numpy(
            np.asarray(v)) for k, v in sd.items()}}
    path = str(tmp_path / "gibson-2plus-resnet50.pth")
    torch.save(raw, path)

    stripped = convert_cli.load_torch_state_dict(path, "depth")
    params = depth_resnet.convert_ddppo_depth(stripped, cfg)
    depth = rng.random((2, cfg.input_size, cfg.input_size, 1)).astype(
        np.float32)
    ours = np.asarray(depth_resnet.encode_depth(
        params, cfg, jnp.asarray(depth), dtype=jnp.float32))
    with torch.no_grad():
        theirs = model(torch.from_numpy(depth.transpose(0, 3, 1, 2))
                       ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


# ---------------------------------------------------------------------------
# drill 3: MP3D store validation CLI
# ---------------------------------------------------------------------------

def test_mp3d_check_store_reports(tmp_path, capsys):
    from test_vector_env import _mp3d_artifacts, _mp3d_shapes

    from etpnav_tpu.data.mp3d_pretrain import check_store

    sh = _mp3d_shapes()
    _mp3d_artifacts(tmp_path, sh, img_cols=sh.image_feat_size)
    summary = check_store(
        [str(tmp_path / "anno.json")], str(tmp_path / "img.h5"),
        str(tmp_path / "dep.h5"), str(tmp_path), shapes=sh)
    assert summary["annotations"] == 2
    assert summary["scans"] == 1
    assert summary["tasks"] == ["mlm", "sap"]
    assert not summary["mrc_capable"]
    assert summary["sample_batch_shapes"]["sap"]["vp_img"][0] == 2
    # the printed line is machine-readable
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["annotations"] == 2


def test_mp3d_check_store_mrc_capable(tmp_path):
    from test_vector_env import _mp3d_artifacts, _mp3d_shapes

    from etpnav_tpu.data.mp3d_pretrain import check_store

    sh = _mp3d_shapes(image_prob_size=4)
    _mp3d_artifacts(tmp_path, sh,
                    img_cols=sh.image_feat_size + sh.image_prob_size)
    summary = check_store(
        [str(tmp_path / "anno.json")], str(tmp_path / "img.h5"),
        str(tmp_path / "dep.h5"), str(tmp_path), shapes=sh)
    assert summary["mrc_capable"]
    assert "mrc" in summary["tasks"]


def test_mp3d_check_store_loud_failures(tmp_path):
    import h5py

    from test_vector_env import _mp3d_artifacts, _mp3d_shapes

    from etpnav_tpu.data.mp3d_pretrain import check_store

    sh = _mp3d_shapes()
    _mp3d_artifacts(tmp_path, sh, img_cols=sh.image_feat_size)
    # missing connectivity for the referenced scan
    bad_conn = tmp_path / "empty_conn"
    bad_conn.mkdir()
    with pytest.raises(FileNotFoundError, match="connectivity"):
        check_store([str(tmp_path / "anno.json")],
                    str(tmp_path / "img.h5"), str(tmp_path / "dep.h5"),
                    str(bad_conn), shapes=sh, sample=False)
    # store missing a referenced viewpoint row
    broken = tmp_path / "broken.h5"
    with h5py.File(tmp_path / "img.h5", "r") as src, \
            h5py.File(broken, "w") as dst:
        for k in list(src.keys())[1:]:
            dst.create_dataset(k, data=src[k][...])
    with pytest.raises(KeyError, match="missing"):
        check_store([str(tmp_path / "anno.json")], str(broken),
                    str(tmp_path / "dep.h5"), str(tmp_path), shapes=sh,
                    sample=False)
