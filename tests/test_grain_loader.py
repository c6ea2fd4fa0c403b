"""ArrayRecord + grain multi-host input pipeline (SURVEY.md §2 row 31):
rank sharding, per-epoch task randomness, MetaLoader-parity task mixing."""

import numpy as np
import pytest

gp = pytest.importorskip("grain.python")

from etpnav_tpu.data.grain_loader import (
    GrainMetaLoader,
    build_task_loader,
    decode_record,
    encode_record,
    write_task_records,
)
from etpnav_tpu.data.pretrain_data import PretrainSampler, PretrainShapes

SHAPES = PretrainShapes(
    max_txt_len=16, max_traj_steps=4, num_views=12, max_cands=4,
    max_gmap_len=24, image_feat_size=32, depth_feat_size=16,
    vocab_size=512, mask_token_id=3, mask_vocab_range=(10, 500),
    image_prob_size=8, num_objs=2)


@pytest.fixture(scope="module")
def record_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("records")
    s = PretrainSampler(SHAPES, seed=0, num_scans=2, scan_size=12)
    for task in ("mlm", "sap", "mrc", "og"):
        write_task_records(str(d / f"{task}.array_record"), s, task, 16)
    return d


def test_record_roundtrip():
    s = PretrainSampler(SHAPES, seed=1, num_scans=2, scan_size=12)
    w, traj = s._sample_traj()
    sample, _ = s._assemble(w, traj)
    out = decode_record(encode_record(sample))
    assert set(out) == set(sample)
    for k in sample:
        np.testing.assert_array_equal(out[k], np.asarray(sample[k]))


def test_sap_loader_batches_and_sharding(record_dir):
    files = [str(record_dir / "sap.array_record")]
    seen = []
    for shard in range(2):
        dl = build_task_loader(
            files, "sap", SHAPES, batch_size=4, seed=7, num_epochs=1,
            shard_options=gp.ShardOptions(shard_index=shard, shard_count=2,
                                          drop_remainder=True))
        for batch in dl:
            assert batch["vp_img"].shape == (4, 4, SHAPES.tokens_per_step,
                                             32)
            assert batch["txt_masks"].dtype == bool
            assert "global_act_labels" in batch
            seen.append(batch["txt_ids"])
    # two shards of 8 records each -> 4 batches of 4, no overlap
    allrows = np.concatenate(seen, axis=0)
    assert allrows.shape[0] == 16
    assert len({r.tobytes() for r in allrows}) == 16


def test_mlm_masking_differs_across_epochs(record_dir):
    files = [str(record_dir / "mlm.array_record")]
    def epoch_rows(seed):
        dl = build_task_loader(
            files, "mlm", SHAPES, batch_size=4, seed=seed, num_epochs=1,
            shuffle=False,
            shard_options=gp.NoSharding())
        return np.concatenate([b["txt_ids"] for b in dl], axis=0), \
            np.concatenate([b["txt_labels"] for b in dl], axis=0)
    ids1, lab1 = epoch_rows(1)
    ids2, lab2 = epoch_rows(2)
    assert (lab1 >= 0).any()
    assert not np.array_equal(ids1, ids2)   # fresh masks per seed/epoch


def test_mrc_loader_semantics(record_dir):
    files = [str(record_dir / "mrc.array_record")]
    dl = build_task_loader(
        files, "mrc", SHAPES, batch_size=4, seed=3, num_epochs=1,
        shard_options=gp.NoSharding())
    batch = next(iter(dl))
    P = SHAPES.tokens_per_step
    assert batch["vp_view_mrc_masks"].shape == (4, P)
    assert batch["vp_view_probs"].shape == (4, P, 8)
    for i in range(4):
        m = batch["vp_view_mrc_masks"][i]
        t = int(batch["last_step"][i])
        assert m.any()
        np.testing.assert_array_equal(batch["vp_img"][i, t][m], 0.0)
        # soft labels only on view tokens, and they are distributions
        is_view = batch["vp_view_probs"][i].sum(-1) > 0
        assert is_view[m].all()
        np.testing.assert_allclose(
            batch["vp_view_probs"][i][is_view].sum(-1), 1.0, atol=1e-5)


def test_og_loader_labels(record_dir):
    files = [str(record_dir / "og.array_record")]
    dl = build_task_loader(
        files, "og", SHAPES, batch_size=4, seed=3, num_epochs=1,
        shard_options=gp.NoSharding())
    batch = next(iter(dl))
    base = 1 + SHAPES.num_view_tokens
    assert ((batch["obj_labels"] >= base)
            & (batch["obj_labels"] < base + SHAPES.num_objs)).all()


def test_iterator_checkpoint_resume(record_dir):
    """grain DataLoaderIterator state round-trips: a crashed pretrain can
    resume the input stream mid-epoch (the model-side counterpart is
    PretrainTrainer.resume_latest)."""
    dl = build_task_loader(
        [str(record_dir / "sap.array_record")], "sap", SHAPES,
        batch_size=2, seed=1, shard_options=gp.NoSharding())
    it = iter(dl)
    next(it), next(it)
    state = it.get_state()
    b3 = next(it)
    it2 = iter(dl)
    it2.set_state(state)
    b3b = next(it2)
    np.testing.assert_array_equal(b3["txt_ids"], b3b["txt_ids"])
    np.testing.assert_array_equal(b3["gmap_pos_fts"], b3b["gmap_pos_fts"])


def test_meta_loader_shared_seed_agreement(record_dir):
    def make():
        loaders = {
            t: build_task_loader(
                [str(record_dir / f"{t}.array_record")], t, SHAPES,
                batch_size=2, seed=5, shard_options=gp.NoSharding())
            for t in ("mlm", "sap", "mrc", "og")}
        return GrainMetaLoader(loaders, (1.0, 1.0, 1.0, 1.0), seed=11)
    a, b = make(), make()
    seq_a = [next(a)[0] for _ in range(16)]
    seq_b = [next(b)[0] for _ in range(16)]
    assert seq_a == seq_b              # hosts agree without a collective
    assert len(set(seq_a)) >= 3        # and it actually mixes
