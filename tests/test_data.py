"""Data pipeline tests on tiny synthetic on-disk dataset trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from stswincl_tpu.data import (
    EndovisDataset,
    CadisDataset,
    ContrastiveClipDataset,
    Loader,
    SyntheticSegDataset,
)
from stswincl_tpu.data.endovis18 import clip_frame_indices
from stswincl_tpu.data.contrastive import anchor_clip_indices, neg_clip_indices
from stswincl_tpu.data.cadis import remap_experiment, CADIS_CLASS_NUM


# ---------------- clip index logic (vs reference semantics) ----------------

def test_clip_indices_normal_and_fallback():
    assert clip_frame_indices(10, 4) == [7, 8, 9, 10]
    # future-frame fallback, reversed (Endovis2018_new.py:119-124)
    assert clip_frame_indices(2, 4) == [5, 4, 3, 2]
    assert clip_frame_indices(0, 4) == [3, 2, 1, 0]


def test_anchor_clip_indices():
    assert anchor_clip_indices(10) == [7, 8, 9, 10]
    # fallback: frame=0 -> prevs [3,2,1], anchor 4 (dataset.py:83-98)
    assert anchor_clip_indices(0) == [1, 2, 3, 4]
    assert neg_clip_indices(0) == [0, 1, 2, 3]
    assert neg_clip_indices(10) == [7, 8, 9, 10]


# ---------------- synthetic on-disk trees ----------------

@pytest.fixture
def endovis_tree(tmp_path):
    root = tmp_path / "ead2018"
    colors = [[i * 20, i * 10, i * 5] for i in range(12)]
    (root / "train").mkdir(parents=True)
    with open(root / "train" / "labels.json", "w") as f:
        json.dump([{"color": c} for c in colors], f)
    rng = np.random.default_rng(7)
    for split, seqs, n in [("Processed_train", [1, 2, 3, 4, 5], 8),
                           ("Processed_test", [1, 2], 6)]:
        for s in seqs:
            imdir = root / split / f"seq_{s}" / "left_frames"
            lbdir = root / split / f"seq_{s}" / "labels"
            imdir.mkdir(parents=True)
            lbdir.mkdir(parents=True)
            for i in range(n):
                img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
                Image.fromarray(img).save(imdir / f"frame{i:03d}.png")
                lab = rng.integers(0, 12, (64, 80), dtype=np.uint8)
                Image.fromarray(lab).save(lbdir / f"grayframe{i:03d}.png")
    # full-res test RGB labels
    for s in [1, 2]:
        lbdir = root / "test" / f"seq_{s}" / "labels"
        lbdir.mkdir(parents=True)
        for i in range(6):
            ids = rng.integers(0, 12, (128, 160), dtype=np.uint8)
            rgb = np.array(colors, dtype=np.uint8)[ids]
            Image.fromarray(rgb).save(lbdir / f"frame{i:03d}.png")
    return str(root)


def test_endovis_train_sample(endovis_tree):
    ds = EndovisDataset(endovis_tree, "train", t=4, crop_hw=(32, 40),
                        base_hw=(36, 42), sequences=[1, 2, 3, 4, 5],
                        frames_per_seq={s: 8 for s in [1, 2, 3, 4, 5]})
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["image"].shape == (4, 32, 40, 3)
    assert s["image"].dtype == np.float32
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert s["label"].shape == (32, 40)
    assert s["label"].max() < 12

    # determinism: same rng seed -> same sample
    s2 = ds.get(0, np.random.default_rng(0))
    np.testing.assert_array_equal(s["image"], s2["image"])
    np.testing.assert_array_equal(s["label"], s2["label"])


def test_endovis_test_sample_color_decode(endovis_tree):
    ds = EndovisDataset(endovis_tree, "test", t=4, crop_hw=(32, 40),
                        sequences=[1, 2], frames_per_seq={1: 6, 2: 6})
    s = ds.get(0)
    assert s["image"].shape == (4, 32, 40, 3)
    assert s["label"].shape == (128, 160)  # original resolution
    assert set(np.unique(s["label"])).issubset(set(range(12)))


@pytest.fixture
def cadis_tree(tmp_path):
    root = tmp_path / "CaDISv2"
    rng = np.random.default_rng(3)
    for vid in [1, 3, 2]:
        imdir = root / f"Video{vid:02d}" / "Images"
        lbdir = root / f"Video{vid:02d}" / "Labels"
        imdir.mkdir(parents=True)
        lbdir.mkdir(parents=True)
        for i in range(6):
            img = rng.integers(0, 255, (54, 96, 3), dtype=np.uint8)
            Image.fromarray(img).save(imdir / f"frame{i:04d}.png")
            lab = rng.integers(0, 36, (54, 96), dtype=np.uint8)
            Image.fromarray(lab).save(lbdir / f"frame{i:04d}.png")
    return str(root)


def test_cadis_remap_tables():
    mask = np.arange(36).reshape(6, 6).astype(np.uint8)
    r1 = remap_experiment(mask, "1")
    assert r1.max() == 7  # everything >= 7 merges to Instrument
    r2 = remap_experiment(mask, "2")
    assert set(np.unique(r2)).issubset(set(range(17)) | {255})
    assert r2[25 // 6, 25 % 6] == 255  # rare class -> ignore
    r3 = remap_experiment(mask, "3")
    assert r3[30 // 6, 30 % 6] == 255
    assert r3[24 // 6, 24 % 6] == 24


def test_cadis_train_sample(cadis_tree):
    ds = CadisDataset(cadis_tree, "train", tag="2", t=4, crop_hw=(32, 40),
                      base_hw=(36, 48), videos=[1, 3])
    s = ds.get(5, np.random.default_rng(1))
    assert s["image"].shape == (4, 32, 40, 3)
    # normalized with CenterNet stats -> values outside [0,1]
    assert s["image"].min() < 0
    cn = CADIS_CLASS_NUM["2"]
    assert s["label"].max() <= cn - 1  # 255 remapped to class_num-1


def test_contrastive_views(endovis_tree):
    ds = ContrastiveClipDataset(
        endovis_tree, "endovis18", crop_hw=(32, 48), src_wh=(80, 64),
        sequences=[1, 2, 3, 4, 5], frames_per_seq={s: 8 for s in [1, 2, 3, 4, 5]})
    s = ds.get(6, np.random.default_rng(2))
    assert s["clips"].shape == (6, 4, 32, 48, 3)
    assert s["labels"].shape == (6, 32, 48)
    assert s["coords"].shape == (6, 4)
    # views 0 and 1 come from the same clip but different crops
    assert not np.allclose(s["clips"][0], s["clips"][1])
    # determinism
    s2 = ds.get(6, np.random.default_rng(2))
    np.testing.assert_array_equal(s["clips"], s2["clips"])


def test_contrastive_views_rand_augment(endovis_tree):
    """rand_augment config wires ClipRandAugment into the view pipeline:
    deterministic, shape-preserving, and actually changes pixels."""
    kw = dict(crop_hw=(32, 48), src_wh=(80, 64), sequences=[1, 2, 3, 4, 5],
              frames_per_seq={s: 8 for s in [1, 2, 3, 4, 5]})
    base = ContrastiveClipDataset(endovis_tree, "endovis18", **kw)
    aug = ContrastiveClipDataset(endovis_tree, "endovis18",
                                 rand_augment="rand-m9-n2", **kw)
    s_aug = aug.get(6, np.random.default_rng(2))
    assert s_aug["clips"].shape == (6, 4, 32, 48, 3)
    s_aug2 = aug.get(6, np.random.default_rng(2))
    np.testing.assert_array_equal(s_aug["clips"], s_aug2["clips"])
    # over several samples, some draw must modify the view
    changed = any(
        not np.allclose(aug.get(i, np.random.default_rng(i))["clips"],
                        base.get(i, np.random.default_rng(i))["clips"])
        for i in range(4))
    assert changed


def test_loader_batching_and_sharding():
    ds = SyntheticSegDataset(length=16, t=2, hw=(32, 32), num_classes=5)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    assert batches[0]["image"].shape == (4, 2, 32, 32, 3)

    # shards partition each global batch deterministically
    l0 = Loader(ds, batch_size=4, seed=1, shard_index=0, num_shards=2)
    l1 = Loader(ds, batch_size=4, seed=1, shard_index=1, num_shards=2)
    b_full = list(Loader(ds, batch_size=4, seed=1).epoch(3))
    b0 = list(l0.epoch(3))
    b1 = list(l1.epoch(3))
    np.testing.assert_array_equal(
        np.concatenate([b0[0]["image"], b1[0]["image"]]), b_full[0]["image"])


def test_loader_process_pool_matches_threads():
    """use_processes must be a pure execution-strategy switch: identical
    batches in identical order (per-sample RNG is derived from
    (seed, epoch, index), never worker state)."""
    ds = SyntheticSegDataset(length=8, t=2, hw=(32, 32), num_classes=5)
    bt = list(Loader(ds, batch_size=4, seed=1, num_workers=2).epoch(2))
    bp = list(Loader(ds, batch_size=4, seed=1, num_workers=2,
                     use_processes=True).epoch(2))
    assert len(bt) == len(bp)
    for a, b in zip(bt, bp):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_sliding_from_predicates(endovis_tree, cadis_tree):
    """Streaming-eval cache validity: `sliding_from` must be True exactly
    when the clip is the previous clip advanced one slot with both clips
    in the normal ascending form (below-t frames use the reversed
    future-frame fallback and must not slide)."""
    ds = EndovisDataset(endovis_tree, "test", t=4, crop_hw=(32, 40))
    assert ds.sliding_from((1, 5), (1, 6))
    assert not ds.sliding_from((1, 5), (2, 6))    # sequence change
    assert not ds.sliding_from((1, 5), (1, 7))    # gap (rate subsampling)
    assert not ds.sliding_from((1, 3), (1, 4))    # prev clip used fallback
    assert ds.sliding_from((1, 4), (1, 5))        # first valid slide
    # consistency with the actual clip constructor
    assert clip_frame_indices(4, 4) == [1, 2, 3, 4]
    assert clip_frame_indices(3, 4) != [0, 1, 2, 3]  # fallback form

    cds = CadisDataset(cadis_tree, "test", tag="2", t=4, crop_hw=(32, 40),
                       base_hw=(36, 48), videos=[1, 3])
    assert cds.sliding_from((19, 6), (19, 7))
    assert not cds.sliding_from((19, 6), (20, 7))  # video change
    assert not cds.sliding_from((19, 4), (19, 5))  # prev clip fallback (f<=t)
    assert cds.sliding_from((19, 5), (19, 6))
    assert not cds.sliding_from((19, 6), (19, 8))  # not one step
