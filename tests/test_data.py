"""Dataset + loader tests over synthetic on-disk fixtures that mirror the
reference dataset layouts (data_utils.py:108-286)."""

import json
import numpy as np
import pytest

from sprc_tpu.data.datasets import CIRRDataset, FashionIQDataset
from sprc_tpu.data.loader import DataLoader, default_collate, host_shard
from sprc_tpu.data.transforms import targetpad_transform


def _png(path, rng, w=40, h=30):
    import PIL.Image

    arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    PIL.Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def cirr_root(tmp_path_factory):
    rng = np.random.RandomState(11)  # own seed: content must not depend on test order
    root = tmp_path_factory.mktemp("cirr_dataset")
    (root / "cirr" / "captions").mkdir(parents=True)
    (root / "cirr" / "image_splits").mkdir(parents=True)
    (root / "img").mkdir()

    names = [f"im{i}" for i in range(6)]
    for n in names:
        _png(root / "img" / f"{n}.png", rng)
    split = {n: f"img/{n}.png" for n in names}
    triplets = [
        {
            "pairid": i,
            "reference": names[i],
            "target_hard": names[(i + 1) % 6],
            # CIRR group members include the target (and the reference)
            "caption": f"caption {i}",
            "img_set": {"members": [names[i], names[(i + 1) % 6], names[(i + 2) % 6]]},
        }
        for i in range(4)
    ]
    for s in ("train", "val", "test1"):
        (root / "cirr" / "captions" / f"cap.rc2.{s}.json").write_text(json.dumps(triplets))
        (root / "cirr" / "image_splits" / f"split.rc2.{s}.json").write_text(json.dumps(split))
    return root


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    rng = np.random.RandomState(12)
    root = tmp_path_factory.mktemp("fashionIQ_dataset")
    (root / "captions").mkdir()
    (root / "image_splits").mkdir()
    (root / "images").mkdir()
    names = [f"dress{i}" for i in range(4)]
    for n in names:
        _png(root / "images" / f"{n}.png", rng)
    triplets = [
        {"candidate": names[i], "target": names[(i + 1) % 4], "captions": ["is red", "is long"]}
        for i in range(3)
    ]
    for s in ("train", "val", "test"):
        (root / "captions" / f"cap.dress.{s}.json").write_text(json.dumps(triplets))
        (root / "image_splits" / f"split.dress.{s}.json").write_text(json.dumps(names))
    return root


def test_cirr_modes(cirr_root):
    tfm = targetpad_transform(1.25, 32)
    classic = CIRRDataset(cirr_root, "val", "classic", tfm)
    assert len(classic) == 6
    item = classic[0]
    assert item["image"].shape == (32, 32, 3)

    val = CIRRDataset(cirr_root, "val", "relative", tfm)
    assert len(val) == 4
    assert set(val[0]) == {"reference_name", "target_name", "caption", "group_members"}

    train = CIRRDataset(cirr_root, "train", "relative", tfm)
    assert train[1]["reference_image"].shape == (32, 32, 3)

    test1 = CIRRDataset(cirr_root, "test1", "relative", tfm)
    assert set(test1[0]) == {"pair_id", "reference_name", "caption", "group_members"}


def test_fiq_modes(fiq_root):
    tfm = targetpad_transform(1.25, 32)
    ds = FashionIQDataset(fiq_root, "val", ["dress"], "relative", tfm)
    assert len(ds) == 3
    assert ds[0]["captions"] == ["is red", "is long"]
    classic = FashionIQDataset(fiq_root, "val", ["dress"], "classic", tfm)
    assert classic[1]["image"].shape == (32, 32, 3)
    with pytest.raises(ValueError):
        FashionIQDataset(fiq_root, "val", ["hat"], "classic", tfm)


def test_loader_batching_and_shuffle(cirr_root):
    tfm = targetpad_transform(1.25, 32)
    ds = CIRRDataset(cirr_root, "train", "relative", tfm)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["reference_image"].shape == (2, 32, 32, 3)
    assert isinstance(batches[0]["caption"], list)

    loader.set_epoch(0)
    order_a = [b["caption"] for b in loader]
    loader.set_epoch(1)
    order_b = [b["caption"] for b in loader]
    loader.set_epoch(0)
    order_a2 = [b["caption"] for b in loader]
    assert order_a == order_a2  # deterministic per epoch
    assert order_a != order_b  # reshuffled across epochs


def test_host_sharding():
    assert list(host_shard(10, 0, 2)) == [0, 1, 2, 3, 4]
    assert list(host_shard(10, 1, 2)) == [5, 6, 7, 8, 9]
    assert list(host_shard(10, 3, 4)) == [9]


def test_skip_errors(cirr_root, caplog):
    tfm = targetpad_transform(1.25, 32)
    ds = CIRRDataset(cirr_root, "val", "classic", tfm, skip_errors=True)
    # break one image path
    ds.name_to_relpath["im2"] = "img/missing.png"
    assert ds[2] is None  # swallowed
    strict = CIRRDataset(cirr_root, "val", "classic", tfm)
    strict.name_to_relpath["im2"] = "img/missing.png"
    with pytest.raises(Exception):
        strict[2]
    loader = DataLoader(ds, batch_size=6, num_workers=1)
    (batch,) = list(loader)
    assert batch["image"].shape[0] == 5  # dropped sample shrinks batch


@pytest.fixture(scope="module")
def circo_root(tmp_path_factory):
    rng = np.random.RandomState(13)
    root = tmp_path_factory.mktemp("circo")
    (root / "COCO2017_unlabeled" / "annotations").mkdir(parents=True)
    (root / "COCO2017_unlabeled" / "unlabeled2017").mkdir()
    (root / "annotations").mkdir()
    infos = []
    for i in range(6):
        fname = f"{i:012d}.jpg"
        import PIL.Image

        arr = (rng.rand(30, 40, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(root / "COCO2017_unlabeled" / "unlabeled2017" / fname)
        infos.append({"id": 1000 + i, "file_name": fname})
    (root / "COCO2017_unlabeled" / "annotations" / "image_info_unlabeled2017.json").write_text(
        json.dumps({"images": infos})
    )
    anns = [
        {
            "id": q,
            "reference_img_id": 1000 + q,
            "target_img_id": 1001 + q,
            "gt_img_ids": [1001 + q, 1002 + q],
            "relative_caption": f"query {q}",
            "shared_concept": "thing",
        }
        for q in range(3)
    ]
    (root / "annotations" / "val.json").write_text(json.dumps(anns))
    return root


def test_circo_dataset(circo_root):
    from sprc_tpu.data.datasets import CIRCODataset
    from sprc_tpu.data.transforms import targetpad_transform

    tfm = targetpad_transform(1.25, 32)
    classic = CIRCODataset(circo_root, "val", "classic", tfm)
    assert len(classic) == 6
    assert classic[0]["image"].shape == (32, 32, 3)
    assert classic[0]["img_id"] == "1000"

    rel = CIRCODataset(circo_root, "val", "relative", tfm)
    item = rel[0]
    assert item["reference_image"].shape == (32, 32, 3)
    assert item["target_img_id"] == "1001"
    assert len(item["gt_img_ids"]) == CIRCODataset.MAX_NUM_GTS

    meta = CIRCODataset(circo_root, "val", "relative", load_images=False)
    item2 = meta[1]
    assert "reference_image" not in item2 and "target_image" not in item2
    assert item2["gt_img_ids"][0] == "1002"
    assert meta.get_target_img_ids(1)["target_img_id"] == 1002


def test_visualizer(cirr_root, tmp_path, rng):
    from sprc_tpu.retrieval.visualize import save_failure_panels

    names = np.array([
        ["im1", "im2", "im3", "im4", "im5"],
        ["im2", "im0", "im4", "im5", "im3"],
    ])
    n = save_failure_panels(
        str(tmp_path / "vis"),
        names,
        ["im0", "im1"],
        ["im3", "im2"],
        ["make it red", "make it blue"],
        lambda name: str(cirr_root / "img" / f"{name}.png"),
        top_k=3,
        panel_size=32,
        predicate=lambda i, row: True,  # dump all
    )
    assert n == 2
    import os

    assert len(os.listdir(tmp_path / "vis")) == 2


def test_loader_counts_dropped_samples(caplog):
    """§5.3 failure accounting: unreadable (None) samples are counted, not
    just silently dropped (reference collate filter, data_utils.py:14-21)."""
    import logging

    from sprc_tpu.data.loader import DataLoader

    class Flaky:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i in (2, 5):
                return None
            return {"x": np.full((2,), i, np.float32)}

    loader = DataLoader(Flaky(), batch_size=4, num_workers=1)
    with caplog.at_level(logging.WARNING):
        batches = list(loader)
    assert loader.dropped_total == 2
    assert sum(b["x"].shape[0] for b in batches) == 6
    assert any("dropped 2/8" in r.getMessage() for r in caplog.records)
