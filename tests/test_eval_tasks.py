"""Eval-task layer + offline caption metrics.

Golden checks vs reference semantics (tasks/captioning.py, tasks/vqa.py,
tasks/multimodal_classification.py, tasks/dialogue.py) and vs nltk for BLEU.
"""

import json

import numpy as np
import pytest

from sprc_tpu.registry import registry
import sprc_tpu.train.tasks  # noqa: F401  (registers tasks)


def test_all_reference_task_names_registered():
    ref_names = [
        "captioning", "vqa", "gqa", "aok_vqa", "multimodal_classification",
        "dialogue", "image_text_pretrain", "vqa_reading_comprehension",
        "gqa_reading_comprehension", "retrieval",
    ]
    for name in ref_names:
        assert registry.get("task", name) is not None, name


def test_corpus_bleu_matches_nltk():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    from sprc_tpu.retrieval.caption_eval import corpus_bleu

    cands = ["a cat sits on the mat", "a dog runs in the park",
             "the bird flies high above the trees today"]
    refs = [["a cat is sitting on the mat", "there is a cat on a mat"],
            ["the dog runs through a park", "a dog running in a park"],
            ["a bird flying high above trees in the sky"]]
    mine = corpus_bleu(cands, refs)
    ref_tok = [[r.split() for r in rs] for rs in refs]
    cand_tok = [c.split() for c in cands]
    for n in range(1, 5):
        want = nltk_bleu(ref_tok, cand_tok, weights=tuple([1.0 / n] * n))
        assert abs(mine[n - 1] - want) < 1e-4, (n, mine[n - 1], want)


def test_cider_d_properties():
    from sprc_tpu.retrieval.caption_eval import cider_d

    cands = ["a cat sits on the mat", "a dog runs in the park fast today"]
    refs = [["a cat sits on the mat"], ["a dog runs in the park fast today"]]
    assert abs(cider_d(cands, refs) - 10.0) < 1e-9  # perfect = 10 (COCO scale)
    assert cider_d(["x y z", "q w e"], refs) < 0.5
    swapped = cider_d(list(reversed(cands)), refs)
    assert swapped < cider_d(cands, refs)


def test_caption_task_end_to_end(tmp_path):
    task = registry.get("task", "captioning")(
        num_beams=1, max_len=8, min_len=1, output_dir=str(tmp_path))

    def generate_fn(samples, **kw):
        return [f"caption for {int(i)}" for i in samples["image_id"]]

    res = task.valid_step(generate_fn, {"image_id": np.asarray([3, 5, 3])})
    metrics = task.after_evaluation(
        res, "val", epoch=0,
        ground_truth={3: ["caption for 3"], 5: ["caption for 5"]},
    )
    rows = json.load(open(tmp_path / "result" / "val_epoch0.json"))
    assert [r["image_id"] for r in rows] == [3, 5]  # deduped, order kept
    assert metrics["Bleu_1"] == pytest.approx(1.0)
    assert metrics["agg_metrics"] > 0


def test_vqa_task_official_protocol(tmp_path):
    ann = {
        7: {"answers": [{"answer": "red"}] * 10, "question_type": "what color",
            "answer_type": "other"},
        8: {"answers": [{"answer": "two"}] * 5 + [{"answer": "three"}] * 5,
            "question_type": "how many", "answer_type": "number"},
    }
    task = registry.get("task", "vqa")(annotations=ann, output_dir=str(tmp_path))

    def predict_fn(samples, **kw):
        return ["red", "three"]

    res = task.valid_step(predict_fn, {"question_id": np.asarray([7, 8])})
    metrics = task.after_evaluation(res, "val")
    # q7: all 10 gt 'red' -> 1.0; q8: 'three' matches 5/10 subsets ->
    # min(1, 5/3) per leave-one-out containing >=3 matches; protocol value:
    assert metrics["agg_metrics"] > 50.0
    assert "number" in metrics and "other" in metrics


def test_gqa_task_exact_match(tmp_path):
    task = registry.get("task", "gqa")(output_dir=str(tmp_path))

    def predict_fn(samples, **kw):
        return ["A Cat!", "dog"]

    res = task.valid_step(
        predict_fn,
        {"question_id": np.asarray([1, 2]), "answer": ["a cat!", "cat"]},
    )
    # normalization strips '!' from prediction AND would need gt pre-cleaned;
    # 'a cat' != 'a cat!' exact-match after processPunctuation on pred only
    m = task.after_evaluation(res, "val")
    assert m["acc"] == pytest.approx(0.0) or m["acc"] <= 50.0


def test_aokvqa_min_match_over_three(tmp_path):
    task = registry.get("task", "aok_vqa")(output_dir=str(tmp_path))

    def predict_fn(samples, **kw):
        return ["red", "blue"]

    res = task.valid_step(predict_fn, {
        "question_id": [1, 2],
        "direct_answers": [["red", "red", "crimson"], ["green"] * 4],
    })
    m = task.after_evaluation(res, "val")
    # q1: 2 matches/3 -> 2/3; q2: 0 -> 0; mean = 1/3 -> 33.33
    assert m["acc"] == pytest.approx(100.0 / 3.0, abs=0.01)


def test_classification_task_accuracy(tmp_path):
    task = registry.get("task", "multimodal_classification")(
        output_dir=str(tmp_path))

    def predict_fn(samples):
        return {"predictions": np.asarray([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]]),
                "targets": np.asarray([1, 0, 0])}

    res = task.valid_step(predict_fn, {"instance_id": ["a", "b", "c"]})
    m = task.after_evaluation(res, "val", epoch=1)
    assert m["acc"] == pytest.approx(2 / 3)


def test_dialogue_task_mean_loss():
    task = registry.get("task", "dialogue")()
    losses = [task.valid_step(lambda s: 2.0, {})[0],
              task.valid_step(lambda s: 4.0, {})[0]]
    assert task.after_evaluation(losses, "val")["agg_metrics"] == pytest.approx(3.0)


def test_save_result_dedup(tmp_path):
    from sprc_tpu.train.eval_tasks import save_result

    rows = [{"qid": 1, "v": "a"}, {"qid": 2, "v": "b"}, {"qid": 1, "v": "c"}]
    path = save_result(rows, str(tmp_path), "r", remove_duplicate="qid")
    saved = json.load(open(path))
    assert saved == [{"qid": 1, "v": "a"}, {"qid": 2, "v": "b"}]
