"""Evaluation task layer — the LAVIS task registry, completed.

Reference: src/lavis/tasks/{captioning,vqa,multimodal_classification,
dialogue,image_text_pretrain,vqa_reading_comprehension}.py. Each task turns
per-batch model outputs into result dicts (``valid_step``), merges + dedups
them to a JSON file, and reports metrics (``after_evaluation``) — the same
three-phase contract, made functional: models arrive as callables
(``generate_fn`` / ``predict_fn``), not stateful nn.Modules, so the same
task drives any registered model family under jit.

Metric parity notes:
- VQA uses the official protocol via :mod:`sprc_tpu.retrieval.vqa_eval`
  (normalization tables + min(matches/3, 1)), reference vqa.py:130-167.
- GQA is exact-match after punctuation/digit-article normalization
  (vqa.py:194-230); AOKVQA is min(matches/3, 1) over direct answers
  (vqa.py:259-296).
- Captioning/dialogue aggregate ``CIDEr + Bleu_4`` via the offline
  implementations in :mod:`sprc_tpu.retrieval.caption_eval` (the reference
  shells out to pycocoevalcap + GT downloads, impossible under zero egress).
- Classification is argmax accuracy (multimodal_classification.py:24-85).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from sprc_tpu.registry import registry
from sprc_tpu.train.runner import BaseTask


def save_result(
    result: List[dict], result_dir: str, filename: str,
    remove_duplicate: Optional[str] = None,
) -> str:
    """Merge/dedup/save result dicts (reference base_task.py:249-287; the
    cross-rank gather happens upstream in the caller under SPMD)."""
    os.makedirs(result_dir, exist_ok=True)
    if remove_duplicate:
        seen, deduped = set(), []
        for row in result:
            key = row[remove_duplicate]
            if key not in seen:
                seen.add(key)
                deduped.append(row)
        result = deduped
    path = os.path.join(result_dir, f"{filename}.json")
    with open(path, "w") as f:
        json.dump(result, f)
    return path


def _append_eval_log(output_dir: str, payload: dict) -> None:
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "evaluate.txt"), "a") as f:
        f.write(json.dumps(payload) + "\n")


@registry.register("task", "captioning")
class CaptionTask(BaseTask):
    """valid_step -> [{"caption", "image_id"}]; metric = CIDEr + Bleu_4
    (reference tasks/captioning.py:16-117)."""

    def __init__(self, *, num_beams: int = 3, max_len: int = 30,
                 min_len: int = 10, report_metric: bool = True,
                 output_dir: str = "./output"):
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.report_metric = report_metric
        self.output_dir = output_dir

    def valid_step(self, generate_fn: Callable, samples: dict) -> List[dict]:
        captions = generate_fn(
            samples, num_beams=self.num_beams, max_length=self.max_len,
            min_length=self.min_len,
        )
        return [
            {"caption": c, "image_id": int(i)}
            for c, i in zip(captions, samples["image_id"])
        ]

    def after_evaluation(self, val_result: List[dict], split_name: str,
                         epoch: Any = "x",
                         ground_truth: Optional[Dict[int, Sequence[str]]] = None,
                         ) -> Dict[str, float]:
        path = save_result(
            val_result, os.path.join(self.output_dir, "result"),
            f"{split_name}_epoch{epoch}", remove_duplicate="image_id",
        )
        if not (self.report_metric and ground_truth):
            return {"agg_metrics": 0.0}
        from sprc_tpu.retrieval.caption_eval import caption_metrics

        rows = json.load(open(path))
        cands = [r["caption"] for r in rows if r["image_id"] in ground_truth]
        refs = [list(ground_truth[r["image_id"]]) for r in rows
                if r["image_id"] in ground_truth]
        metrics = caption_metrics(cands, refs)
        _append_eval_log(self.output_dir, {split_name: metrics})
        return metrics


@registry.register("task", "vqa")
class VQATask(BaseTask):
    """valid_step -> [{"question_id", "answer"}]; official VQA accuracy
    (reference tasks/vqa.py:19-167)."""

    def __init__(self, *, num_beams: int = 3, max_len: int = 10,
                 min_len: int = 1, num_ans_candidates: int = 128,
                 inference_method: str = "rank", prompt: str = "",
                 answer_list: Optional[Sequence[str]] = None,
                 annotations: Optional[dict] = None,
                 output_dir: str = "./output"):
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.num_ans_candidates = num_ans_candidates
        self.inference_method = inference_method
        self.prompt = prompt
        self.answer_list = answer_list
        # {question_id: {"answers": [...], "question_type", "answer_type"}}
        self.annotations = annotations or {}
        self.output_dir = output_dir

    def valid_step(self, predict_fn: Callable, samples: dict) -> List[dict]:
        answers = predict_fn(
            samples, answer_list=self.answer_list,
            inference_method=self.inference_method, num_beams=self.num_beams,
            max_len=self.max_len, min_len=self.min_len,
            num_ans_candidates=self.num_ans_candidates, prompt=self.prompt,
        )
        return [
            {"question_id": int(q), "answer": a}
            for a, q in zip(answers, samples["question_id"])
        ]

    def after_evaluation(self, val_result: List[dict], split_name: str,
                         **kw) -> Dict[str, float]:
        path = save_result(
            val_result, os.path.join(self.output_dir, "result"),
            f"{split_name}_vqa_result", remove_duplicate="question_id",
        )
        if not self.annotations:
            return {}
        from sprc_tpu.retrieval.vqa_eval import VQAEval

        rows = json.load(open(path))
        results = {
            r["question_id"]: r["answer"]
            for r in rows if r["question_id"] in self.annotations
        }
        anns = [
            {"question_id": qid, **self.annotations[qid]} for qid in results
        ]
        acc = VQAEval().evaluate(results, anns)
        metrics = {"agg_metrics": acc["overall"], **acc.get("perAnswerType", {})}
        _append_eval_log(self.output_dir, metrics)
        return metrics


@registry.register("task", "gqa")
class GQATask(VQATask):
    """Exact-match accuracy after VQA normalization (vqa.py:169-230)."""

    def valid_step(self, predict_fn: Callable, samples: dict) -> List[dict]:
        answers = predict_fn(
            samples, answer_list=self.answer_list,
            inference_method=self.inference_method, num_beams=self.num_beams,
            max_len=self.max_len, min_len=self.min_len,
            num_ans_candidates=self.num_ans_candidates, prompt=self.prompt,
        )
        return [
            {"question_id": int(q), "pred_ans": a, "gt_ans": g}
            for a, q, g in zip(answers, samples["question_id"], samples["answer"])
        ]

    def after_evaluation(self, val_result: List[dict], split_name: str,
                         **kw) -> Dict[str, float]:
        path = save_result(
            val_result, os.path.join(self.output_dir, "result"),
            f"{split_name}_gqa_result", remove_duplicate="question_id",
        )
        from sprc_tpu.retrieval.vqa_eval import (
            process_digit_article,
            process_punctuation,
        )

        rows = json.load(open(path))
        if any(r["gt_ans"] is None for r in rows):
            return {}  # leaderboard split: predictions saved, no GT
        acc = [
            1.0 if process_digit_article(process_punctuation(r["pred_ans"]))
            == r["gt_ans"] else 0.0
            for r in rows
        ]
        accuracy = 100.0 * sum(acc) / max(len(acc), 1)
        metrics = {"agg_metrics": accuracy, "acc": accuracy}
        _append_eval_log(self.output_dir, metrics)
        return metrics


@registry.register("task", "aok_vqa")
class AOKVQATask(VQATask):
    """Direct-answer accuracy min(matches/3, 1) (vqa.py:233-296)."""

    def valid_step(self, predict_fn: Callable, samples: dict) -> List[dict]:
        answers = predict_fn(
            samples, answer_list=self.answer_list,
            inference_method=self.inference_method, num_beams=self.num_beams,
            max_len=self.max_len, min_len=self.min_len,
            num_ans_candidates=self.num_ans_candidates,
        )
        return [
            {"question_id": q, "pred_ans": a,
             "gt_ans": list(g) if g is not None else None}
            for a, q, g in zip(
                answers, samples["question_id"], samples["direct_answers"]
            )
        ]

    def after_evaluation(self, val_result: List[dict], split_name: str,
                         **kw) -> Dict[str, float]:
        path = save_result(
            val_result, os.path.join(self.output_dir, "result"),
            f"{split_name}_aokvqa_result", remove_duplicate="question_id",
        )
        rows = json.load(open(path))
        if any(r["gt_ans"] is None for r in rows):
            return {}
        acc = [
            min(1.0, sum(r["pred_ans"] == gt for gt in r["gt_ans"]) / 3.0)
            for r in rows
        ]
        accuracy = 100.0 * sum(acc) / max(len(acc), 1)
        metrics = {"agg_metrics": accuracy, "acc": accuracy}
        _append_eval_log(self.output_dir, metrics)
        return metrics


@registry.register("task", "multimodal_classification")
class MultimodalClassificationTask(BaseTask):
    """Argmax-accuracy classification (multimodal_classification.py:19-85)."""

    def __init__(self, *, inst_id_key: str = "instance_id",
                 output_dir: str = "./output"):
        self.inst_id_key = inst_id_key
        self.output_dir = output_dir

    def valid_step(self, predict_fn: Callable, samples: dict) -> List[dict]:
        out = predict_fn(samples)
        preds = np.asarray(out["predictions"]).argmax(axis=1)
        targets = np.asarray(out["targets"])
        return [
            {self.inst_id_key: str(i), "prediction": int(p), "target": int(t)}
            for p, t, i in zip(preds, targets, samples[self.inst_id_key])
        ]

    def after_evaluation(self, val_result: List[dict], split_name: str,
                         epoch: Any = "x", **kw) -> Dict[str, float]:
        path = save_result(
            val_result, os.path.join(self.output_dir, "result"),
            f"{split_name}_epoch{epoch}", remove_duplicate=self.inst_id_key,
        )
        rows = json.load(open(path))
        preds = np.asarray([r["prediction"] for r in rows])
        targets = np.asarray([r["target"] for r in rows])
        accuracy = float((preds == targets).sum() / max(targets.shape[0], 1))
        metrics = {"agg_metrics": accuracy, "acc": accuracy}
        _append_eval_log(self.output_dir, {split_name: metrics})
        return metrics


@registry.register("task", "dialogue")
class DialogueTask(BaseTask):
    """valid_step returns per-batch LM loss; agg = mean loss
    (reference tasks/dialogue.py:20-66)."""

    def __init__(self, *, num_beams: int = 3, max_len: int = 30,
                 min_len: int = 10, report_metric: bool = True):
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.report_metric = report_metric

    def valid_step(self, loss_fn: Callable, samples: dict) -> List[float]:
        return [float(loss_fn(samples))]

    def after_evaluation(self, val_result: List[float], split_name: str,
                         **kw) -> Dict[str, float]:
        if not self.report_metric:
            return {"agg_metrics": 0.0}
        return {"agg_metrics": float(np.mean(val_result))}


@registry.register("task", "image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    """Pretraining has no eval phase (reference image_text_pretrain.py:12-18)."""

    def evaluation(self, *a, **kw):
        return {}


@registry.register("task", "vqa_reading_comprehension")
class VQARCTask(VQATask):
    """PNP-VQA driving task: predict via the three-stage pipeline and score
    with the VQA protocol (reference vqa_reading_comprehension.py:22-155)."""

    def __init__(self, *, num_captions: int = 50, num_captions_fid: int = 1,
                 num_patches: int = 50, block_num: int = 7, **kw):
        super().__init__(**kw)
        self.pipeline_kwargs = dict(
            num_captions=num_captions, num_captions_fid=num_captions_fid,
            num_patches=num_patches, block_num=block_num,
        )

    def valid_step(self, pipeline, samples: dict) -> List[dict]:
        answers, captions, gradcams = pipeline.predict_answers(
            samples["image"], samples["text_input"], **self.pipeline_kwargs
        )
        return [
            {"question_id": int(q), "answer": a}
            for a, q in zip(answers, samples["question_id"])
        ]


@registry.register("task", "gqa_reading_comprehension")
class GQARCTask(VQARCTask, GQATask):
    """GQA scored via the reading-comprehension pipeline
    (vqa_reading_comprehension.py:156-200)."""

    def valid_step(self, pipeline, samples: dict) -> List[dict]:
        answers, captions, gradcams = pipeline.predict_answers(
            samples["image"], samples["text_input"], **self.pipeline_kwargs
        )
        return [
            {"question_id": int(q), "pred_ans": a, "gt_ans": g}
            for a, q, g in zip(
                answers, samples["question_id"], samples["answer"]
            )
        ]

    after_evaluation = GQATask.after_evaluation
