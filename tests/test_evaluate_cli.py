"""Evaluate-only CLI (the reference's ``evaluate.py`` surface,
runner_base.py:576-608 + tasks/*.py valid_step/after_evaluation), driven
end-to-end over synthetic data with tiny models: captioning, VQA (rank),
multimodal classification (NLVR pairs), and retrieval for both eval paths
(BLIP-2 token-max + BLIP-1 ITC->ITM rescore)."""

import json
import os

import numpy as np
import pytest

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[DEC]", "[ENC]",
         "a", "cat", "dog", "red", "blue", "picture", "of", "what", "is",
         "yes", "no"]
IMG = 32

TINY_VIT = {"image_size": IMG, "patch_size": 16, "width": 24, "depth": 2,
            "num_heads": 2, "mlp_hidden": 48, "final_norm": True,
            "dtype": "fp32"}
TINY_TXT = {"vocab_size": len(VOCAB) + 2, "hidden_size": 24, "num_layers": 2,
            "num_heads": 2, "intermediate_size": 48, "encoder_width": 24,
            "dropout_rate": 0.0}


@pytest.fixture()
def vocab_file(tmp_path):
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(VOCAB))
    return str(path)


@pytest.fixture()
def images_root(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    names = []
    for i in range(6):
        name = f"im{i}.jpg"
        Image.fromarray((rs.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            root / name)
        names.append(name)
    return str(root), names


def _run_eval(tmp_path, cfg: dict, vocab_file, split=None):
    import yaml

    from sprc_tpu.cli.evaluate import main

    cfg_path = tmp_path / "eval.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "out"
    argv = ["--cfg-path", str(cfg_path), "--vocab-path", vocab_file,
            "--output-dir", str(out)]
    if split:
        argv += ["--split", split]
    main(argv)
    return str(out)


def _caption_model():
    return {"arch": "blip_caption", "image_size": IMG,
            "vocab_size": len(VOCAB) + 2, "vit_dtype": "fp32",
            "vit_config_override": TINY_VIT, "text_config_override": TINY_TXT}


def test_evaluate_captioning(tmp_path, vocab_file, images_root, capsys):
    root, names = images_root
    ann = [{"image": n, "image_id": i, "caption": ["a red cat"]}
           for i, n in enumerate(names)]
    ann_path = tmp_path / "cap_test.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "captioning", "evaluate": True, "batch_size_eval": 4,
                "max_len": 4, "min_len": 1, "test_splits": ["test"]},
        "model": _caption_model(),
        "datasets": {"coco_caption": {
            "build_info": {"annotations": {"test": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_caption"}},
        }},
    }
    out = _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "agg_metrics" in metrics
    # result file saved with one row per image, deduped on image_id
    rows = json.load(open(os.path.join(out, "result", "test_epochx.json")))
    assert {r["image_id"] for r in rows} == set(range(6))


def test_evaluate_vqa_rank(tmp_path, vocab_file, images_root, capsys):
    root, names = images_root
    ann = [{"image": n, "question": "what is red", "question_id": i,
            "answers": [{"answer": "cat"}] * 4}
           for i, n in enumerate(names)]
    ann_path = tmp_path / "vqa_val.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "vqa", "evaluate": True, "batch_size_eval": 3,
                "inference_method": "rank", "num_ans_candidates": 3,
                "answer_list": ["cat", "dog", "yes"],
                "test_splits": ["val"]},
        "model": {"arch": "blip_vqa", "flavor": "blip", "image_size": IMG,
                  "vocab_size": len(VOCAB) + 2, "vit_dtype": "fp32",
                  "vit_config_override": TINY_VIT,
                  "text_config_override": TINY_TXT},
        "datasets": {"coco_vqa": {
            "build_info": {"annotations": {"val": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_question"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "agg_metrics" in metrics
    assert 0.0 <= metrics["agg_metrics"] <= 100.0


def test_evaluate_classification_nlvr(tmp_path, vocab_file, images_root,
                                      capsys):
    root, names = images_root
    ann = [{"images": [names[i], names[(i + 1) % 6]],
            "sentence": "a red cat", "label": "True" if i % 2 else "False"}
           for i in range(6)]
    ann_path = tmp_path / "nlvr_test.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "multimodal_classification", "evaluate": True,
                "batch_size_eval": 3, "test_splits": ["test"]},
        "model": {"arch": "blip_nlvr", "flavor": "blip", "image_size": IMG,
                  "vocab_size": len(VOCAB) + 2, "vit_dtype": "fp32",
                  "vit_config_override": TINY_VIT,
                  "text_config_override": TINY_TXT},
        "datasets": {"nlvr": {
            "build_info": {"annotations": {"test": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_caption"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["acc"] == metrics["agg_metrics"]
    assert 0.0 <= metrics["acc"] <= 1.0


def _retrieval_cfg(arch, model, root, ann_path):
    return {
        "run": {"task": "retrieval", "evaluate": True, "k_test": 3,
                "max_txt_len": 8, "test_splits": ["test"]},
        "model": model,
        "datasets": {"coco_retrieval": {
            "build_info": {"annotations": {"test": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_caption"}},
        }},
    }


def _retrieval_ann(tmp_path, names):
    ann = [{"image": n, "caption": [f"a {w} picture"], "image_id": i}
           for i, (n, w) in enumerate(zip(names, ["red", "blue", "cat",
                                                  "dog", "yes", "no"]))]
    path = tmp_path / "ret_test.json"
    path.write_text(json.dumps(ann))
    return path


def test_evaluate_retrieval_blip1(tmp_path, vocab_file, images_root, capsys):
    root, names = images_root
    ann_path = _retrieval_ann(tmp_path, names)
    model = {"arch": "blip_retrieval", "image_size": IMG,
             "vocab_size": len(VOCAB) + 2, "queue_size": 12,
             "vit_dtype": "fp32", "vit_config_override": TINY_VIT,
             "text_config_override": TINY_TXT}
    cfg = _retrieval_cfg("blip_retrieval", model, root, ann_path)
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("txt_r1", "img_r1", "r_mean", "agg_metrics"):
        assert key in metrics
    assert 0.0 <= metrics["r_mean"] <= 100.0


TINY_TSF = {"image_size": IMG, "patch_size": 16, "width": 24, "depth": 1,
            "num_heads": 2, "mlp_hidden": 48, "num_frames": 2,
            "dtype": "fp32"}


@pytest.fixture()
def videos_root(tmp_path):
    root = tmp_path / "vids"
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    names = []
    for i in range(4):
        name = f"vid{i}.npy"
        np.save(root / name, (rs.rand(3, 40, 40, 3) * 255).astype(np.uint8))
        names.append(name)
    return str(root), names


def _alpro_model(arch, **kw):
    return dict({"arch": arch, "image_size": IMG, "num_frames": 2,
                 "embed_dim": 8, "fusion_layer": 1,
                 "vocab_size": len(VOCAB) + 2,
                 "video_config_override": TINY_TSF,
                 "text_config_override": dict(TINY_TXT, num_layers=2)}, **kw)


def test_evaluate_alpro_video_retrieval(tmp_path, vocab_file, videos_root,
                                        capsys):
    root, names = videos_root
    ann = [{"video": n, "caption": [f"a {w}"]}
           for n, w in zip(names, ["red", "blue", "cat", "dog"])]
    ann_path = tmp_path / "vret_test.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "retrieval", "evaluate": True, "k_test": 2,
                "max_txt_len": 8, "test_splits": ["test"]},
        "model": _alpro_model("alpro_retrieval"),
        "datasets": {"msrvtt_retrieval": {
            "build_info": {"annotations": {"test": [str(ann_path)]},
                           "videos": root, "n_frms": 2},
            "vis_processor": {"eval": {"name": "alpro_video_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_caption"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "r_mean" in metrics and 0.0 <= metrics["r_mean"] <= 100.0


def test_evaluate_alpro_video_qa(tmp_path, vocab_file, videos_root, capsys):
    root, names = videos_root
    ann = [{"video": n, "question": "what is red", "answer": ["cat"]}
           for n in names]
    ann_path = tmp_path / "vqa_test.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "multimodal_classification", "evaluate": True,
                "batch_size_eval": 2, "answer_list": ["cat", "dog", "yes"],
                "test_splits": ["test"]},
        "model": _alpro_model("alpro_qa", num_classes=3),
        "datasets": {"msrvtt_qa": {
            "build_info": {"annotations": {"test": [str(ann_path)]},
                           "videos": root, "n_frms": 2},
            "vis_processor": {"eval": {"name": "alpro_video_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_question"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= metrics["acc"] <= 1.0


def test_evaluate_clip_retrieval(tmp_path, vocab_file, images_root, capsys):
    """CLIP cosine retrieval eval (reference projects/clip/exp_coco_ret_eval
    — no cross-encoder rescoring)."""
    root, names = images_root
    ann_path = _retrieval_ann(tmp_path, names)
    model = {"arch": "clip", "embed_dim": 16, "image_size": IMG,
             "vision": {"image_size": IMG, "patch_size": 16, "width": 16,
                        "depth": 1, "num_heads": 2, "mlp_hidden": 32,
                        "use_ln_pre": True, "quick_gelu": True,
                        "final_norm": True, "patch_bias": False,
                        "dtype": "fp32"},
             "text": {"vocab_size": len(VOCAB) + 2, "width": 16,
                      "layers": 1, "heads": 2, "context_length": 12}}
    cfg = _retrieval_cfg("clip", model, root, ann_path)
    cfg["run"]["max_txt_len"] = 12
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "r_mean" in metrics and 0.0 <= metrics["r_mean"] <= 100.0


def test_evaluate_pnp_vqa(tmp_path, vocab_file, images_root, capsys):
    """PNP-VQA pipeline eval end-to-end (reference
    projects/pnp-vqa/eval/vqav2_eval.yaml over pnp_vqa.predict_answers)."""
    root, names = images_root
    ann = [{"image": n, "question": "what is red", "question_id": i,
            "answers": [{"answer": "cat"}] * 3}
           for i, n in enumerate(names[:2])]
    ann_path = tmp_path / "vqa_val.json"
    ann_path.write_text(json.dumps(ann))
    tiny_vit = dict(TINY_VIT, depth=2)
    cfg = {
        "run": {"task": "vqa", "evaluate": True, "batch_size_eval": 2,
                "num_captions": 2, "num_patches": 2, "block_num": 1,
                "num_captions_fid": 1, "max_len": 3, "test_splits": ["val"]},
        "model": {
            "arch": "pnp_vqa", "model_type": "base",
            "image_question_matching_model": {
                "arch": "blip_image_text_matching", "image_size": IMG,
                "vit_dtype": "fp32", "vit_config_override": tiny_vit,
                "text_config_override": TINY_TXT},
            "image_captioning_model": {
                "arch": "blip_caption", "image_size": IMG,
                "vit_dtype": "fp32", "vit_config_override": tiny_vit,
                "text_config_override": TINY_TXT},
            "question_answering_model": {
                "arch": "pnp_unifiedqav2_fid", "d_model": 16, "d_kv": 8,
                "d_ff": 32, "num_heads": 2, "num_layers": 1,
                "num_decoder_layers": 1, "vocab_size": 40},
        },
        "datasets": {"coco_vqa": {
            "build_info": {"annotations": {"val": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_question"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "agg_metrics" in metrics


def test_evaluate_clip_zero_shot(tmp_path, vocab_file, images_root, capsys):
    """CLIP zero-shot classification via the 80-template prompt ensemble
    (reference projects/clip/exp_imnet_zs_eval.yaml, model.py:692-744)."""
    root, names = images_root
    ann = [{"image": n, "label": i % 2} for i, n in enumerate(names)]
    ann_path = tmp_path / "imnet_val.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "multimodal_classification", "evaluate": True,
                "batch_size_eval": 3, "classnames": ["cat", "dog"],
                "test_splits": ["val"]},
        "model": {"arch": "clip", "embed_dim": 16, "image_size": IMG,
                  "vision": {"image_size": IMG, "patch_size": 16,
                             "width": 16, "depth": 1, "num_heads": 2,
                             "mlp_hidden": 32, "use_ln_pre": True,
                             "quick_gelu": True, "final_norm": True,
                             "patch_bias": False, "dtype": "fp32"},
                  "text": {"vocab_size": len(VOCAB) + 2, "width": 16,
                           "layers": 1, "heads": 2, "context_length": 12}},
        "datasets": {"imagenet": {
            "build_info": {"annotations": {"val": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_caption"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file, split="val")
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= metrics["acc"] <= 1.0


def test_evaluate_blip2_zeroshot_vqa(tmp_path, vocab_file, images_root,
                                     capsys):
    """Zero-shot generative VQA through the frozen T5 head (reference
    projects/blip2/eval/vqav2_zeroshot_flant5xl_eval.yaml)."""
    root, names = images_root
    ann = [{"image": n, "question": "what is red", "question_id": i,
            "answers": [{"answer": "cat"}] * 3}
           for i, n in enumerate(names[:4])]
    ann_path = tmp_path / "vqa_val.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "vqa", "evaluate": True, "batch_size_eval": 2,
                "inference_method": "generate", "max_len": 3,
                "prompt": "Question: {} Short answer:",
                "test_splits": ["val"]},
        "model": {"arch": "blip2_t5", "image_size": IMG,
                  "num_query_token": 2, "max_txt_len": 8,
                  "vocab_size": len(VOCAB) + 2,
                  "vit_dtype": "fp32", "qformer_dtype": "fp32",
                  "vit_config_override": dict(TINY_VIT,
                                              qkv_fused_no_kbias=True),
                  "qformer_config_override": dict(
                      TINY_TXT, query_length=2, cross_attention_freq=1),
                  "t5_config": {"d_model": 16, "d_kv": 8, "d_ff": 32,
                                "num_heads": 2, "num_layers": 1,
                                "num_decoder_layers": 1,
                                "vocab_size": len(VOCAB) + 2}},
        "datasets": {"coco_vqa": {
            "build_info": {"annotations": {"val": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_question"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "agg_metrics" in metrics


def test_evaluate_blip2_captioning(tmp_path, vocab_file, images_root, capsys):
    """Caption eval through the BLIP-2 T5 head (reference
    projects/blip2/eval/caption_coco_flant5xl_eval.yaml)."""
    root, names = images_root
    ann = [{"image": n, "image_id": i, "caption": ["a red cat"]}
           for i, n in enumerate(names[:4])]
    ann_path = tmp_path / "cap_test.json"
    ann_path.write_text(json.dumps(ann))
    cfg = {
        "run": {"task": "captioning", "evaluate": True, "batch_size_eval": 2,
                "max_len": 3, "min_len": 1, "prompt": "a photo of",
                "test_splits": ["test"]},
        "model": {"arch": "blip2_t5", "image_size": IMG,
                  "num_query_token": 2, "max_txt_len": 8,
                  "vocab_size": len(VOCAB) + 2,
                  "vit_dtype": "fp32", "qformer_dtype": "fp32",
                  "vit_config_override": dict(TINY_VIT,
                                              qkv_fused_no_kbias=True),
                  "qformer_config_override": dict(
                      TINY_TXT, query_length=2, cross_attention_freq=1),
                  "t5_config": {"d_model": 16, "d_kv": 8, "d_ff": 32,
                                "num_heads": 2, "num_layers": 1,
                                "num_decoder_layers": 1,
                                "vocab_size": len(VOCAB) + 2}},
        "datasets": {"coco_caption": {
            "build_info": {"annotations": {"test": [str(ann_path)]},
                           "images": root},
            "vis_processor": {"eval": {"name": "blip_image_eval",
                                       "image_size": IMG}},
            "text_processor": {"eval": {"name": "blip_caption"}},
        }},
    }
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "agg_metrics" in metrics


def test_evaluate_retrieval_blip2(tmp_path, vocab_file, images_root, capsys):
    root, names = images_root
    ann_path = _retrieval_ann(tmp_path, names)
    model = {"arch": "blip2", "image_size": IMG, "num_query_token": 4,
             "max_txt_len": 8, "vocab_size": len(VOCAB) + 2,
             "vit_dtype": "fp32", "qformer_dtype": "fp32",
             "vit_config_override": dict(TINY_VIT, qkv_fused_no_kbias=True),
             "qformer_config_override": dict(
                 TINY_TXT, query_length=4, cross_attention_freq=1)}
    cfg = _retrieval_cfg("blip2", model, root, ann_path)
    _run_eval(tmp_path, cfg, vocab_file)
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "r_mean" in metrics and 0.0 <= metrics["r_mean"] <= 100.0
