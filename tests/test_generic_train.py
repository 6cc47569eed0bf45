"""End-to-end generic run configs: caption + VQA tasks from cli.train
(VERDICT r2 item 10 — the reference's ``train.py --cfg-path projects/...``
surface, runner_base.py + base_task.py + dataset builders, driven on
synthetic data with tiny models)."""

import json
import os

import numpy as np
import pytest


def _write_images(root, n):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"img{i}.jpg"
        Image.fromarray(
            (rs.rand(40, 40, 3) * 255).astype(np.uint8)
        ).save(os.path.join(root, name))
        names.append(name)
    return names


TINY_VIT = ("{image_size: 28, patch_size: 14, width: 32, depth: 1, "
            "num_heads: 2, mlp_hidden: 64}")
TINY_TXT = ("{vocab_size: 30524, hidden_size: 32, num_layers: 1, "
            "num_heads: 2, intermediate_size: 64, encoder_width: 32, "
            "dropout_rate: 0.0}")


@pytest.fixture()
def vocab_file(tmp_path):
    # minimal wordpiece vocab covering the test captions
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat", "dog",
              "red", "blue", "yes", "no", "two"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(tokens))
    return str(path)


def _run_cli(cfg_path, tmp_path, vocab_file):
    from sprc_tpu.cli.train import main

    out = str(tmp_path / "out")
    main([
        "--cfg-path", str(cfg_path), "--output-dir", out,
        "--vocab-path", vocab_file,
    ])
    assert os.path.isdir(os.path.join(out, "last_state"))
    # the runner logged finite train losses
    log = os.path.join(out, "train_metrics.csv")
    logged = os.path.exists(log) or os.path.exists(
        os.path.join(out, "log.jsonl"))
    return out, logged


def test_caption_run_config_end_to_end(tmp_path, vocab_file):
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 6)
    ann = [
        {"image": n, "image_id": f"id{i}", "caption": "a red cat"}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "cap_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: captioning
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: blip_caption
  image_size: 28
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  coco_caption:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


TINY_TSF = ("{image_size: 28, patch_size: 14, width: 32, depth: 1, "
            "num_heads: 2, mlp_hidden: 64, num_frames: 2, dtype: fp32}")


def _write_videos(root, n):
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"vid{i}.npy"
        np.save(os.path.join(root, name),
                (rs.rand(3, 36, 36, 3) * 255).astype(np.uint8))
        names.append(name)
    return names


def test_alpro_retrieval_train_end_to_end(tmp_path, vocab_file):
    """ALPRO VTC+VTM training from YAML (reference
    projects/alpro/train/msrvtt_retrieval_ft.yaml; AlproRetrievalAdapter
    dispatched via RetrievalAdapter.specialize)."""
    vid_root = str(tmp_path / "vids")
    names = _write_videos(vid_root, 4)
    ann = [{"video": n, "caption": "a red cat", "image_id": f"v{i}",
            "instance_id": i} for i, n in enumerate(names)]
    ann_path = tmp_path / "ret_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: retrieval
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-4
  max_txt_len: 8
model:
  arch: alpro_retrieval
  image_size: 28
  num_frames: 2
  embed_dim: 8
  fusion_layer: 1
  vocab_size: 30524
  video_config_override: {TINY_TSF}
  text_config_override: {TINY_TXT.replace('}', ', num_layers: 2}')}
datasets:
  msrvtt_retrieval:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      videos: {json.dumps(vid_root)}
      n_frms: 2
    vis_processor:
      train: {{name: alpro_video_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_alpro_qa_train_end_to_end(tmp_path, vocab_file):
    """ALPRO video-QA classification training from YAML (reference
    projects/alpro/train/msrvtt_qa_ft.yaml; answer vocabulary derived from
    the train split)."""
    vid_root = str(tmp_path / "vids")
    names = _write_videos(vid_root, 4)
    ann = [{"video": n, "question": "a cat?", "answer": ["yes", "no"][i % 2]}
           for i, n in enumerate(names)]
    ann_path = tmp_path / "qa_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: multimodal_classification
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-4
  max_txt_len: 8
model:
  arch: alpro_qa
  image_size: 28
  num_frames: 2
  num_classes: 2
  fusion_layer: 1
  vocab_size: 30524
  video_config_override: {TINY_TSF}
  text_config_override: {TINY_TXT.replace('}', ', num_layers: 2}')}
datasets:
  msrvtt_qa:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      videos: {json.dumps(vid_root)}
      n_frms: 2
    vis_processor:
      train: {{name: alpro_video_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_question}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_caption_iter_runner_end_to_end(tmp_path, vocab_file):
    """run.runner: runner_iter drives IterRunner (reference runner_iter.py
    via projects/blip/coco_cap_ft_iter.yaml)."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [{"image": n, "image_id": f"id{i}", "caption": "a red cat"}
           for i, n in enumerate(names)]
    ann_path = tmp_path / "cap_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: captioning
  runner: runner_iter
  max_iters: 4
  iters_per_inner_epoch: 2
  batch_size: 2
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: blip_caption
  image_size: 28
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  coco_caption:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    out, _ = _run_cli(cfg, tmp_path, vocab_file)
    log = [json.loads(line) for line in
           open(os.path.join(out, "log.jsonl"))] if os.path.exists(
        os.path.join(out, "log.jsonl")) else []
    inner = [r for r in log if r.get("kind") == "inner"]
    assert len(inner) == 2  # 4 iters / 2 per inner epoch


def test_caption_blip2_t5_seq2seq_end_to_end(tmp_path, vocab_file):
    """Stage-2-style seq2seq caption training for the BLIP-2 T5 head via
    the auto-dispatched Seq2SeqCaptionAdapter (reference
    projects/blip2/train/pretrain_stage2.yaml / blip2_t5.py forward)."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "image_id": f"id{i}", "caption": "a red cat"}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "cap_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: captioning
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: blip2_t5
  image_size: 28
  num_query_token: 2
  max_txt_len: 8
  vit_dtype: fp32
  qformer_dtype: fp32
  vit_config_override: {TINY_VIT.replace('}', ', qkv_fused_no_kbias: true}')}
  qformer_config_override: {TINY_TXT.replace('}', ', query_length: 2, cross_attention_freq: 1}')}
  t5_config: {{d_model: 16, d_kv: 8, d_ff: 32, num_heads: 2, num_layers: 1,
               num_decoder_layers: 1, vocab_size: 30524}}
datasets:
  coco_caption:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_vqa_run_config_end_to_end(tmp_path, vocab_file):
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "instance_id": i, "question": "a cat?",
         "answers": ["yes", "no", "yes"]}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "vqa_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: vqa
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: blip_vqa
  flavor: blip
  image_size: 28
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  coco_vqa:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_question}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_retrieval_run_config_end_to_end(tmp_path, vocab_file):
    """retrieval task (momentum queue + hard-neg ITM, blip_retrieval) from
    YAML: the functional aux state (params_m + queues) threads through
    TrainState.aux and the queue pointer advances."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "image_id": f"id{i}", "caption": "a red cat"}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "ret_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: retrieval
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: blip_retrieval
  image_size: 28
  embed_dim: 16
  queue_size: 8
  momentum: 0.9
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  coco_retrieval:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_nlvr_run_config_end_to_end(tmp_path, vocab_file):
    """multimodal_classification over NLVR pairs (albef_nlvr distilled)."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"images": [names[i], names[(i + 1) % 4]], "sentence": "a cat",
         "label": "True" if i % 2 else "False"}
        for i in range(4)
    ]
    ann_path = tmp_path / "nlvr_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: multimodal_classification
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: albef_nlvr
  flavor: albef
  num_classes: 2
  image_size: 28
  use_distill: true
  momentum: 0.9
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  nlvr:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_pretrain_stage1_run_config_end_to_end(tmp_path, vocab_file):
    """image_text_pretrain with the parameter-only BLIP-2 stage-1 family."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "image_id": f"id{i}", "caption": "a blue dog"}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "pair_ann.json"
    ann_path.write_text(json.dumps(ann))

    qf = ("{vocab_size: 30524, hidden_size: 32, num_layers: 2, num_heads: 2, "
          "intermediate_size: 64, encoder_width: 32, query_length: 4, "
          "dropout_rate: 0.0}")
    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: image_text_pretrain
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: blip2
  image_size: 28
  num_query_token: 4
  max_txt_len: 8
  vit_config_override: {TINY_VIT}
  qformer_config_override: {qf}
datasets:
  conceptual_caption_3m:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_pretrain_momentum_run_config_end_to_end(tmp_path, vocab_file):
    """image_text_pretrain specialized to the momentum-queue BlipPretrain
    family (aux state + [DEC]-prefixed decoder ids)."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "image_id": f"id{i}", "caption": "a blue dog"}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "pair_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: image_text_pretrain
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: blip_pretrain
  image_size: 28
  embed_dim: 16
  queue_size: 8
  momentum: 0.9
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  conceptual_caption_3m:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_dialogue_run_config_end_to_end(tmp_path, vocab_file):
    """dialogue task: AVSD items (GPT-processed turns + feature streams)
    through the synthetic offline tokenizer."""
    ft_root = tmp_path / "fts"
    rs = np.random.RandomState(0)
    for stream in ("i3d_rgb", "vggish"):
        os.makedirs(ft_root / stream, exist_ok=True)
    ann = []
    for i in range(4):
        vname = f"vid{i}"
        np.save(ft_root / "i3d_rgb" / f"{vname}.npy",
                rs.rand(3, 4).astype(np.float32))
        np.save(ft_root / "vggish" / f"{vname}.npy",
                rs.rand(3, 4).astype(np.float32))
        ann.append({
            "image_id": vname, "caption": "a cat", "summary": "cat video",
            "dialog": [{"question": "what", "answer": "a cat"}],
            "question": "color", "answer": "red",
        })
    ann_path = tmp_path / "avsd_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: dialogue
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
model:
  arch: gpt_dialogue
  gpt: {{vocab_size: 64, n_embd: 32, n_layer: 2, n_head: 2, n_positions: 128}}
  len_video_ft: 8
datasets:
  avsd_dialogue:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      videos: {json.dumps(str(ft_root))}
    vis_processor:
      train: {{name: gpt_video_ft, synthetic_vocab: 50}}
    text_processor:
      train: {{name: gpt_dialogue, synthetic_vocab: 50}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_shipped_run_configs_route_to_adapters():
    """The shipped projects-style configs parse and name a known task +
    registered builder + registered model arch."""
    from sprc_tpu.config import Config
    from sprc_tpu.registry import registry
    from sprc_tpu.train.generic import TASK_ADAPTERS

    for name in ("caption_coco_ft", "vqav2_ft", "okvqa_ft", "aokvqa_ft",
                 "retrieval_coco_ft", "nlvr_ft", "pretrain_stage1",
                 "dialogue_avsd_ft"):
        cfg = Config(f"configs/runs/{name}.yaml")
        assert cfg.run["task"] in TASK_ADAPTERS, name
        assert registry.get_model_class(cfg.model["arch"]) is not None, name
        for ds in cfg.datasets:
            assert registry.get("dataset", ds) is not None, (name, ds)


def test_all_run_configs_resolve():
    """Every configs/runs/*.yaml names a registered task adapter, dataset
    builder, and model arch (the projects-library contract: a user can point
    cli.train / cli.finetune at any shipped recipe)."""
    import glob

    import yaml

    import sprc_tpu  # noqa: F401  (registers models)
    import sprc_tpu.data.builders  # noqa: F401  (registers datasets)
    import sprc_tpu.data.processors  # noqa: F401  (registers processors)
    from sprc_tpu.registry import registry
    from sprc_tpu.train.generic import TASK_ADAPTERS

    paths = sorted(glob.glob("configs/runs/*.yaml"))
    assert len(paths) >= 14
    for path in paths:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        run = cfg.get("run", {})
        task = run.get("task")
        if task is None and "dataset" in run:
            # CIR recipes (cirr/fiq_finetune.yaml) route through cli.finetune
            assert registry.get_model_class(cfg["model"]["arch"]) is not None
            continue
        assert task in TASK_ADAPTERS, (path, task)
        arch = cfg["model"]["arch"]
        assert registry.get_model_class(arch) is not None, (path, arch)
        for ds_name, ds_cfg in cfg.get("datasets", {}).items():
            assert registry.get("dataset", ds_name) is not None, (path, ds_name)
            for split_cfg in ds_cfg.get("vis_processor", {}).values():
                assert registry.get("processor", split_cfg["name"]) is not None
            for split_cfg in ds_cfg.get("text_processor", {}).values():
                assert registry.get("processor", split_cfg["name"]) is not None


def test_snli_ve_run_config_end_to_end(tmp_path, vocab_file):
    """multimodal_classification over single-image snli_ve items
    (albef_classification, 3-way, momentum distillation) — the
    configs/runs/snli_ve_ft.yaml path at tiny dims."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "sentence": "a red cat", "label": i % 3}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "ve_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: multimodal_classification
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: albef_classification
  num_classes: 3
  image_size: 28
  use_distill: true
  momentum: 0.9
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  snli_ve:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_albef_retrieval_run_config_end_to_end(tmp_path, vocab_file):
    """retrieval task with the ALBEF family (configs/runs/
    retrieval_coco_albef_ft.yaml path at tiny dims)."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "image_id": f"id{i}", "caption": "a red cat"}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "ret_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: retrieval
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: albef_retrieval
  image_size: 28
  embed_dim: 16
  queue_size: 8
  momentum: 0.9
  vocab_size: 30524
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  coco_retrieval:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_caption}}
""")
    _run_cli(cfg, tmp_path, vocab_file)


def test_vqa_distill_run_config_end_to_end(tmp_path, vocab_file):
    """albef_vqa with use_distill: the momentum tower copies thread through
    TrainState.aux and the distilled step trains from YAML (reference
    albef_vqa.py:153-226)."""
    img_root = str(tmp_path / "imgs")
    names = _write_images(img_root, 4)
    ann = [
        {"image": n, "instance_id": i, "question": "a cat?",
         "answers": ["yes", "no", "yes"]}
        for i, n in enumerate(names)
    ]
    ann_path = tmp_path / "vqa_ann.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tmp_path / "run.yaml"
    cfg.write_text(f"""
run:
  task: vqa
  batch_size: 2
  max_epochs: 1
  learning_rate: 1e-3
  max_txt_len: 8
model:
  arch: albef_vqa
  flavor: albef
  image_size: 28
  vocab_size: 30524
  fusion_layer: 1
  use_distill: true
  momentum: 0.9
  alpha: 0.4
  vit_config_override: {TINY_VIT}
  text_config_override: {TINY_TXT}
datasets:
  coco_vqa:
    build_info:
      annotations:
        train: {json.dumps(str(ann_path))}
      images: {json.dumps(img_root)}
    vis_processor:
      train: {{name: blip_image_eval, image_size: 28}}
    text_processor:
      train: {{name: blip_question}}
""")
    _run_cli(cfg, tmp_path, vocab_file)
