"""LLM tokenizer adapters, artifact bootstrap, and the instruct CLI
synthetic end-to-end runs (VERDICT r1 items 6 and 10)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_whitespace_tokenizer_roundtrip():
    from sprc_tpu.text.llm_tokenizers import WhitespaceTokenizer

    tok = WhitespaceTokenizer(vocab_size=128)
    enc = tok(["a red dress", "dog"], max_length=8)
    assert enc["input_ids"].shape == (2, 8)
    assert enc["attention_mask"][0].sum() >= 4  # bos + 3 words + eos capped
    assert tok.decode(enc["input_ids"][0]) == "a red dress"


def test_hf_file_tokenizer_missing_file_message():
    from sprc_tpu.text.llm_tokenizers import llama_tokenizer

    with pytest.raises(FileNotFoundError, match="save_pretrained"):
        llama_tokenizer("/nonexistent/tokenizer.json")


def test_synthetic_vocab_bootstrap(tmp_path, monkeypatch):
    from sprc_tpu.utils.artifacts import ensure_bert_vocab, write_synthetic_bert_vocab
    from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

    monkeypatch.setenv("SPRC_CACHE", str(tmp_path))
    monkeypatch.delenv("SPRC_ALLOW_DOWNLOAD", raising=False)
    with pytest.raises(FileNotFoundError):
        ensure_bert_vocab()
    path = ensure_bert_vocab(synthetic_ok=True)
    tok = BertWordPieceTokenizer.from_vocab_file(path)
    # real bert-base-uncased special-token layout
    assert tok.pad_id == 0 and tok.cls_id == 101 and tok.sep_id == 102
    enc = tok(["hello"], max_length=8)
    assert enc["input_ids"][0, 0] == 101


@pytest.mark.parametrize(
    "name", ["blip2_vicuna_instruct", "blip2_instruct_cir", "blip2_t5", "blip2_opt"]
)
def test_instruct_cli_synthetic(name):
    out = subprocess.run(
        [sys.executable, "-m", "sprc_tpu.cli.instruct",
         "--model-name", name, "--synthetic", "--max-new-tokens", "4"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-500:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["model"] == name
    if payload["task"] == "retrieval":
        assert payload["finite"]
    else:
        assert payload["n_outputs"] == 2
