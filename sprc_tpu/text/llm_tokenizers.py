"""File-driven tokenizers for the LLM heads (LLaMA / OPT / T5).

The reference builds these with ``AutoTokenizer.from_pretrained`` (e.g.
blip2_vicuna_instruct.py:57-63, blip2_opt.py:38, blip2_t5.py:40) — a hub
download. This environment is zero-egress, so the adapters load a local
``tokenizer.json`` (the HF fast-tokenizer serialization every one of those
repos ships) through the ``tokenizers`` runtime, which is baked in.

All adapters expose the same minimal interface the models/pipelines need:
``__call__(texts, max_length) -> {"input_ids", "attention_mask"}``,
``decode(ids)``, and ``pad_id`` / ``eos_id`` / ``bos_id``.

``WhitespaceTokenizer`` is the synthetic fallback for smoke tests and CI —
a stable word-level vocab built from its inputs, NOT a real tokenizer.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Sequence

import numpy as np


class HFFileTokenizer:
    """Wrap a local HF ``tokenizer.json`` via the ``tokenizers`` runtime."""

    def __init__(
        self,
        tokenizer_json: str,
        *,
        pad_id: int,
        eos_id: int,
        bos_id: Optional[int] = None,
        add_bos: bool = False,
    ):
        if not os.path.exists(tokenizer_json):
            raise FileNotFoundError(
                f"{tokenizer_json} not found. Export it once from a machine "
                "with network access: AutoTokenizer.from_pretrained(<repo>)"
                ".save_pretrained(<dir>) and point at <dir>/tokenizer.json."
            )
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(tokenizer_json)
        self.pad_id, self.eos_id, self.bos_id = pad_id, eos_id, bos_id
        self.add_bos = add_bos

    def __call__(
        self, texts: Iterable[str] | str, max_length: int = 32
    ) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        texts = list(texts)
        encs = self._tok.encode_batch(texts, add_special_tokens=False)
        ids = np.full((len(texts), max_length), self.pad_id, np.int32)
        mask = np.zeros_like(ids)
        for i, e in enumerate(encs):
            row = list(e.ids)
            if self.add_bos and self.bos_id is not None:
                row = [self.bos_id] + row
            row = row[: max_length - 1] + [self.eos_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def decode(self, ids: Sequence[int]) -> str:
        keep = [int(i) for i in ids if int(i) not in (self.pad_id, self.eos_id)]
        return self._tok.decode(keep)


def llama_tokenizer(path: str) -> HFFileTokenizer:
    """LLaMA/Vicuna: bos 1, eos 2, pad 0 (HF convention)."""
    return HFFileTokenizer(path, pad_id=0, eos_id=2, bos_id=1, add_bos=True)


def opt_tokenizer(path: str) -> HFFileTokenizer:
    """OPT (GPT2 BPE): pad 1, bos/eos 2 (facebook/opt-*)."""
    return HFFileTokenizer(path, pad_id=1, eos_id=2, bos_id=2, add_bos=True)


def t5_tokenizer(path: str) -> HFFileTokenizer:
    """T5 / UnifiedQA: pad 0 (also decoder start), eos 1."""
    return HFFileTokenizer(path, pad_id=0, eos_id=1)


def clip_tokenizer(path: str) -> HFFileTokenizer:
    """OpenAI CLIP BPE: sot 49406, eot 49407, zero-pad (openai/CLIP
    clip/simple_tokenizer.py semantics via an exported tokenizer.json)."""
    return HFFileTokenizer(path, pad_id=0, eos_id=49407, bos_id=49406,
                           add_bos=True)


def clip_tokenize(tok, texts, context_length: int = 77):
    """-> (ids [N, L], eot_positions [N]) for Clip.encode_text (the pooled
    token is the end-of-text position, reference CLIP.encode_text)."""
    import numpy as np

    enc = tok(texts, max_length=context_length)
    eot = enc["attention_mask"].sum(axis=1).astype(np.int32) - 1
    return enc["input_ids"], eot


class WhitespaceTokenizer:
    """Synthetic word-level tokenizer (smoke tests / --synthetic CLIs)."""

    def __init__(self, vocab_size: int = 512, *, pad_id: int = 0,
                 eos_id: int = 1, bos_id: int = 2):
        self.vocab_size = vocab_size
        self.pad_id, self.eos_id, self.bos_id = pad_id, eos_id, bos_id
        self._vocab: Dict[str, int] = {}
        self._inv: Dict[int, str] = {}

    def _id(self, word: str) -> int:
        if word not in self._vocab:
            import zlib

            # deterministic hash (Python's hash() is salted per process)
            # + linear probing: distinct words get distinct slots while
            # free slots remain, so decode() round-trips
            n = self.vocab_size - 3
            slot = 3 + (zlib.crc32(word.encode("utf-8")) % n)
            for _ in range(n):
                if slot not in self._inv or self._inv[slot] == word:
                    break
                slot = 3 + ((slot - 3 + 1) % n)
            self._vocab[word] = slot
            self._inv.setdefault(slot, word)
        return self._vocab[word]

    def __call__(self, texts, max_length: int = 32) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        texts = list(texts)
        ids = np.full((len(texts), max_length), self.pad_id, np.int32)
        mask = np.zeros_like(ids)
        for i, t in enumerate(texts):
            row = [self.bos_id] + [self._id(w) for w in t.split()]
            row = row[: max_length - 1] + [self.eos_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(
            self._inv.get(int(i), "?") for i in ids
            if int(i) not in (self.pad_id, self.eos_id, self.bos_id)
        )
