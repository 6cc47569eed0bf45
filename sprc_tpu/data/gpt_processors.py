"""GPT dialogue processors (reference: src/lavis/processors/gpt_processors.py).

Feeds :class:`sprc_tpu.models.gpt_dialogue.GptDialogue`:

- ``gpt_dialogue`` (:45-117): builds one training sequence
  ``[caption+summary] <eos> [q1] <eos> [a1] <eos> ... [question] <eos>
  [answer] <eos>`` with token-type ids (``<cap>`` for the caption span,
  ``<speaker1>/<speaker2>`` alternating per turn) and LM labels that are
  ``-1`` everywhere except the final answer span.
- ``gpt_video_ft`` (:120-170): loads pre-extracted visual/audio feature
  ``.npy`` files, truncates to the shortest stream, concatenates along the
  feature axis, and types every frame as ``<video>``.

TPU-native differences: everything is numpy (no torch pad_sequence); the
tokenizer is injected — any object with ``encode(text) -> List[int]`` and a
``special_token_id(name)`` lookup works. :class:`GPT2SpecialTokens` wraps
:class:`sprc_tpu.text.llm_tokenizers.HFFileTokenizer` (offline
``tokenizer.json``) with the reference's added special tokens; tests use a
word-level stub.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from sprc_tpu.registry import registry

# reference gpt_processors.py:22-36
SPECIAL_TOKENS = ["<bos>", "<eos>", "<speaker1>", "<speaker2>", "<cap>", "<video>", "<pad>"]

# Id-assignment order of the reference's
# ``GPT2Tokenizer.add_special_tokens(SPECIAL_TOKENS_DICT)``: HF walks the
# dict — bos, eos, additional_special_tokens (speaker1, speaker2, video,
# cap), pad — so <video>=base+4 and <cap>=base+5, NOT the SPECIAL_TOKENS
# list order (which would swap them and misalign token-type embeddings
# against reference-trained gpt_dialogue checkpoints).
SPECIAL_TOKEN_ADD_ORDER = [
    "<bos>", "<eos>", "<speaker1>", "<speaker2>", "<video>", "<cap>", "<pad>"]


class GPT2SpecialTokens:
    """GPT-2 BPE (offline tokenizer.json) + the dialogue special tokens,
    appended after the base vocab in the id order HF's
    ``GPT2Tokenizer.add_special_tokens(SPECIAL_TOKENS_DICT)`` produces
    (``vocab_size..vocab_size+6``, see SPECIAL_TOKEN_ADD_ORDER)."""

    def __init__(self, tokenizer_json: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(tokenizer_json)
        base = self._tok.get_vocab_size()
        self._special = {t: base + i for i, t in enumerate(SPECIAL_TOKEN_ADD_ORDER)}

    def encode(self, text: str) -> List[int]:
        return list(self._tok.encode(text, add_special_tokens=False).ids)

    def special_token_id(self, name: str) -> int:
        return self._special[name]


class SyntheticGPT2Tokens:
    """Word-hash stand-in with reference-ordered special-token ids — lets the
    dialogue pipeline run offline/synthetic (smoke tests, run-config CI)
    without a GPT-2 ``tokenizer.json``."""

    def __init__(self, base_vocab: int = 1000):
        self.base = base_vocab
        self._special = {
            t: base_vocab + i for i, t in enumerate(SPECIAL_TOKEN_ADD_ORDER)}

    def encode(self, text: str) -> List[int]:
        return [hash(w) % self.base for w in str(text).split()]

    def special_token_id(self, name: str) -> int:
        return self._special[name]

    @property
    def vocab_size(self) -> int:
        return self.base + len(SPECIAL_TOKEN_ADD_ORDER)


def _resolve_gpt_tokenizer(tokenizer, tokenizer_json, synthetic_vocab):
    """YAML-constructable tokenizer resolution (data/builders._processor
    instantiates processors from config kwargs, where only strings/ints can
    appear)."""
    if tokenizer is not None:
        return tokenizer
    if tokenizer_json:
        return GPT2SpecialTokens(tokenizer_json)
    if synthetic_vocab:
        return SyntheticGPT2Tokens(int(synthetic_vocab))
    raise ValueError(
        "GPT processors need one of: tokenizer (instance), tokenizer_json "
        "(offline HF gpt2 tokenizer.json path), or synthetic_vocab (int, "
        "synthetic smoke-test tokenizer)"
    )


class GPTDialogueProcessor:
    """ann dict -> {input_ids, token_type_ids, labels} int32 arrays."""

    def __init__(self, tokenizer=None, max_turns: int = 3,
                 use_caption: bool = True, tokenizer_json: Optional[str] = None,
                 synthetic_vocab: int = 0):
        self.tokenizer = _resolve_gpt_tokenizer(
            tokenizer, tokenizer_json, synthetic_vocab)
        self.max_turns = max_turns
        self.use_caption = use_caption

    def _sid(self, name: str) -> int:
        return self.tokenizer.special_token_id(name)

    def sample_sequence(
        self, caption: List[int], history: List[List[int]], answer: List[int]
    ) -> Dict[str, np.ndarray]:
        eos = self._sid("<eos>")
        speaker1, speaker2, cap = (
            self._sid("<speaker1>"), self._sid("<speaker2>"), self._sid("<cap>"))
        sequence = [caption] + history + [answer]
        sequence = [s + [eos] for s in sequence]

        input_ids = [t for s in sequence for t in s]
        token_type_ids = [cap] * len(sequence[0]) + [
            speaker2 if i % 2 else speaker1
            for i, s in enumerate(sequence[1:])
            for _ in s
        ]
        labels = [-1] * sum(len(s) for s in sequence[:-1]) + sequence[-1]
        assert len(input_ids) == len(token_type_ids) == len(labels)
        return {
            "input_ids": np.asarray(input_ids, np.int32),
            "token_type_ids": np.asarray(token_type_ids, np.int32),
            "labels": np.asarray(labels, np.int32),
        }

    def padding(self, seqs: Sequence[np.ndarray], pad_token: int = -1) -> np.ndarray:
        if pad_token == -1:
            pad_token = self._sid("<pad>")
        L = max(len(s) for s in seqs)
        out = np.full((len(seqs), L), pad_token, np.int32)
        for i, s in enumerate(seqs):
            out[i, : len(s)] = s
        return out

    def get_attention_mask(self, seq: np.ndarray, pad_token: int = -1) -> np.ndarray:
        if pad_token == -1:
            pad_token = self._sid("<pad>")
        return (seq != pad_token).astype(np.int32)

    def __call__(self, ann: dict) -> Dict[str, np.ndarray]:
        if self.use_caption:
            caption = self.tokenizer.encode(" ".join([ann["caption"], ann["summary"]]))
        else:
            caption = []
        dial_history: List[str] = []
        for turn in ann["dialog"][-self.max_turns:]:
            dial_history.append(turn["question"])
            dial_history.append(turn["answer"])
        dial_history.append(ann["question"])
        history = [self.tokenizer.encode(t) for t in dial_history]
        answer = self.tokenizer.encode(ann["answer"])
        return self.sample_sequence(caption, history, answer)


class GPTVideoFeatureProcessor:
    """(ft_root, vname) -> {video_fts [T, D], token_type_ids [T]}."""

    def __init__(self, tokenizer=None, visual_ft: Optional[Sequence[str]] = None,
                 audio_ft: Optional[Sequence[str]] = None,
                 tokenizer_json: Optional[str] = None,
                 synthetic_vocab: int = 0):
        self.tokenizer = _resolve_gpt_tokenizer(
            tokenizer, tokenizer_json, synthetic_vocab)
        self.visual_ft = list(visual_ft or ["i3d_rgb"])
        self.audio_ft = list(audio_ft or ["vggish"])

    def padding(self, seqs: Sequence[np.ndarray], pad_value: float = 1.0) -> np.ndarray:
        L = max(len(s) for s in seqs)
        D = seqs[0].shape[1]
        out = np.full((len(seqs), L, D), pad_value, np.float32)
        for i, s in enumerate(seqs):
            out[i, : len(s)] = s
        return out

    def get_attention_mask(self, seq: np.ndarray) -> np.ndarray:
        return (np.sum(seq != 1, axis=2) != 0).astype(np.int32)

    def __call__(self, ft_root: str, vname: str) -> Dict[str, np.ndarray]:
        all_ft = []
        for ft_name in self.visual_ft + self.audio_ft:
            all_ft.append(np.load(os.path.join(ft_root, ft_name, vname) + ".npy"))
        min_len = min(len(ft) for ft in all_ft)
        sampled = np.concatenate([ft[:min_len] for ft in all_ft], axis=1)
        video_type = self.tokenizer.special_token_id("<video>")
        return {
            "video_fts": sampled.astype(np.float32),
            "token_type_ids": np.full((len(sampled),), video_type, np.int32),
        }


registry.register_processor("gpt_dialogue")(GPTDialogueProcessor)
registry.register_processor("gpt_video_ft")(GPTVideoFeatureProcessor)
