"""ALPRO video / GPT dialogue processors + blip_question.

Golden checks against the reference semantics (alpro_processors.py,
gpt_processors.py, blip_processors.py:71-101) on synthetic data.
"""

import numpy as np
import pytest

from sprc_tpu.data.gpt_processors import GPTDialogueProcessor, GPTVideoFeatureProcessor
from sprc_tpu.data.processors import CLIP_MEAN, CLIP_STD
from sprc_tpu.data.video_processors import (
    AlproVideoEvalProcessor,
    AlproVideoTrainProcessor,
)
from sprc_tpu.registry import registry


class _StubTok:
    """Word-level stand-in with reference-style special-token ids (the HF
    ``add_special_tokens`` assignment order: bos, eos, speaker1, speaker2,
    video, cap, pad — see gpt_processors.SPECIAL_TOKEN_ADD_ORDER)."""

    BASE = 1000

    def encode(self, text):
        return [hash(w) % self.BASE for w in text.split()]

    def special_token_id(self, name):
        order = ["<bos>", "<eos>", "<speaker1>", "<speaker2>", "<video>", "<cap>", "<pad>"]
        return self.BASE + order.index(name)


def _clip(T=4, H=40, W=52):
    rs = np.random.RandomState(0)
    return (rs.rand(T, H, W, 3) * 255).astype(np.uint8)


def test_alpro_eval_shapes_and_normalization():
    proc = AlproVideoEvalProcessor(image_size=32)
    out = proc(_clip())
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.float32
    # invert the normalization: values must land back in [0, 1]
    restored = out * np.asarray(CLIP_STD) + np.asarray(CLIP_MEAN)
    assert restored.min() > -1e-5 and restored.max() < 1 + 1e-5


def test_alpro_eval_accepts_float_clip():
    clip = _clip().astype(np.float32) / 255.0
    a = AlproVideoEvalProcessor(image_size=16)(clip)
    b = AlproVideoEvalProcessor(image_size=16)(_clip())
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_alpro_train_clip_consistent_augmentation():
    """The crop window / flip / op sequence is sampled ONCE per clip: a clip
    of identical frames must stay identical across frames after augment."""
    frame = (np.random.RandomState(1).rand(1, 48, 48, 3) * 255).astype(np.uint8)
    clip = np.repeat(frame, 6, axis=0)
    out = AlproVideoTrainProcessor(image_size=24, seed=3)(clip)
    assert out.shape == (6, 24, 24, 3)
    for t in range(1, 6):
        np.testing.assert_array_equal(out[t], out[0])


def test_alpro_train_seeded_determinism():
    clip = _clip(T=3)
    a = AlproVideoTrainProcessor(image_size=24, seed=7)(clip)
    b = AlproVideoTrainProcessor(image_size=24, seed=7)(clip)
    np.testing.assert_array_equal(a, b)


def test_gpt_dialogue_sequence_layout():
    proc = GPTDialogueProcessor(_StubTok(), max_turns=2)
    ann = {
        "caption": "a cat sits",
        "summary": "cat video",
        "dialog": [
            {"question": "what is it", "answer": "a cat"},
            {"question": "what does it do", "answer": "it sits"},
            {"question": "old turn dropped", "answer": "dropped"},
        ][:2],
        "question": "is it fluffy",
        "answer": "yes very",
    }
    item = proc(ann)
    ids, types, labels = item["input_ids"], item["token_type_ids"], item["labels"]
    assert len(ids) == len(types) == len(labels)
    tok = _StubTok()
    eos = tok.special_token_id("<eos>")
    cap = tok.special_token_id("<cap>")
    s1, s2 = tok.special_token_id("<speaker1>"), tok.special_token_id("<speaker2>")
    # caption span typed <cap>, ends with eos
    ncap = len(tok.encode("a cat sits cat video")) + 1
    assert list(types[:ncap]) == [cap] * ncap and ids[ncap - 1] == eos
    # history alternates speaker1/speaker2 starting with speaker1
    assert types[ncap] == s1 and s2 in types
    # labels: -1 everywhere except the final answer span (+ its eos)
    ans = tok.encode("yes very") + [eos]
    assert list(labels[-len(ans):]) == ans
    assert all(l == -1 for l in labels[: -len(ans)])
    # reference invariant: every turn span ends with eos
    assert int(np.sum(ids == eos)) == 1 + (2 * 2 + 1) + 1


def test_gpt_dialogue_padding_and_mask():
    proc = GPTDialogueProcessor(_StubTok())
    pad = _StubTok().special_token_id("<pad>")
    seqs = [np.asarray([1, 2, 3], np.int32), np.asarray([4], np.int32)]
    padded = proc.padding(seqs)
    assert padded.shape == (2, 3) and padded[1, 1] == pad
    mask = proc.get_attention_mask(padded)
    assert mask.tolist() == [[1, 1, 1], [1, 0, 0]]


def test_gpt_video_ft_concat_and_types(tmp_path):
    rs = np.random.RandomState(0)
    for name, d, t in [("i3d_rgb", 8, 5), ("vggish", 4, 7)]:
        (tmp_path / name).mkdir()
        np.save(tmp_path / name / "vid1.npy", rs.rand(t, d).astype(np.float32))
    proc = GPTVideoFeatureProcessor(_StubTok())
    item = proc(str(tmp_path), "vid1")
    assert item["video_fts"].shape == (5, 12)  # min_len=5, concat 8+4
    video = _StubTok().special_token_id("<video>")
    assert item["token_type_ids"].tolist() == [video] * 5


def test_gpt2_special_token_ids_match_hf_add_order(tmp_path):
    """Pin <video>=base+4, <cap>=base+5: HF GPT2Tokenizer.add_special_tokens
    walks SPECIAL_TOKENS_DICT (bos, eos, additional=[speaker1, speaker2,
    video, cap], pad) — NOT the reference's SPECIAL_TOKENS display list,
    which swaps cap/video (ADVICE r2 medium finding)."""
    tokenizers = pytest.importorskip("tokenizers")
    from sprc_tpu.data.gpt_processors import GPT2SpecialTokens

    tok = tokenizers.Tokenizer(tokenizers.models.WordLevel(
        {"hello": 0, "world": 1}, unk_token="hello"))
    path = tmp_path / "tokenizer.json"
    tok.save(str(path))
    sp = GPT2SpecialTokens(str(path))
    base = 2
    assert sp.special_token_id("<bos>") == base + 0
    assert sp.special_token_id("<eos>") == base + 1
    assert sp.special_token_id("<speaker1>") == base + 2
    assert sp.special_token_id("<speaker2>") == base + 3
    assert sp.special_token_id("<video>") == base + 4
    assert sp.special_token_id("<cap>") == base + 5
    assert sp.special_token_id("<pad>") == base + 6


def test_blip_question_processor():
    proc = registry.get_processor_class("blip_question")(max_words=3)
    assert proc("What IS this?!") == "what is this?"  # ? survives, ! stripped
    assert proc("a b c d e") == "a b c"
