"""WordPiece tokenizer parity vs HF BertTokenizer on a synthetic vocab."""

import numpy as np
import pytest

from sprc_tpu.text.tokenizer import BertWordPieceTokenizer
from sprc_tpu.text.processors import CaptionProcessor, combine_fiq_captions

VOCAB_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "a", "same", "dress", "but", "in", "red", "blue", "shirt",
    "##s", "##er", "short", "long", "is", "with", "dog", "cat", "##ing",
    "run", "walk", "don", "'", "t", ".", ",", "!", "un", "##believ",
    "##able", "##ly",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB_TOKENS) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return BertWordPieceTokenizer.from_vocab_file(vocab_file)


@pytest.fixture(scope="module")
def theirs(vocab_file):
    try:
        from transformers import BertTokenizer
    except Exception:
        pytest.skip("transformers unavailable")
    tok = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    tok.add_special_tokens({"bos_token": "[DEC]"})
    return tok

TEXTS = [
    "The same dress but in red",
    "shorts and longer shirts",
    "don't RUN, walk!",
    "unbelievably short",
    "cats dogs walking running",
    "completely-unknown wordshere",
    "accénts and ÇAPS",
    "",
]


def test_tokenize_matches_hf(ours, theirs):
    for text in TEXTS:
        assert ours.tokenize(text) == theirs.tokenize(text), text


def test_encode_matches_hf(ours, theirs):
    for text in TEXTS:
        want = theirs(
            [text], padding="max_length", truncation=True, max_length=10
        )
        got = ours([text], max_length=10)
        np.testing.assert_array_equal(
            got["input_ids"][0], np.asarray(want["input_ids"][0]), err_msg=text
        )
        np.testing.assert_array_equal(
            got["attention_mask"][0], np.asarray(want["attention_mask"][0]), err_msg=text
        )


def test_dec_token_appended(ours, theirs):
    # the reference appends [DEC] as bos (blip2.py:33); ids must line up
    assert len(ours) == len(theirs)
    assert ours.vocab["[DEC]"] == theirs.convert_tokens_to_ids("[DEC]")


def test_truncation(ours, theirs):
    text = "the same dress but in red blue shirt is with dog cat"
    want = theirs([text], padding="max_length", truncation=True, max_length=6)
    got = ours([text], max_length=6)
    np.testing.assert_array_equal(got["input_ids"][0], np.asarray(want["input_ids"][0]))


def test_caption_processor():
    proc = CaptionProcessor()
    # lowercase, punctuation stripped, whitespace collapsed
    assert proc('A "Red" Dress; NOW!') == "a red dress now"
    assert proc("make it, um, floral?") == "make it, um, floral?"
    assert proc("  many   spaces  ") == "many spaces"


def test_fiq_caption_combination():
    flat = ["is red.", "has sleeves?", "is blue,", "is long "]
    assert combine_fiq_captions(flat) == [
        "Is red and has sleeves",
        "Is blue and is long",
    ]


def test_decode_skips_bos_and_specials():
    """Regression: decode() must drop the [DEC] bos (HF skip_special_tokens
    semantics) — PNP-VQA strips the caption prompt from DECODED text, which
    never matched while '[DEC] ' survived (models/pnp_vqa.py)."""
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "picture", "of",
         "dog", "##s"])}
    tok = BertWordPieceTokenizer(vocab)
    prompt_ids = tok.caption_prompt_ids("a picture of ")
    row = list(prompt_ids) + [vocab["dog"], vocab["##s"], tok.sep_id, tok.pad_id]
    text = tok.decode(row)
    assert text == "a picture of dogs", text
    assert text.startswith("a picture of ")
