"""PNP-VQA / Img2Prompt pipelines at tiny dims: gradcam, patch sampling,
stochastic captioning, FiD QA, prompt construction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.blip1 import BlipCaption, BlipCaptionConfig, BlipITM
from sprc_tpu.models.pnp_vqa import (
    Img2PromptVqaPipeline,
    PnpVqaPipeline,
    prepare_qa_input,
    sample_patches,
)
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.t5 import T5Config, T5ForConditionalGeneration
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.registry import registry
from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

IMG = 32
WORDS = ["a", "picture", "of", "red", "dress", "dog", "cat", "what", "color"]
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[DEC]", "[ENC]"] + WORDS


class ToyT5Tokenizer:
    """Whitespace tokenizer with the T5 interface the pipeline needs."""

    def __init__(self, words):
        self.vocab = {w: i + 2 for i, w in enumerate(words)}
        self.inv = {v: k for k, v in self.vocab.items()}
        self.pad_id, self.eos_id = 0, 1

    def __call__(self, texts, max_length=16):
        if isinstance(texts, str):
            texts = [texts]
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros_like(ids)
        for i, t in enumerate(texts):
            row = [self.vocab.get(w, 2) for w in t.split()][: max_length - 1]
            row.append(self.eos_id)
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def decode(self, ids):
        return " ".join(
            self.inv.get(int(i), "?") for i in ids
            if int(i) not in (self.pad_id, self.eos_id)
        )


@pytest.fixture(scope="module")
def pipeline():
    from sprc_tpu.models.blip1 import BlipRetrievalConfig

    vcfg = ViTConfig(
        image_size=IMG, patch_size=16, width=24, depth=2, num_heads=2,
        mlp_hidden=48, final_norm=True, dtype=jnp.float32,
    )
    tcfg = QFormerConfig(
        vocab_size=len(VOCAB), hidden_size=24, num_layers=4, num_heads=2,
        intermediate_size=48, encoder_width=24, dropout_rate=0.0,
    )
    rcfg = BlipRetrievalConfig(
        image_size=IMG, embed_dim=8, vocab_size=len(VOCAB),
        vit_dtype=jnp.float32, vit_config_override=vcfg,
        text_config_override=tcfg,
    )
    ccfg = BlipCaptionConfig(
        image_size=IMG, vocab_size=len(VOCAB), prompt_length=4,
        vit_dtype=jnp.float32, vit_config_override=vcfg,
        text_config_override=tcfg,
    )
    t5cfg = T5Config(
        vocab_size=32, d_model=16, d_kv=8, d_ff=32, num_heads=2,
        num_layers=2, num_decoder_layers=2,
    )
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, IMG, IMG, 3), jnp.float32)
    ids = jnp.asarray(rs.randint(0, len(VOCAB), (1, 6)), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)

    itm = BlipITM(rcfg)
    itm_params = itm.init(
        jax.random.PRNGKey(0), img, ids, mask, method=itm.itm
    )["params"]
    cap = BlipCaption(ccfg)
    cap_params = cap.init(jax.random.PRNGKey(1), img, ids, mask)["params"]
    t5 = T5ForConditionalGeneration(t5cfg)
    t5_params = t5.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 3), jnp.int32),
    )["params"]

    tok = BertWordPieceTokenizer(
        {t: i for i, t in enumerate(VOCAB)}, extra_special_tokens=["[DEC]"]
    )
    return PnpVqaPipeline(
        itm_model=itm, itm_params=itm_params,
        cap_model=cap, cap_params=cap_params,
        qa_model=t5, qa_params=t5_params,
        tokenizer=tok, qa_tokenizer=ToyT5Tokenizer(WORDS),
    )


def test_prepare_qa_input_matches_reference_format():
    out = prepare_qa_input(
        ["What color?"], [["a red dress", "a dog"]],
        num_captions=2, num_captions_fid=1,
    )
    assert out == [
        ["what color? \\n a red dress.", "what color? \\n a dog."]
    ]


def test_sample_patches_without_replacement():
    w = jnp.asarray(np.random.RandomState(0).rand(2, 9), jnp.float32)
    idx = np.asarray(sample_patches(jax.random.PRNGKey(0), w, 4, 5))
    assert idx.shape == (2, 5, 4)
    for b in range(2):
        for s in range(5):
            row = idx[b, s]
            assert len(set(row.tolist())) == 4  # no replacement
            assert (np.diff(row) > 0).all()  # sorted


def test_forward_itm_gradcam_shape(pipeline):
    rs = np.random.RandomState(1)
    imgs = rs.rand(2, IMG, IMG, 3).astype(np.float32)
    g = pipeline.forward_itm(imgs, ["what color dress", "dog or cat"], block_num=1)
    assert g.shape == (2, 4)  # 32/16 -> 2x2 patches
    assert np.isfinite(g).all()
    assert (g >= 0).all()  # cams * relu(grads)


def test_full_pipeline_runs(pipeline):
    rs = np.random.RandomState(2)
    imgs = rs.rand(1, IMG, IMG, 3).astype(np.float32)
    answers, captions, gradcams = pipeline.predict_answers(
        imgs, ["what color"], num_captions=3, num_patches=2,
        cap_max_length=8, max_len=6, block_num=1,
    )
    assert len(answers) == 1 and isinstance(answers[0], str)
    assert len(captions) == 1 and len(captions[0]) >= 1
    assert gradcams.shape == (1, 4)


def test_img2prompt_pipeline(pipeline):
    p2 = Img2PromptVqaPipeline(
        itm_model=pipeline.itm_model, itm_params=pipeline.itm_params,
        cap_model=pipeline.cap_model, cap_params=pipeline.cap_params,
        qa_model=pipeline.qa_model, qa_params=pipeline.qa_params,
        tokenizer=pipeline.tokenizer, qa_tokenizer=pipeline.qa_tokenizer,
        itm_filter_threshold=0.0,  # random-init ITM: keep all captions
    )
    rs = np.random.RandomState(3)
    imgs = rs.rand(1, IMG, IMG, 3).astype(np.float32)
    prompts = p2.predict_prompts(
        imgs, ["what color"], block_num=1, num_captions=3, num_patches=2,
        cap_max_length=8,
    )
    assert len(prompts) == 1
    assert prompts[0].startswith("Please reason the answer")
    assert prompts[0].endswith("Question:what color\nAnswer:")


def test_registry_entries():
    assert registry.get_model_class("pnp_vqa") is PnpVqaPipeline
    assert registry.get_model_class("img2prompt_vqa") is Img2PromptVqaPipeline


def test_fid_t5_independent_context_encoding():
    """FiD invariant (reference pnp_unifiedqav2_fid.py:69-110): contexts are
    encoded independently — batched [B, n_ctx, L] encoding must equal each
    context encoded alone; decoder logits change when any context changes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sprc_tpu.models.pnp_vqa import FiDT5, fid_generate
    from sprc_tpu.models.t5 import T5Config
    from sprc_tpu.registry import registry

    assert registry.get_model_class("pnp_unifiedqav2_fid") is FiDT5

    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                   num_layers=2, num_decoder_layers=2, dtype=jnp.float32)
    m = FiDT5(cfg)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(2, 64, (2, 3, 7)), jnp.int32)
    mask = jnp.ones((2, 3, 7), jnp.int32)
    dec = jnp.asarray(rs.randint(2, 64, (2, 4)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids, mask, dec)["params"]

    enc_out, enc_mask = m.apply({"params": params}, ids, mask,
                                method=m.encode_contexts)
    t5 = m.bind({"params": params}).t5
    sep = jnp.concatenate(
        [t5.encode_ids(ids[:, c], mask[:, c]) for c in range(3)], axis=1
    )
    np.testing.assert_allclose(np.asarray(enc_out), np.asarray(sep), atol=1e-6)
    assert enc_mask.shape == (2, 21)

    logits = m.apply({"params": params}, ids, mask, dec)
    ids2 = ids.at[:, 1].set(jnp.flip(ids[:, 1], axis=-1))
    logits2 = m.apply({"params": params}, ids2, mask, dec)
    # untrained tiny weights react weakly; nonzero proves the decoder
    # attends into context 1's span of the fused memory
    assert float(jnp.max(jnp.abs(logits - logits2))) > 1e-6

    out = fid_generate(m, params, ids, mask, pad_id=0, eos_id=1, max_length=6)
    assert np.asarray(out).shape == (2, 6)
