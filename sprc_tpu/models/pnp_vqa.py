"""PNP-VQA and Img2Prompt-VQA zero-shot pipelines — TPU-native.

Re-implementations (not ports) of the two plug-and-play VQA pipelines:

- ``pnp_vqa`` (reference src/lavis/models/pnp_vqa_models/pnp_vqa.py:20-339):
  (1) GradCAM from BLIP-ITM localizes question-relevant patches,
  (2) BLIP-Caption samples stochastic captions from gradcam-weighted patch
  subsets, (3) a UnifiedQA-style T5 answers with Fusion-in-Decoder over
  question+caption contexts.
- ``img2prompt_vqa`` (img2prompt_models/img2prompt_vqa.py:30-587): same
  localization + captioning (with an ITM filter), then exemplar-prompt
  construction (answer extraction, T5 question generation, context/task
  prompts) for an external LLM.

TPU-first notes: patch sampling uses Gumbel top-k (`jax.random`) instead of
host-side ``torch.multinomial`` — sampling without replacement stays on
device; caption sampling uses the fixed-shape jitted decode of
models/generation.py. The pipelines hold (model, params) pairs — they are
eval orchestrators, not trainable modules, matching the reference's
composition of three pretrained submodels.

Deviations (documented): Img2Prompt's answer extraction uses spaCy POS tags
+ NER in the reference; spaCy isn't in this image, so the default is the
bundled rule-based tagger (:mod:`sprc_tpu.text.pos`: open-class tokens +
capitalized-span/gazetteer entities + noun chunks — same extraction shape;
a ``tagger`` callable can restore exact spaCy behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from flax import linen as nn

from sprc_tpu.models.generation import greedy_generate_fn, sample_generate
from sprc_tpu.models.t5 import T5Config, T5ForConditionalGeneration
from sprc_tpu.registry import registry
from sprc_tpu.utils.gradcam import compute_gradcam

# --------------------------------------------------------------------- utils


def prepare_qa_input(
    questions: Sequence[str],
    captions: Sequence[Sequence[str]],
    *,
    num_captions: int,
    num_captions_fid: int,
) -> List[List[str]]:
    """question+caption FiD contexts (reference pnp_vqa_models/__init__.py)."""
    out = []
    for question, caps in zip(questions, captions):
        contexts, chunk = [], ""
        kept = list(caps)[:num_captions]
        for cap_id, cap in enumerate(kept):
            chunk += cap.strip() + ". "
            # the reference guarantees exactly num_captions upstream; here
            # upstream filters can leave fewer, so 'last' must track the
            # ACTUAL count or the trailing partial chunk is dropped
            last = (cap_id + 1) == len(kept)
            if last or (cap_id + 1) % num_captions_fid == 0:
                contexts.append(
                    question.lower().strip() + " \\n " + chunk.lower().strip()
                )
                chunk = ""
            if last:
                break
        out.append(contexts)
    return out


_STOPWORDS = frozenset(
    """a an the is are was were be been being am do does did have has had i you
    he she it we they this that these those there here of in on at to for with
    from by and or not no nor but if then else when what which who whom how why
    where can could may might shall should will would must as its his her their
    our your my me him them us very so such than too also just only even still
    about into over under again further once during both each few more most
    other some any all own same s t don now d ll m o re ve y ain aren couldn
    didn doesn hadn hasn haven isn ma mightn mustn needn shan shouldn wasn
    weren won wouldn""".split()
)


def _heuristic_answer_candidates(caption: str) -> List[str]:
    """Stopword-filtered unigrams + bigrams, a spaCy-free stand-in for the
    reference's POS/NER/noun-chunk extraction (img2prompt_vqa.py:252-295)."""
    words = [w.strip(".,!?'\"").lower() for w in caption.split()]
    words = [w for w in words if w]
    cands = [w for w in words if w not in _STOPWORDS and not w.isdigit()]
    for i in range(len(words) - 1):
        if words[i] not in _STOPWORDS and words[i + 1] not in _STOPWORDS:
            cands.append(f"{words[i]} {words[i + 1]}")
    return cands


def sample_patches(
    rng: jax.Array, weights: jnp.ndarray, num_patches: int, num_samples: int
) -> jnp.ndarray:
    """Gumbel top-k sampling without replacement from per-patch weights.

    weights: [B, P] (unnormalized, nonnegative). -> sorted indices
    [B, num_samples, num_patches] into the patch axis (0-based; callers add
    1 to skip the CLS row like the reference's ``patch_id + 1``).
    """
    B, P = weights.shape
    logw = jnp.log(jnp.maximum(weights, 1e-12))
    g = jax.random.gumbel(rng, (B, num_samples, P))
    scores = logw[:, None, :] + g
    idx = jax.lax.top_k(scores, num_patches)[1]  # [B, ns, np]
    return jnp.sort(idx, axis=-1)


# ----------------------------------------------------------------- pipelines


@dataclasses.dataclass
class PnpVqaPipeline:
    """PNP-VQA (reference pnp_vqa.py). Holds (model, params) for the three
    submodels plus their tokenizers.

    itm_model: BlipITM; cap_model: BlipCaption; qa_model:
    T5ForConditionalGeneration (UnifiedQA-v2 weights in deployment).
    """

    itm_model: object
    itm_params: Dict
    cap_model: object
    cap_params: Dict
    qa_model: object
    qa_params: Dict
    tokenizer: object  # BERT wordpiece (ITM + caption)
    qa_tokenizer: object  # T5 sentencepiece-style, with encode/decode
    prompt: str = "a picture of "

    @classmethod
    def from_config(cls, mcfg: Dict, *, rng=None, vocab_path=None,
                    qa_tokenizer=None, **kw):
        """Assemble the pipeline from a pnp_vqa model-config section
        (reference pnp_vqa.py ``from_config`` over
        configs/models/pnp-vqa/*.yaml): the three nested sub-sections
        (``image_question_matching_model`` / ``image_captioning_model`` /
        ``question_answering_model``) each carry ``arch`` + ``model_type``
        and resolve through the shared model-YAML library; extra keys are
        per-submodel config overrides. Params are randomly initialized
        unless a sub-section carries ``finetuned: <local path>`` (the
        reference's per-submodel checkpoint URLs), which loads the torch
        weights through the class-dispatched importer
        (:func:`sprc_tpu.interop.torch_import.load_checkpoint_auto`).
        """
        import jax as _jax

        from sprc_tpu.loader import build_model
        from sprc_tpu.text.tokenizer import BertWordPieceTokenizer
        from sprc_tpu.utils.artifacts import ensure_bert_vocab

        if rng is None:
            rng = _jax.random.PRNGKey(0)

        ckpts = {}

        def _sub(section: str):
            sub = dict(mcfg.get(section) or {})
            # per-submodel released-weight path (the reference YAMLs'
            # ``finetuned:`` URLs, configs/models/pnp-vqa/*.yaml); loaded
            # through the class-dispatched importer below
            ckpts[section] = sub.pop("finetuned", None)
            arch = sub.pop("arch")
            model_type = sub.pop("model_type", "pretrain")
            if arch == "t5":  # plain seq2seq T5 (Img2Prompt's QG model)
                from sprc_tpu.models.llm_presets import t5_preset
                from sprc_tpu.models.t5 import T5ForConditionalGeneration

                cfg = t5_preset(sub.pop("t5_model", "t5-large"))
                if sub:
                    import dataclasses as _dc

                    cfg = _dc.replace(cfg, **sub)
                return T5ForConditionalGeneration(cfg)
            return build_model(arch, model_type, **sub)

        itm = _sub("image_question_matching_model")
        cap = _sub("image_captioning_model")
        qa = _sub("question_answering_model")

        r_itm, r_cap, r_qa = _jax.random.split(rng, 3)
        img_sz = itm.cfg.image_size
        img = jnp.zeros((1, img_sz, img_sz, 3), jnp.float32)
        ids = jnp.zeros((1, 6), jnp.int32)
        mask = jnp.ones((1, 6), jnp.int32)
        itm_params = itm.init(r_itm, img, ids, mask, method=itm.itm)["params"]
        cap_img = jnp.zeros(
            (1, cap.cfg.image_size, cap.cfg.image_size, 3), jnp.float32)
        cap_params = cap.init(r_cap, cap_img, ids, mask)["params"]
        if hasattr(qa, "encode_contexts"):  # FiD reader: [B, n_ctx, L]
            qa_params = qa.init(
                r_qa, jnp.zeros((1, 2, 8), jnp.int32),
                jnp.ones((1, 2, 8), jnp.int32), jnp.zeros((1, 3), jnp.int32),
            )["params"]
        else:  # plain T5 (Img2Prompt question generation)
            qa_params = qa.init(
                r_qa, jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 3), jnp.int32),
            )["params"]

        def _maybe_load(section, model, init_params):
            path = ckpts.get(section)
            if not path:
                return init_params
            from sprc_tpu.interop.torch_import import load_checkpoint_auto

            return load_checkpoint_auto(path, model)

        itm_params = _maybe_load("image_question_matching_model", itm, itm_params)
        cap_params = _maybe_load("image_captioning_model", cap, cap_params)
        qa_params = _maybe_load("question_answering_model", qa, qa_params)

        tokenizer = BertWordPieceTokenizer.from_vocab_file(
            ensure_bert_vocab(vocab_path), extra_special_tokens=["[DEC]"])
        if qa_tokenizer is None:
            from sprc_tpu.text.llm_tokenizers import WhitespaceTokenizer

            qa_tokenizer = WhitespaceTokenizer()
        return cls(
            itm_model=itm, itm_params=itm_params,
            cap_model=cap, cap_params=cap_params,
            qa_model=qa, qa_params=qa_params,
            tokenizer=tokenizer, qa_tokenizer=qa_tokenizer,
            prompt=mcfg.get("prompt", "a picture of "), **kw,
        )

    # -- logits_fn cache (keyed on the model object so swapping e.g.
    # ``self.cap_model`` invalidates the cached closure instead of silently
    # reusing the stale module with the new params — ADVICE r2) -----------
    def _cached_logits_fn(self, name: str, model):
        entry = self.__dict__.get(name)
        if entry is not None and entry[0] is model:
            return entry[1]
        return None

    def _store_logits_fn(self, name: str, model, fn) -> None:
        self.__dict__[name] = (model, fn)

    def _fused_cache(self, name: str, model) -> Dict:
        """Persistent decode-loop program cache, invalidated when the
        model object it was built for is swapped (same hazard as
        ``_cached_logits_fn``: the fused programs close over the old
        module's jitted apply)."""
        entry = self.__dict__.get(name)
        if entry is None or entry[0] is not model:
            entry = (model, {})
            self.__dict__[name] = entry
        return entry[1]

    # -- stage 1: localization ------------------------------------------
    def forward_itm(self, images, questions: Sequence[str], *, block_num=7):
        """-> gradcams [B, num_patches] (token-averaged map)."""
        q = [t.strip("?") for t in questions]
        enc = self.tokenizer(q, max_length=35, enc_token=True)
        avg, _ = compute_gradcam(
            self.itm_model, self.itm_params, jnp.asarray(images),
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]),
            block_num=block_num,
        )
        return avg

    # -- stage 2: stochastic captioning ----------------------------------
    def forward_cap(
        self,
        rng: jax.Array,
        images,
        gradcams: np.ndarray,
        *,
        num_captions: int = 100,
        num_patches: int = 20,
        cap_max_length: int = 20,
        cap_min_length: int = 0,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        max_rounds: int = 5,
    ) -> List[List[str]]:
        model, params = self.cap_model, self.cap_params
        encoder_out = model.apply(
            {"params": params}, jnp.asarray(images),
            method=lambda m, im: m.visual_encoder(im).astype(jnp.float32),
        )
        B, S, D = encoder_out.shape
        prompt_ids = self.tokenizer.caption_prompt_ids(self.prompt)  # [P]
        captions: List[List[str]] = [[] for _ in range(B)]

        for _ in range(max_rounds):
            if min(len(c) for c in captions) >= num_captions:
                break
            rng, r1, r2 = jax.random.split(rng, 3)
            idx = sample_patches(
                r1, jnp.asarray(gradcams), num_patches, num_captions
            ) + 1  # skip CLS (reference pnp_vqa.py:128)
            gathered = jnp.take_along_axis(
                encoder_out[:, None], idx[..., None], axis=2
            ).reshape(B * num_captions, num_patches, D)

            prompts = jnp.broadcast_to(
                jnp.asarray(prompt_ids, jnp.int32)[None],
                (B * num_captions, len(prompt_ids)),
            )

            # long-lived logits_fn (per-round patch memory AND params
            # threaded through ``memory`` — params as traced args, not baked
            # constants, so swapping pipeline params takes effect and the
            # compiled program doesn't embed the weights): ONE compiled
            # decode step across rounds and calls
            logits_fn = self._cached_logits_fn("_cap_logits_fn", self.cap_model)
            if logits_fn is None:
                cap_model = self.cap_model

                def logits_fn(ids, memory):
                    gathered_, params_ = memory
                    mask = jnp.ones_like(ids)
                    return cap_model.apply(
                        {"params": params_}, ids, mask, gathered_,
                        method=cap_model.decode_logits,
                    )
                self._store_logits_fn("_cap_logits_fn", self.cap_model, logits_fn)

            out = sample_generate(
                logits_fn, prompts, rng=r2,
                eos_token_id=self.tokenizer.sep_id,
                pad_token_id=self.tokenizer.pad_id,
                max_length=cap_max_length, min_length=cap_min_length,
                top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty,
                memory=(gathered, self.cap_params),
            )
            texts = [self.tokenizer.decode(row) for row in np.asarray(out)]
            for counter, text in enumerate(texts):
                ind = counter // num_captions
                cap = text[len(self.prompt):] if text.startswith(self.prompt) else text
                if len(captions[ind]) < num_captions and cap:
                    if not any(cap in c for c in captions[ind]):
                        captions[ind].append(cap)
        return captions

    # -- stage 3: FiD question answering ---------------------------------
    def forward_qa(
        self,
        questions: Sequence[str],
        captions: Sequence[Sequence[str]],
        *,
        num_captions: int = 100,
        num_captions_fid: int = 1,
        max_len: int = 20,
        min_len: int = 0,
        ctx_max_length: int = 64,
    ) -> List[str]:
        contexts = prepare_qa_input(
            questions, captions,
            num_captions=num_captions, num_captions_fid=num_captions_fid,
        )
        model, params = self.qa_model, self.qa_params
        answers = []
        for question, ctxs in zip(questions, contexts):
            if not ctxs:
                # zero surviving captions (all sampled captions empty or
                # ITM-filtered): an empty FiD memory would softmax over zero
                # keys -> NaN logits -> garbage answer. Answer from the
                # question alone instead.
                ctxs = [question.lower().strip() + " \\n "]
            enc = self.qa_tokenizer(ctxs, max_length=ctx_max_length)
            ids = jnp.asarray(enc["input_ids"], jnp.int32)  # [n_ctx, L]
            mask = jnp.asarray(enc["attention_mask"], jnp.int32)
            enc_out = model.apply(
                {"params": params}, ids, mask, method=model.encode_ids
            )
            n_ctx, L, D = enc_out.shape
            # Fusion-in-Decoder: contexts encoded independently, decoder
            # cross-attends over their concatenation (pnp_unifiedqav2_fid.py)
            enc_flat = enc_out.reshape(1, n_ctx * L, D)
            mask_flat = mask.reshape(1, n_ctx * L)

            # KV-cached FiD decode: cross-attn K/V of the n_ctx*L fused
            # memory projected ONCE at prefill instead of per token
            # (reference past_key_values, HF modeling_t5.py; stepwise-equal
            # to the recompute path, tests/test_llm_cache.py)
            name = f"_qa_prefill_fn_{max_len}"
            prefill_fn = self._cached_logits_fn(name, self.qa_model)
            if prefill_fn is None:
                qa_model = self.qa_model
                s_max = max_len

                def prefill_fn(p, dec, enc, m):
                    return qa_model.apply(
                        {"params": p}, dec, enc, m, s_max,
                        method=lambda mdl, *a: mdl.decode_prefill(*a))
                prefill_fn = jax.jit(prefill_fn)
                self._store_logits_fn(name, self.qa_model, prefill_fn)
            step_fn_jit = self._cached_logits_fn("_qa_step_fn", self.qa_model)
            if step_fn_jit is None:
                qa_model = self.qa_model

                def step_fn_jit(p, tok, t, cache, em):
                    return qa_model.apply(
                        {"params": p}, tok, t, cache, em,
                        method=lambda mdl, *a: mdl.decode_step_logits(*a))
                step_fn_jit = jax.jit(step_fn_jit)
                self._store_logits_fn("_qa_step_fn", self.qa_model, step_fn_jit)

            bos = jnp.asarray([[self.qa_tokenizer.pad_id]], jnp.int32)  # T5 starts at pad
            logits0, cache = prefill_fn(self.qa_params, bos, enc_flat, mask_flat)

            def step_fn(tok, pos, state):
                cache, p, em = state
                logits, cache = step_fn_jit(p, tok, pos[0], cache, em)
                return logits, (cache, p, em)
            step_fn.__sprc_step_cache__ = self._fused_cache(
                "_qa_fused_cache", self.qa_model)

            from sprc_tpu.models.generation import cached_greedy_loop

            out = cached_greedy_loop(
                logits0, (cache, self.qa_params, mask_flat),
                jnp.ones((1,), jnp.int32), step_fn,
                eos_token_id=self.qa_tokenizer.eos_id,
                pad_token_id=self.qa_tokenizer.pad_id,
                max_new_tokens=max_len - 1, min_new_tokens=min_len,
            )
            answers.append(self.qa_tokenizer.decode(np.asarray(out)[0]))
        return answers

    # -- full pipeline ----------------------------------------------------
    def predict_answers(
        self, images, questions: Sequence[str], *, seed: int = 0,
        num_captions: int = 50, num_captions_fid: int = 1,
        num_patches: int = 50, block_num: int = 7, **kw,
    ):
        """-> (answers, captions, gradcams) (reference pnp_vqa.py:233-339)."""
        if isinstance(questions, str):
            questions = [questions]
        assert len(questions) == np.asarray(images).shape[0]
        gradcams = self.forward_itm(images, questions, block_num=block_num)
        captions = self.forward_cap(
            jax.random.PRNGKey(seed), images, gradcams,
            num_captions=num_captions, num_patches=num_patches,
            **{k: v for k, v in kw.items() if k in (
                "cap_max_length", "cap_min_length", "top_k", "top_p",
                "repetition_penalty")},
        )
        answers = self.forward_qa(
            questions, captions,
            num_captions=num_captions, num_captions_fid=num_captions_fid,
            **{k: v for k, v in kw.items() if k in ("max_len", "min_len")},
        )
        return answers, captions, gradcams


@dataclasses.dataclass
class Img2PromptVqaPipeline(PnpVqaPipeline):
    """Img2Prompt-VQA (reference img2prompt_vqa.py): PNP localization +
    filtered captioning, then LLM prompt construction. ``qa_model`` here is
    the question-generation T5.

    ``tagger``: answer-candidate extractor, ``caption -> [candidates]``.
    The reference uses spaCy POS tags + entities + noun chunks
    (img2prompt_vqa.py:252-310); the built-in default is the bundled
    rule-based tagger (:mod:`sprc_tpu.text.pos` — open-class tokens +
    capitalized-span/gazetteer entities + noun chunks). To match the
    reference exactly, inject a spaCy
    tagger::

        nlp = spacy.load("en_core_web_sm")

        def spacy_tagger(caption):
            doc = nlp(caption)
            cands = [t.text for t in doc
                     if t.pos_ in ("NOUN", "VERB", "ADJ", "NUM", "PROPN")]
            cands += [c.text for c in doc.noun_chunks]
            return cands

        pipe = Img2PromptVqaPipeline(..., tagger=spacy_tagger)
    """

    tagger: Optional[Callable[[str], List[str]]] = None
    itm_filter_threshold: float = 0.5

    def forward_cap(self, rng, images, gradcams, **kw):
        """Caption sampling + ITM match filter (img2prompt_vqa.py:228-246:
        captions kept only when P(match) >= 0.5)."""
        threshold = self.itm_filter_threshold
        caps = super().forward_cap(rng, images, gradcams, **kw)
        kept: List[List[str]] = []
        for b, group in enumerate(caps):
            if not group:
                kept.append(group)
                continue
            enc = self.tokenizer(group, max_length=35, enc_token=True)
            img = jnp.asarray(np.asarray(images)[b])[None]
            image_embeds = self.itm_model.apply(
                {"params": self.itm_params}, img,
                method=lambda m, im: m.visual_encoder(im).astype(jnp.float32),
            )
            image_embeds = jnp.broadcast_to(
                image_embeds, (len(group),) + image_embeds.shape[1:]
            )
            p_match = self.itm_model.apply(
                {"params": self.itm_params},
                jnp.asarray(enc["input_ids"]),
                jnp.asarray(enc["attention_mask"]),
                image_embeds,
                method=self.itm_model.itm_embeds,
            )
            kept.append(
                [c for c, p in zip(group, np.asarray(p_match)) if p >= threshold]
            )
        return kept

    def answer_extraction(self, captions: Sequence[str], *,
                          num_question_generation: int = 30):
        """-> (qg contexts, answers, answer->caption map)
        (img2prompt_vqa.py:252-310)."""
        from sprc_tpu.text.pos import answer_candidates

        extract = self.tagger or answer_candidates
        cap_use = ""
        answers: List[str] = []
        ans_to_cap: Dict[str, List[int]] = {}
        for cap_idx, cap in enumerate(captions):
            cap_use += cap
            for cand in extract(cap):
                key = cand.lower()
                ans_to_cap.setdefault(key, [])
                if cap_idx not in ans_to_cap[key]:
                    ans_to_cap[key].append(cap_idx)
                answers.append(cand)
        answers = sorted(answers, key=answers.count, reverse=True)
        real = []
        for a in answers:
            a = a + "."
            if a not in real:
                real.append(a)
        contexts = [
            "answer: %s  context: %s." % (a, cap_use)
            for a in real[:num_question_generation]
        ]
        contexts.append("answer: %s  context: %s." % ("yes.", cap_use))
        return contexts, real[:num_question_generation] + ["yes."], ans_to_cap

    def forward_qa_generation(self, captions: Sequence[str], *,
                              max_length: int = 30, ctx_max_length: int = 128,
                              num_beams: int = 3):
        """T5 question generation per extracted answer
        (img2prompt_vqa.py:312-348; beam-3 with KV-cached device beam,
        matching the reference's ``num_beams=3`` generate call)."""
        from sprc_tpu.models.generation import cached_beam_loop

        contexts, answers, ans_to_cap = self.answer_extraction(captions)
        model, params = self.qa_model, self.qa_params
        K = num_beams
        questions = []
        for i in range(0, len(contexts), 10):
            enc = self.qa_tokenizer(contexts[i:i + 10], max_length=ctx_max_length)
            ids = jnp.asarray(enc["input_ids"], jnp.int32)
            mask = jnp.asarray(enc["attention_mask"], jnp.int32)
            enc_out = model.apply(
                {"params": params}, ids, mask, method=model.encode_ids
            )
            Bq = ids.shape[0]
            enc_rep = jnp.repeat(enc_out, K, axis=0)
            mask_rep = jnp.repeat(mask, K, axis=0)

            name = f"_qg_prefill_fn_{max_length}"
            prefill_fn = self._cached_logits_fn(name, self.qa_model)
            if prefill_fn is None:
                qa_model = self.qa_model
                s_max = max_length

                def prefill_fn(p, dec, enc_, m):
                    return qa_model.apply(
                        {"params": p}, dec, enc_, m, s_max,
                        method=lambda mdl, *a: mdl.decode_prefill(*a))
                prefill_fn = jax.jit(prefill_fn)
                self._store_logits_fn(name, self.qa_model, prefill_fn)
            step_fn_jit = self._cached_logits_fn("_qg_step_fn", self.qa_model)
            if step_fn_jit is None:
                qa_model = self.qa_model

                def step_fn_jit(p, tok, t, cache, em):
                    return qa_model.apply(
                        {"params": p}, tok, t, cache, em,
                        method=lambda mdl, *a: mdl.decode_step_logits(*a))
                step_fn_jit = jax.jit(step_fn_jit)
                self._store_logits_fn("_qg_step_fn", self.qa_model, step_fn_jit)

            bos = jnp.full((Bq * K, 1), self.qa_tokenizer.pad_id, jnp.int32)
            logits0, cache = prefill_fn(params, bos, enc_rep, mask_rep)

            def step_fn(tok, pos, state):
                cache, p, em = state
                logits, cache = step_fn_jit(p, tok, pos[0], cache, em)
                return logits, (cache, p, em)
            step_fn.__sprc_step_cache__ = self._fused_cache(
                "_qg_fused_cache", self.qa_model)

            def gather_fn(state, rows):
                cache, p, em = state
                cache = jax.tree.map(lambda x: x[rows], cache)
                return (cache, p, em[rows])

            out = cached_beam_loop(
                logits0, (cache, params, mask_rep),
                jnp.ones((Bq * K,), jnp.int32), step_fn, gather_fn,
                num_beams=K, eos_token_id=self.qa_tokenizer.eos_id,
                pad_token_id=self.qa_tokenizer.pad_id,
                max_new_tokens=max_length - 1,
            )
            questions += [
                self.qa_tokenizer.decode(row) for row in np.asarray(out)
            ]
        return {"questions": questions, "answers": answers,
                "ans_to_cap_dict": ans_to_cap}

    # -- prompt construction (pure string logic, :349-463) ----------------
    @staticmethod
    def create_context_prompt(sample: Dict, num_caps_per_img: int = 30) -> str:
        ans_to_cap = sample["ans_to_cap_dict"]
        caption = sample["captions"]
        answers = sample["answers"]
        out, used = "", []
        for idx in range(num_caps_per_img):
            key = answers[(len(answers) - 1 - idx) % len(answers)][:-1].lower()
            for cap_id in ans_to_cap.get(key, [0]):
                if cap_id not in used and cap_id < len(caption):
                    out += caption[cap_id]
                    used.append(cap_id)
                    break
        return out

    @staticmethod
    def create_task_prompt(sample: Dict, num_question_per_img: int = 30) -> str:
        questions, answers = sample["questions"], sample["answers"]
        out = ""
        for idx in range(min(num_question_per_img, 1)):
            # the reference's non-'rule' branch emits one yes/no exemplar
            # pair (:390-404); its rule branch is dead code ('question_type'
            # string compared to 'rule')
            out += "Question:" + questions[-1] + "\n" + "Answer:yes\n"
            out += "Question:Is this a toilet?\nAnswer:no\n"
        del answers
        return out

    def prompts_construction(
        self, sample: Dict, *, num_caps_per_img: int = 30,
        num_question_per_img: int = 30,
    ) -> str:
        head = ("Please reason the answer of the questions according to the "
                "given contexts.\n")
        ctx = self.create_context_prompt(sample, num_caps_per_img)
        task = self.create_task_prompt(sample, num_question_per_img)
        return (head + "Contexts:" + ctx + "\n" + task + "Question:" +
                sample["text_input"] + "\nAnswer:")

    def predict_prompts(self, images, questions: Sequence[str], *,
                        seed: int = 0, block_num: int = 7, **kw):
        """-> list of LLM prompts, one per image/question."""
        gradcams = self.forward_itm(images, questions, block_num=block_num)
        captions = self.forward_cap(
            jax.random.PRNGKey(seed), images, gradcams, **kw
        )
        prompts = []
        for b, question in enumerate(questions):
            qa = self.forward_qa_generation(captions[b])
            sample = {"captions": captions[b], "text_input": question, **qa}
            prompts.append(self.prompts_construction(sample))
        return prompts


# Registry entries: the pipelines are constructed from submodels, so the
# registry exposes the classes themselves (reference from_config builds the
# three submodels from sub-configs the same way).
registry.register_model("pnp_vqa", override=True)(PnpVqaPipeline)
registry.register_model("img2prompt_vqa", override=True)(Img2PromptVqaPipeline)


class FiDT5(nn.Module):
    """Fusion-in-Decoder T5 (reference pnp_vqa_models/pnp_unifiedqav2_fid.py:
    19-110, after facebookresearch/FiD): each of ``n_ctx`` contexts is
    encoded INDEPENDENTLY (relative-position bias stays per-context), then
    the decoder cross-attends over the concatenation of all encoder outputs.

    Inputs are ``[B, n_ctx, L]``; the reference flattens to ``[B, n_ctx*L]``
    and un-flattens inside its encoder wrapper — here the reshape pair is
    explicit and jit-friendly (static n_ctx from the input shape).
    """

    config: T5Config

    def setup(self) -> None:
        self.t5 = T5ForConditionalGeneration(self.config, name="t5")

    def encode_ids(self, input_ids, attention_mask=None):
        """Per-context encode, [n, L] -> [n, L, D] (the pipeline fuses the
        contexts itself; same surface as T5ForConditionalGeneration)."""
        return self.t5.encode_ids(input_ids, attention_mask)

    def encode_contexts(self, input_ids, attention_mask):
        """[B, n_ctx, L] -> (enc_out [B, n_ctx*L, D], mask [B, n_ctx*L])."""
        B, n_ctx, L = input_ids.shape
        enc = self.t5.encode_ids(
            input_ids.reshape(B * n_ctx, L), attention_mask.reshape(B * n_ctx, L)
        )
        D = enc.shape[-1]
        return enc.reshape(B, n_ctx * L, D), attention_mask.reshape(B, n_ctx * L)

    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 decoder_mask=None):
        enc_out, enc_mask = self.encode_contexts(input_ids, attention_mask)
        return self.t5.decode(decoder_input_ids, enc_out, enc_mask, decoder_mask)

    def decode(self, decoder_input_ids, enc_out, enc_mask=None, decoder_mask=None):
        return self.t5.decode(decoder_input_ids, enc_out, enc_mask, decoder_mask)

    def decode_prefill(self, decoder_input_ids, enc_out, enc_mask, s_max: int):
        return self.t5.decode_prefill(decoder_input_ids, enc_out, enc_mask, s_max)

    def decode_step_logits(self, tok, t, cache, enc_mask=None):
        return self.t5.decode_step_logits(tok, t, cache, enc_mask)


# long-lived jitted FiD decode programs per model id
# keyed by the module itself (value-hashable); see blip2_opt.py note
_FID_GEN_CACHE: Dict[object, Dict] = {}


def fid_generate(model, params, input_ids, attention_mask, *, pad_id: int,
                 eos_id: int, max_length: int = 20, min_length: int = 0,
                 use_cache: bool = True):
    """Greedy FiD generation (reference .generate, num_beams=1 default).

    ``use_cache=True`` (default) runs the KV-cached decoder: cross-attn K/V
    of the (large: n_ctx*L tokens) fused encoder memory are projected ONCE
    at prefill instead of per generated token (reference past_key_values,
    HF modeling_t5.py) — stepwise-equal to the recompute path."""
    enc_out, enc_mask = model.apply(
        {"params": params}, input_ids, attention_mask,
        method=model.encode_contexts,
    )
    B = input_ids.shape[0]
    bos = jnp.full((B, 1), pad_id, jnp.int32)  # T5 decoding starts at pad

    if use_cache:
        from sprc_tpu.models.generation import cached_greedy_loop

        s_max = max_length
        entry = _FID_GEN_CACHE.setdefault(model, {})
        if ("prefill", s_max) not in entry:
            entry[("prefill", s_max)] = jax.jit(
                lambda p, d, e, m: model.apply(
                    {"params": p}, d, e, m, s_max,
                    method=lambda mdl, *a: mdl.decode_prefill(*a)))
        if "step" not in entry:
            entry["step"] = jax.jit(
                lambda p, tok, t, cache, em: model.apply(
                    {"params": p}, tok, t, cache, em,
                    method=lambda mdl, *a: mdl.decode_step_logits(*a)))
        prefill, step = entry[("prefill", s_max)], entry["step"]
        logits0, cache = prefill(params, bos, enc_out, enc_mask)

        def step_fn(tok, pos, state):
            cache, p, em = state
            logits, cache = step(p, tok, pos[0], cache, em)
            return logits, (cache, p, em)
        step_fn.__sprc_step_cache__ = entry.setdefault("fused", {})

        out = cached_greedy_loop(
            logits0, (cache, params, enc_mask), jnp.ones((B,), jnp.int32),
            step_fn, eos_token_id=eos_id, pad_token_id=pad_id,
            max_new_tokens=max_length - 1, min_new_tokens=min_length)
        # match the uncached return layout: [bos | generated]
        return jnp.concatenate([bos, out], axis=1)

    def logits_fn(dec_ids, memory):
        enc_, mask_, params_ = memory
        return model.apply(
            {"params": params_}, dec_ids, enc_, mask_, method=model.decode
        )

    return greedy_generate_fn(
        logits_fn, bos, memory=(enc_out, enc_mask, params), eos_token_id=eos_id,
        pad_token_id=pad_id, max_length=max_length, min_length=min_length,
    )


registry.register_model("pnp_unifiedqav2_fid", override=True)(FiDT5)
