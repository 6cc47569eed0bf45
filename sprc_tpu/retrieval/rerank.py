"""Two-stage retrieve -> rerank driver.

Mirrors the reference's top-K rewrite loops
(reference: src/validate_blip_rerank.py:197-221 for CIRR val,
src/cirr_test_submission.py:87-112 for the test submission): after stage-1
ranking, each query's top-``top`` candidates are rescored by an ITM head
(``inference_rerank``) and that prefix of the ranking is rewritten by the
new scores; ties and the rest of the ranking stay put.

The scorer is compiled once for a fixed (step x top) tile and the candidate
embeddings are gathered from the host-side frozen store per tile, so device
memory stays bounded at ``step*top`` sequences regardless of gallery size.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def rerank_rankings(
    sorted_names: np.ndarray,
    reference_names: Sequence[str],
    captions: Sequence[str],
    score_fn: Callable[[np.ndarray, np.ndarray, Sequence[str]], np.ndarray],
    name_to_embed: Callable[[Sequence[str]], np.ndarray],
    *,
    top: int,
    step: int,
    cand_to_embed: Callable[[Sequence[str]], np.ndarray] | None = None,
) -> np.ndarray:
    """Rewrite the top-``top`` prefix of each row by rerank scores.

    Args:
      sorted_names: [B, M] array of gallery names, best-first (stage 1).
      score_fn: (ref_embeds [s, S, D], cand_embeds [s*top, S, D],
        captions) -> scores [s*top]; higher = better.
      name_to_embed: names -> frozen embeddings [n, S, D].
      cand_to_embed: candidate-side gather when the reranker consumes a
        different representation than the reference side (feature-space
        rerankers take projected feats [n, Q, E] — …cir_cat.py:337-396);
        defaults to ``name_to_embed``.
    """
    cand_to_embed = cand_to_embed or name_to_embed
    sorted_names = np.array(sorted_names, copy=True)
    n = len(sorted_names)
    i = 0
    while i < n:
        s = min(step, n - i)
        refs = name_to_embed(reference_names[i : i + s])
        cand_names = sorted_names[i : i + s, :top]
        cands = cand_to_embed(cand_names.reshape(-1))
        scores = np.asarray(score_fn(refs, cands, captions[i : i + s]))
        order = np.argsort(1.0 - scores.reshape(s, top), axis=-1, kind="stable")
        for j in range(s):
            sorted_names[i + j, :top] = cand_names[j][order[j]]
        i += s
    return sorted_names


class ItmRerankScorer:
    """Jit-compiled ITM rerank scorer over a model's ``inference_rerank``.

    Pads the last tile to the compiled (step*top) shape so one XLA program
    serves the whole eval.
    """

    def __init__(self, model, params, tokenizer, *, top: int, step: int,
                 max_txt_len: int | None = None):
        import jax

        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.top = top
        self.step = step
        self.max_txt_len = max_txt_len or model.cfg.max_txt_len

        import jax.numpy as jnp

        top_ = self.top

        def _score(p, refs, cands, ids, mask):
            # repeat each query's reference/text per candidate ON DEVICE
            # (the reference's einops repeat,
            # blip2_qformer_cir_rerank.py:408-419, was a host-side
            # np.repeat here: ~400 MB of duplicated reference embeds
            # uploaded per CIRR tile)
            refs_rep = jnp.repeat(refs, top_, axis=0)
            ids_rep = jnp.repeat(ids, top_, axis=0)
            mask_rep = jnp.repeat(mask, top_, axis=0)
            return model.apply(
                {"params": p}, refs_rep, cands, ids_rep, mask_rep,
                method=model.inference_rerank,
            )

        self._score = jax.jit(_score)

    def __call__(self, refs: np.ndarray, cands: np.ndarray, captions) -> np.ndarray:
        import jax.numpy as jnp

        s = refs.shape[0]
        tok = self.tokenizer(list(captions), max_length=self.max_txt_len)
        ids = np.asarray(tok["input_ids"])
        mask = np.asarray(tok["attention_mask"])

        nrows = s * self.top
        if s < self.step:  # pad the QUERY axis to the compiled shape
            pad = self.step - s
            refs = np.concatenate(
                [refs, np.zeros((pad,) + refs.shape[1:], refs.dtype)])
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
            mask = np.concatenate(
                [mask, np.ones((pad, mask.shape[1]), mask.dtype)])
        full = self.step * self.top
        if cands.shape[0] < full:
            pad = full - cands.shape[0]
            cands = np.concatenate(
                [cands, np.zeros((pad,) + cands.shape[1:], cands.dtype)])
        scores = self._score(
            self.params, jnp.asarray(refs), jnp.asarray(cands),
            jnp.asarray(ids), jnp.asarray(mask),
        )
        return np.asarray(scores)[: nrows]
