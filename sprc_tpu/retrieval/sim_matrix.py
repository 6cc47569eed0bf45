"""Generic image<->text retrieval evaluation (the LAVIS RetrievalTask path).

Re-implements the reference's two-stage i2t/t2i scoring
(reference: src/lavis/models/blip2_models/blip2.py:202-315
``compute_sim_matrix`` + src/lavis/tasks/retrieval.py:19-120): a cheap
token-max contrastive pass ranks all pairs, then the ITM head rescores each
query's top-``k_test`` candidates; recalls are read off the summed matrix.

The reference shards the rescoring loop across ranks and merges with an
NCCL all_reduce (blip2.py:263-309); here the device-side scoring is jitted
per tile and sharding happens trivially over the query loop (each host/chip
takes a contiguous slice; scores are dense adds into a host matrix).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def compute_sim_matrix(
    model,
    params,
    image_embeds_frozen: np.ndarray,
    query_hidden_feats: np.ndarray,
    text_ids: np.ndarray,
    text_mask: np.ndarray,
    text_feats: np.ndarray,
    *,
    k_test: int = 8,
    itm_batch: int = 16,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (score_i2t [N_img, N_txt], score_t2i [N_txt, N_img]).

    Args:
      image_embeds_frozen: [N_img, S, D] frozen ViT embeds (for ITM).
      query_hidden_feats: [N_img, Q, E] normalized per-query features.
      text_feats: [N_txt, E] normalized CLS text features.
    """
    import jax
    import jax.numpy as jnp

    n_img = query_hidden_feats.shape[0]
    n_txt = text_feats.shape[0]

    # stage 1: token-max sims both directions (blip2.py:252-257)
    sims = np.einsum("nqe,te->nqt", query_hidden_feats, text_feats).max(axis=1)

    itm = jax.jit(
        lambda p, img, ids, mask: model.apply(
            {"params": p}, img, ids, mask, method=model.compute_itm
        )
    )

    def _rescore(rows: range, sims_rows: np.ndarray, by_image: bool) -> np.ndarray:
        out = np.full_like(sims_rows, -100.0)
        for i in rows:
            row = sims_rows[i]
            topk = np.argsort(-row, kind="stable")[:k_test]
            scores = []
            for s in range(0, k_test, itm_batch):
                chunk = topk[s : s + itm_batch]
                if by_image:  # one image, many texts
                    img = np.repeat(image_embeds_frozen[i : i + 1], len(chunk), 0)
                    ids, mask = text_ids[chunk], text_mask[chunk]
                else:  # one text, many images
                    img = image_embeds_frozen[chunk]
                    ids = np.repeat(text_ids[i : i + 1], len(chunk), 0)
                    mask = np.repeat(text_mask[i : i + 1], len(chunk), 0)
                scores.append(np.asarray(itm(params, jnp.asarray(img), jnp.asarray(ids), jnp.asarray(mask))))
            out[i, topk] = np.concatenate(scores) + row[topk]
        return out

    def _shard(n: int) -> range:
        step = n // num_shards + 1
        return range(shard_index * step, min(n, (shard_index + 1) * step))

    score_i2t = _rescore(_shard(n_img), sims, by_image=True)
    score_t2i = _rescore(_shard(n_txt), sims.T, by_image=False)
    return score_i2t, score_t2i


def retrieval_recalls(
    score_i2t: np.ndarray,
    score_t2i: np.ndarray,
    img2txt: Dict[int, Sequence[int]],
    txt2img: Dict[int, int],
) -> Dict[str, float]:
    """i2t/t2i R@{1,5,10} + means (reference tasks/retrieval.py:77-120)."""
    ranks = np.zeros(score_i2t.shape[0])
    for i, row in enumerate(score_i2t):
        order = np.argsort(-row, kind="stable")
        ranks[i] = min(np.where(np.in1d(order, list(img2txt[i])))[0])
    tr = {
        f"txt_r{k}": 100.0 * float((ranks < k).mean()) for k in (1, 5, 10)
    }
    ranks_t = np.zeros(score_t2i.shape[0])
    for i, row in enumerate(score_t2i):
        order = np.argsort(-row, kind="stable")
        ranks_t[i] = int(np.where(order == txt2img[i])[0][0])
    ir = {
        f"img_r{k}": 100.0 * float((ranks_t < k).mean()) for k in (1, 5, 10)
    }
    out = {**tr, **ir}
    out["r_mean"] = (sum(tr.values()) / 3 + sum(ir.values()) / 3) / 2
    return out
