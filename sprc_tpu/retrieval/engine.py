"""Sharded retrieval engine: gallery index build + composed-query scoring.

TPU-native redesign of the reference's eval engine
(reference: src/utils.py:46-77 ``extract_index_blip_features`` and
src/validate_blip.py:359-410 ``generate_cirr_val_predictions``):

- **Index build**: gallery images are encoded in fixed-size batches under
  ``jit``; the index (``target_feats [N, Q, 256]``) lives device-side,
  sharded over the ``data`` mesh axis. The frozen ViT embeddings
  (``[N, S, D]``, reused as reference embeddings by the protocol —
  validate_blip.py:377 ``name_to_feat``) are streamed back to host, the
  equivalent of the reference's ``save_memory`` CPU offload (utils.py:67-69)
  but always-on: they are only ever gathered per query batch.
- **Scoring**: per query batch, one fused pass computes the 256-d composed
  feature, then a token-max matmul against the sharded gallery produces
  ``[B, N]`` sims (XLA keeps the contraction local to each shard; only the
  tiny ``[B, N]`` row block is gathered). This is the gallery-axis analogue
  of sequence parallelism (SURVEY.md §5.7).
- **Exact ranking**: full sims go back to host for the stable argsort that
  eval parity requires; ``topk`` offers the sharded top-K path for large
  galleries.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sprc_tpu.parallel.mesh import data_sharding


def _prefetch_iter(iterable, depth: int = 2):
    """Producer-thread prefetch: host-side batch prep (decode/pad) overlaps
    device compute (the reference's PrefetchLoader CUDA-stream overlap,
    re-done with a thread + bounded queue — no streams needed under JAX's
    async dispatch)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    err: List[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for item in iterable:
                # cooperative put: if the consumer abandons the generator
                # (downstream error), don't block on a full queue forever
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            while True:
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    if stop.is_set():
                        return

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()
        if err:
            raise err[0]
    finally:
        stop.set()


@dataclasses.dataclass
class GalleryIndex:
    names: List[str]
    target_feats: jax.Array  # [N_pad, Q, E] device, sharded over 'data'
    frozen_embeds: np.ndarray  # [N, S, D] host
    n: int  # true gallery size (<= N_pad)

    def reference_embeds(self, names: Sequence[str]) -> np.ndarray:
        """Gather frozen embeds for reference images by name
        (the reference's name_to_feat dict, validate_blip.py:377)."""
        index = {name: i for i, name in enumerate(self.names)}
        rows = [index[n] for n in names]
        return self.frozen_embeds[rows]

    def target_feat_rows(self, names: Sequence[str]) -> np.ndarray:
        """Gather projected target feats [n, Q, E] by name — the candidate
        representation consumed by feature-space rerankers
        (RERANK_INPUT == "feats", e.g. blip2_cir_cat …cir_cat.py:337-396)."""
        index = {name: i for i, name in enumerate(self.names)}
        rows = np.asarray([index[n] for n in names])
        return np.asarray(self.target_feats[rows], np.float32)

    def save(self, path: str) -> None:
        """Persist to <path>.npz — a serving deployment builds the gallery
        index once and reloads it per process (the reference recomputes the
        whole index every run; its save_memory flag only offloads to CPU,
        utils.py:67-69). bf16 arrays are stored as uint16 views."""
        import json

        def pack(arr):
            arr = np.asarray(arr)
            if arr.dtype == jnp.bfloat16:
                return arr.view(np.uint16), "bfloat16"
            return arr, str(arr.dtype)

        feats, feats_dtype = pack(self.target_feats[: self.n])
        frozen, frozen_dtype = pack(self.frozen_embeds)
        np.savez(
            path,
            target_feats=feats,
            frozen_embeds=frozen,
            meta=np.frombuffer(
                json.dumps(
                    {
                        "names": self.names,
                        "n": self.n,
                        "feats_dtype": feats_dtype,
                        "frozen_dtype": frozen_dtype,
                    }
                ).encode(),
                dtype=np.uint8,
            ),
        )


class RetrievalEngine:
    def __init__(
        self,
        model,
        params,
        tokenizer=None,
        mesh: Optional[jax.sharding.Mesh] = None,
        encode_batch: int = 64,
        query_batch: int = 32,
        frozen_host_dtype=None,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.encode_batch = encode_batch
        self.query_batch = query_batch
        # optional down-cast of the host-streamed frozen embeds (the
        # reference's save_memory offload keeps fp16 on CPU; bf16 halves the
        # device->host transfer on the index-build hot loop). Cast happens
        # ON DEVICE inside the jitted encode.
        self.frozen_host_dtype = frozen_host_dtype

        def _encode_fn(p, imgs):
            feats, frozen = model.apply(
                {"params": p}, imgs, method=model.extract_target_features
            )
            if self.frozen_host_dtype is not None:
                frozen = frozen.astype(self.frozen_host_dtype)
            return feats, frozen

        self._encode = jax.jit(_encode_fn)
        self._fuse = jax.jit(
            lambda p, ref, ids, mask: model.apply(
                {"params": p}, ref, ids, mask, method=model.fusion_feature
            )
        )
        self._sim = jax.jit(self._token_max_sim)

    @staticmethod
    def _token_max_sim(feats: jax.Array, target_feats: jax.Array) -> jax.Array:
        from sprc_tpu.ops.sim_kernels import token_max_sim

        return token_max_sim(feats, target_feats)

    # ------------------------------------------------------------- index build

    def build_index_raw(
        self,
        batches: Iterable[Tuple[Sequence[str], np.ndarray, np.ndarray]],
        *,
        decode_size: int = 256,
        target_ratio: float = 1.25,
    ) -> "GalleryIndex":
        """High-throughput index build over RAW uint8 batches.

        batches yield ``(names, images_u8 [b, H, W, 3], sizes [b, 2])`` where
        images are decoded-but-unresized (uniform buffer, true (h, w) in
        ``sizes``). The targetpad/bicubic/normalize preprocess runs ON DEVICE
        fused into the same jitted program as the encoder, so the host only
        decodes bytes (see data/native.py for the C++ decode path).
        """
        import jax.numpy as jnp

        from sprc_tpu.data.transforms import device_preprocess

        # cache the jitted fused preprocess+encode per (ratio, decode_size):
        # a fresh jax.jit per call would re-trace/recompile every rebuild
        # (and fold compile time into benchmarked builds)
        key = (float(target_ratio), int(decode_size), self.frozen_host_dtype)
        encode = getattr(self, "_encode_raw_cache", {}).get(key)
        if encode is None:
            pre = device_preprocess(
                dim=self.model.cfg.image_size, target_ratio=target_ratio
            )

            def encode_raw(p, raw, sizes):
                images = pre(raw, sizes)
                feats, frozen = self.model.apply(
                    {"params": p}, images, method=self.model.extract_target_features
                )
                if self.frozen_host_dtype is not None:
                    frozen = frozen.astype(self.frozen_host_dtype)
                return feats, frozen

            encode = jax.jit(encode_raw)
            if not hasattr(self, "_encode_raw_cache"):
                self._encode_raw_cache = {}
            self._encode_raw_cache[key] = encode

        def submit(batch):
            batch_names, raw, sizes = batch
            b = raw.shape[0]
            if b < self.encode_batch:
                pad = self.encode_batch - b
                raw = np.concatenate(
                    [raw, np.zeros((pad,) + raw.shape[1:], raw.dtype)], axis=0
                )
                sizes = np.concatenate(
                    [sizes, np.ones((pad, 2), sizes.dtype)], axis=0
                )
            feats, frozen = encode(self.params, jnp.asarray(raw), jnp.asarray(sizes))
            return batch_names, b, feats, frozen

        return self._assemble_index(*self._pipelined_encode(batches, submit))

    def _assemble_index(self, names, feats_parts, frozen_parts) -> "GalleryIndex":
        target_feats = np.concatenate(feats_parts, axis=0)
        frozen = np.concatenate(frozen_parts, axis=0)
        n = target_feats.shape[0]

        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            n_pad = ((n + n_dev - 1) // n_dev) * n_dev
            if n_pad != n:
                target_feats = np.concatenate(
                    [
                        target_feats,
                        np.zeros((n_pad - n,) + target_feats.shape[1:], target_feats.dtype),
                    ]
                )
            device_feats = jax.device_put(
                jnp.asarray(target_feats), data_sharding(self.mesh)
            )
        else:
            device_feats = jnp.asarray(target_feats)
        return GalleryIndex(
            names=names, target_feats=device_feats, frozen_embeds=frozen, n=n
        )

    def load_index(self, path: str) -> GalleryIndex:
        """Reload a :meth:`GalleryIndex.save` file, re-placing the target
        features on device (sharded over the mesh when one is set)."""
        import json

        npz = np.load(path if path.endswith(".npz") else path + ".npz")
        meta = json.loads(bytes(npz["meta"].tobytes()).decode())

        def unpack(arr, dtype):
            if dtype == "bfloat16":
                return arr.view(jnp.bfloat16)
            return arr

        feats = unpack(npz["target_feats"], meta["feats_dtype"])
        frozen = unpack(npz["frozen_embeds"], meta["frozen_dtype"])
        index = self._assemble_index(meta["names"], [feats], [frozen])
        assert index.n == meta["n"]
        return index

    def build_index(
        self,
        batches: Iterable[Tuple[Sequence[str], np.ndarray]],
    ) -> GalleryIndex:
        """batches yield (names, images [b, H, W, 3] float32).

        Variable trailing batch sizes are padded to ``encode_batch`` so one
        compiled program serves the whole gallery.
        """
        def submit(batch):
            batch_names, images = batch
            b = images.shape[0]
            if b < self.encode_batch:
                pad = self.encode_batch - b
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:], images.dtype)], axis=0
                )
            feats, frozen = self._encode(self.params, jnp.asarray(images))
            return batch_names, b, feats, frozen

        # note: mesh padding rows score 0 (zero feats); full-sims callers
        # slice [:n], topk callers mask (see topk())
        return self._assemble_index(*self._pipelined_encode(batches, submit))

    def _pipelined_encode(self, batches, submit, depth: int = 2):
        """Three-stage pipeline: a prefetch thread prepares host batches,
        device encodes run asynchronously (JAX dispatch), and readbacks of
        batch i-depth happen while batch i computes. The round-1 loop was
        fully serial (prep -> encode -> readback per batch)."""
        from collections import deque

        names: List[str] = []
        feats_parts: List[np.ndarray] = []
        frozen_parts: List[np.ndarray] = []
        inflight: deque = deque()

        def drain():
            batch_names, b, feats, frozen = inflight.popleft()
            feats_parts.append(np.asarray(feats[:b]))
            frozen_parts.append(np.asarray(frozen[:b]))
            names.extend(batch_names)

        for batch in _prefetch_iter(batches, depth=depth):
            inflight.append(submit(batch))
            if len(inflight) > depth:
                drain()
        while inflight:
            drain()
        return names, feats_parts, frozen_parts

    # --------------------------------------------------------------- scoring

    def score_batch(
        self,
        index: GalleryIndex,
        reference_embeds: np.ndarray,
        input_ids: np.ndarray,
        text_mask: np.ndarray,
    ) -> np.ndarray:
        """One query batch -> [B, N] sims (host numpy, unpadded)."""
        feats = self._fuse(
            self.params,
            jnp.asarray(reference_embeds),
            jnp.asarray(input_ids),
            jnp.asarray(text_mask),
        )
        sims = self._sim(feats, index.target_feats)
        return np.asarray(sims)[:, : index.n]

    def score_queries(
        self,
        index: GalleryIndex,
        reference_names: Sequence[str],
        captions: Sequence[str],
        max_txt_len: Optional[int] = None,
    ) -> np.ndarray:
        """Full query set -> [num_queries, N] sims. Tokenizes on host."""
        if self.tokenizer is None:
            raise ValueError("score_queries needs a tokenizer")
        max_txt_len = max_txt_len or self.model.cfg.max_txt_len
        out: List[np.ndarray] = []
        qb = self.query_batch
        for i in range(0, len(captions), qb):
            chunk_names = reference_names[i : i + qb]
            chunk_caps = captions[i : i + qb]
            tok = self.tokenizer(list(chunk_caps), max_length=max_txt_len)
            refs = index.reference_embeds(chunk_names)
            b = len(chunk_caps)
            if b < qb:  # pad to the compiled batch size
                pad = qb - b
                refs = np.concatenate([refs, np.zeros((pad,) + refs.shape[1:], refs.dtype)])
                ids = np.concatenate([tok["input_ids"], np.zeros((pad, max_txt_len), np.int32)])
                mask = np.concatenate([tok["attention_mask"], np.ones((pad, max_txt_len), np.int32)])
            else:
                ids, mask = tok["input_ids"], tok["attention_mask"]
            sims = self.score_batch(index, refs, ids, mask)
            out.append(sims[:b])
        return np.concatenate(out, axis=0)

    # ----------------------------------------------------------------- top-K

    def topk(
        self, index: GalleryIndex, sims_device: jax.Array, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact global top-K from (possibly sharded) sims via lax.top_k."""
        n = index.n

        @jax.jit
        def _topk(s):
            # mask padded gallery rows
            cols = jnp.arange(s.shape[-1])
            s = jnp.where(cols[None, :] < n, s, -jnp.inf)
            return jax.lax.top_k(s, k)

        vals, idx = _topk(sims_device)
        return np.asarray(vals), np.asarray(idx)
