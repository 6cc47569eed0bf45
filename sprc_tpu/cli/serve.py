"""Serving CLI: composed-query retrieval over a persistent gallery index.

A deployment surface the reference does not have (its eval scripts rebuild
the gallery index from pixels on every run — src/utils.py:46-77): build or
load a :class:`GalleryIndex` once, then answer composed queries
(reference image name + relative caption -> top-K gallery names) over a
small stdlib HTTP endpoint.

Usage:
  # build the index from a dataset split, persist it, and serve
  python -m sprc_tpu.cli.serve --dataset CIRR --data-path /data/cirr_dataset \
      --model-path sprc_cirr.pt --save-index /tmp/cirr_val_index --port 8000

  # later processes skip the encode pass entirely
  python -m sprc_tpu.cli.serve --index-path /tmp/cirr_val_index --port 8000 ...

API:
  GET  /health           -> {"status": "ok", "gallery": N}
  POST /query            -> body {"reference": name, "caption": str, "k": 10}
                            or {"queries": [{reference, caption}...], "k": 10}
                            -> {"results": [[{"name", "score"}...] per query]}
                            optional "rerank": true runs the ITM second
                            stage over the top --rerank-top candidates
                            (requires a rerank-capable model, e.g.
                            blip2_cir_cat; reference two-stage flow
                            cirr_test_submission.py:87-112)

Device dispatch is serialized behind a lock (one compiled program in flight);
the query (and, when enabled, rerank) programs are warmed at startup so
first-request latency is execution-only.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class RetrievalService:
    """Engine + index + the query path shared by HTTP and tests."""

    def __init__(self, engine, index, rerank_scorer=None):
        self.engine = engine
        self.index = index
        self.rerank_scorer = rerank_scorer
        self._lock = threading.Lock()
        self._name_set = set(index.names)
        # candidate gather for the rerank stage, picked by the model's
        # flavor tag: ITM rerankers re-read frozen embeds, feature-space
        # rerankers (cir_cat) re-read projected target feats
        if getattr(engine.model, "RERANK_INPUT", "frozen") == "feats":
            self._cand_gather = index.target_feat_rows
        else:
            self._cand_gather = index.reference_embeds

    def warm(self) -> None:
        name = self.index.names[0]
        self.query([(name, "warm up")], k=1)
        if self.rerank_scorer is not None:
            self.query([(name, "warm up")], k=1, rerank=True)

    def query(self, pairs, k: int = 10, rerank: bool = False):
        """pairs: [(reference_name, caption)] -> per query top-k
        [{'name', 'score'}] (exact ranking, reference image masked out of
        its own results as in validate_blip.py:258-261).

        With ``rerank=True`` the top ``rerank_scorer.top`` stage-1
        candidates are re-scored by the model's ITM head over concat
        [reference; candidate] memory and the prefix reordered (the
        two-stage flow of cirr_test_submission.py:87-112); returned scores
        stay the stage-1 similarities (the rerank stage defines order, not
        score scale)."""
        refs = [p[0] for p in pairs]
        caps = [p[1] for p in pairs]
        missing = [r for r in refs if r not in self._name_set]
        if missing:
            raise KeyError(f"unknown reference image(s): {missing[:5]}")
        if rerank and self.rerank_scorer is None:
            raise ValueError(
                "rerank requested but the service was started without "
                "--rerank-top (or the model has no inference_rerank)")
        with self._lock:
            sims = self.engine.score_queries(self.index, refs, caps)
        names = np.asarray(self.index.names)
        sim_of = [
            {str(names[j]): float(row[j]) for j in range(len(names))}
            for row in sims
        ]
        # stage-1 order with each query's reference image masked out
        rows = []
        for row, ref in zip(sims, refs):
            order = np.argsort(-row, kind="stable")
            rows.append([str(names[j]) for j in order if names[j] != ref])
        if rerank:
            from sprc_tpu.retrieval.rerank import rerank_rankings

            m = min(len(r) for r in rows)
            if m < self.rerank_scorer.top:
                raise ValueError(
                    f"gallery too small to rerank: {m} maskable candidates "
                    f"< --rerank-top {self.rerank_scorer.top}")
            sorted_names = np.asarray([r[:m] for r in rows])
            with self._lock:
                sorted_names = rerank_rankings(
                    sorted_names, refs, caps, self.rerank_scorer,
                    self.index.reference_embeds,
                    top=self.rerank_scorer.top,
                    step=self.rerank_scorer.step,
                    cand_to_embed=self._cand_gather,
                )
            rows = [list(r) for r in sorted_names]
        return [
            [{"name": nm, "score": s[nm]} for nm in r[:k]]
            for r, s in zip(rows, sim_of)
        ]


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        service = self.server.service
        if self.path == "/health":
            self._send(200, {"status": "ok", "gallery": service.index.n})
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        service = self.server.service
        if self.path != "/query":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length) or b"{}")
            k = int(req.get("k", 10))
            if "queries" in req:
                pairs = [(q["reference"], q["caption"]) for q in req["queries"]]
            else:
                pairs = [(req["reference"], req["caption"])]
            results = service.query(
                pairs, k=k, rerank=bool(req.get("rerank", False)))
            self._send(200, {"results": results})
        except KeyError as e:
            self._send(400, {"error": str(e)})
        except Exception as e:  # malformed payloads -> 400, not a crash
            self._send(400, {"error": f"{type(e).__name__}: {e}"})


def make_server(service: RetrievalService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), _Handler)
    server.service = service
    return server


def build_service(args) -> RetrievalService:
    import jax.numpy as jnp

    from sprc_tpu.loader import load_model
    from sprc_tpu.retrieval.engine import RetrievalEngine
    from sprc_tpu.text.tokenizer import BertWordPieceTokenizer
    from sprc_tpu.utils.artifacts import ensure_bert_vocab

    model, params = load_model(
        args.model_name, args.model_type, checkpoint_path=args.model_path,
        vit_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    tokenizer = BertWordPieceTokenizer.from_vocab_file(
        ensure_bert_vocab(args.vocab_path)
    )
    mesh = None
    if args.mesh:
        from sprc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    engine = RetrievalEngine(
        model, params, tokenizer, mesh=mesh,
        encode_batch=args.encode_batch, query_batch=args.query_batch,
        frozen_host_dtype=jnp.bfloat16,
    )
    if args.index_path:
        index = engine.load_index(args.index_path)
    else:
        from sprc_tpu.cli.validate import index_batches
        from sprc_tpu.data.datasets import CIRRDataset, FashionIQDataset
        from sprc_tpu.data.transforms import targetpad_transform

        tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
        if args.dataset == "CIRR":
            classic = CIRRDataset(args.data_path, args.split, "classic", tfm)
        else:
            classic = FashionIQDataset(
                args.data_path, args.split, args.dress_types, "classic", tfm
            )
        index = engine.build_index(
            index_batches(classic, args.encode_batch, args.workers)
        )
        if args.save_index:
            index.save(args.save_index)
            print(f"index saved to {args.save_index}.npz ({index.n} images)")
    scorer = None
    if args.rerank_top > 0:
        if not hasattr(model, "inference_rerank"):
            raise SystemExit(
                f"--rerank-top needs a rerank-capable model; "
                f"{args.model_name} has no inference_rerank")
        from sprc_tpu.retrieval.rerank import ItmRerankScorer

        scorer = ItmRerankScorer(
            model, params, tokenizer,
            top=args.rerank_top, step=args.rerank_step,
        )
    return RetrievalService(engine, index, rerank_scorer=scorer)


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["CIRR", "fashionIQ"], default="CIRR")
    p.add_argument("--data-path", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--index-path", default=None,
                   help="load a persisted index instead of encoding")
    p.add_argument("--save-index", default=None,
                   help="persist the freshly built index here")
    p.add_argument("--model-name", default="blip2_cir_align_prompt")
    p.add_argument("--model-type", default="pretrain")
    p.add_argument("--model-path", default=None)
    p.add_argument("--vocab-path", default=None)
    p.add_argument("--target-ratio", type=float, default=1.25)
    p.add_argument("--encode-batch", type=int, default=64)
    p.add_argument("--query-batch", type=int, default=32)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--rerank-top", type=int, default=0,
                   help="enable the ITM second stage over this many stage-1 "
                        "candidates per query (0 = off); needs a model with "
                        "inference_rerank (e.g. blip2_cir_cat)")
    p.add_argument("--rerank-step", type=int, default=15,
                   help="queries per rerank dispatch (CIRR eval tile)")
    p.add_argument("--dress-types", nargs="+", default=["dress", "shirt", "toptee"])
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    return p


def main(argv: Optional[list] = None) -> None:
    args = make_parser().parse_args(argv)
    if not args.index_path and not args.data_path:
        raise SystemExit("need --data-path (build index) or --index-path (load)")
    service = build_service(args)
    service.warm()
    server = make_server(service, args.host, args.port)
    print(
        f"serving {service.index.n}-image gallery on "
        f"http://{server.server_address[0]}:{server.server_address[1]}"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
