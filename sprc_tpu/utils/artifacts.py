"""Offline artifact bootstrap (vocab files, tokenizer exports).

The reference self-bootstraps its tokenizers from the hub
(blip2.py:31-34 ``BertTokenizer.from_pretrained("bert-base-uncased")``).
This environment is zero-egress, so resolution is explicit:

1. an explicit ``--vocab-path`` / argument,
2. the local cache (``$SPRC_CACHE or ~/.cache/sprc_tpu``),
3. a download — ONLY when ``SPRC_ALLOW_DOWNLOAD=1`` (egress available),
4. a generated SYNTHETIC vocab when ``synthetic_ok=True`` — mechanically
   valid WordPiece (specials + ascii chars + ##suffixes) for smoke tests;
   NOT the real bert-base-uncased vocab, never for real checkpoints.

One-command setup on a connected machine:
  SPRC_ALLOW_DOWNLOAD=1 python -m sprc_tpu.utils.artifacts
"""

from __future__ import annotations

import os
import string
from typing import Optional

BERT_VOCAB_URL = (
    "https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt"
)


def cache_dir() -> str:
    root = os.environ.get(
        "SPRC_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "sprc_tpu")
    )
    os.makedirs(root, exist_ok=True)
    return root


def write_synthetic_bert_vocab(path: str, *, size: int = 30522) -> str:
    """A structurally valid WordPiece vocab: specials, printable chars,
    ##-continuations, and numbered filler pieces up to ``size`` (the real
    bert-base-uncased layout: PAD=0, UNK=100, CLS=101, SEP=102, MASK=103)."""
    rows = ["[PAD]"]
    rows += [f"[unused{i}]" for i in range(99)]
    rows += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    chars = list(string.ascii_lowercase + string.digits + string.punctuation)
    rows += chars
    rows += [f"##{c}" for c in chars]
    i = 0
    while len(rows) < size:
        rows.append(f"tok{i}")
        i += 1
    with open(path, "w") as f:
        f.write("\n".join(rows[:size]) + "\n")
    return path


def ensure_bert_vocab(
    path: Optional[str] = None, *, synthetic_ok: bool = False
) -> str:
    """Resolve a BERT vocab.txt per the module docstring's order."""
    if path:
        if os.path.exists(path):
            return path
        # an explicitly requested vocab must not silently fall through to a
        # cached one — wrong tokenization with no error
        raise FileNotFoundError(f"--vocab-path {path} does not exist")
    cached = os.path.join(cache_dir(), "bert-base-uncased-vocab.txt")
    if os.path.exists(cached):
        return cached
    if os.environ.get("SPRC_ALLOW_DOWNLOAD") == "1":
        import urllib.request

        urllib.request.urlretrieve(BERT_VOCAB_URL, cached)  # nosec: fixed URL
        return cached
    if synthetic_ok:
        synth = os.path.join(cache_dir(), "synthetic-bert-vocab.txt")
        if not os.path.exists(synth):
            write_synthetic_bert_vocab(synth)
        return synth
    raise FileNotFoundError(
        "No BERT vocab found. Pass --vocab-path, or run "
        "`SPRC_ALLOW_DOWNLOAD=1 python -m sprc_tpu.utils.artifacts` on a "
        "machine with network access (writes to the sprc_tpu cache), or "
        "copy bert-base-uncased's vocab.txt into "
        f"{cached}"
    )


if __name__ == "__main__":
    print(ensure_bert_vocab(synthetic_ok=os.environ.get("SPRC_ALLOW_DOWNLOAD") != "1"))
