"""Native WordPiece tokenizer (BERT-uncased semantics), no external deps.

The reference tokenizes with HF ``BertTokenizer('bert-base-uncased')`` plus a
``[DEC]`` bos token (reference: src/lavis/models/blip2_models/blip2.py:31-34).
In a zero-egress TPU pod we cannot download the vocab at import time, so this
module implements the full BERT basic+WordPiece algorithm natively and loads
any ``vocab.txt``:

- BasicTokenizer: clean control chars, lowercase, strip accents (NFD),
  split on whitespace/punctuation/CJK.
- WordPiece: greedy longest-match-first with ``##`` continuations and
  ``[UNK]`` for words longer than 100 chars or with no match.
- ``__call__`` mirrors the reference call signature
  (padding='max_length', truncation=True, max_length=N), producing
  ``input_ids``/``attention_mask`` numpy arrays with [CLS] ... [SEP] framing.

Parity-tested against HF ``BertTokenizer`` on synthetic vocabs
(tests/test_tokenizer.py).
"""

from __future__ import annotations

import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        (0x4E00 <= cp <= 0x9FFF)
        or (0x3400 <= cp <= 0x4DBF)
        or (0x20000 <= cp <= 0x2A6DF)
        or (0x2A700 <= cp <= 0x2B73F)
        or (0x2B740 <= cp <= 0x2B81F)
        or (0x2B820 <= cp <= 0x2CEAF)
        or (0xF900 <= cp <= 0xFAFF)
        or (0x2F800 <= cp <= 0x2FA1F)
    )


class BasicTokenizer:
    def __init__(self, do_lower_case: bool = True, never_split: Optional[Sequence[str]] = None):
        self.do_lower_case = do_lower_case
        self.never_split = set(never_split or ())

    def tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        text = self._tokenize_cjk(text)
        tokens: List[str] = []
        for tok in text.split():
            if tok in self.never_split:
                tokens.append(tok)
                continue
            if self.do_lower_case:
                tok = tok.lower()
                tok = self._strip_accents(tok)
            tokens.extend(self._split_punct(tok))
        return tokens

    @staticmethod
    def _clean(text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    @staticmethod
    def _tokenize_cjk(text: str) -> str:
        out = []
        for ch in text:
            if _is_cjk(ord(ch)):
                out.append(f" {ch} ")
            else:
                out.append(ch)
        return "".join(out)

    @staticmethod
    def _strip_accents(text: str) -> str:
        text = unicodedata.normalize("NFD", text)
        return "".join(ch for ch in text if unicodedata.category(ch) != "Mn")

    @staticmethod
    def _split_punct(tok: str) -> List[str]:
        out: List[List[str]] = []
        new_word = True
        for ch in tok:
            if _is_punctuation(ch):
                out.append([ch])
                new_word = True
            else:
                if new_word:
                    out.append([])
                new_word = False
                out[-1].append(ch)
        return ["".join(x) for x in out if x]


class WordPiece:
    def __init__(self, vocab: Dict[str, int], unk_token: str = "[UNK]", max_chars: int = 100):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_chars = max_chars

    def tokenize(self, word: str) -> List[str]:
        if len(word) > self.max_chars:
            return [self.unk_token]
        tokens: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            tokens.append(cur)
            start = end
        return tokens


class BertWordPieceTokenizer:
    """BERT-uncased tokenizer over a local ``vocab.txt``.

    Call convention mirrors the reference's use of HF tokenizers:
    ``tok(texts, max_length=32)`` -> dict of ``input_ids`` [B, L] and
    ``attention_mask`` [B, L] int32 arrays, with [CLS]/[SEP] framing,
    truncation to ``max_length`` and zero-padding ([PAD]).
    """

    CLS = "[CLS]"
    SEP = "[SEP]"
    PAD = "[PAD]"
    UNK = "[UNK]"

    def __init__(self, vocab: Dict[str, int], do_lower_case: bool = True,
                 extra_special_tokens: Sequence[str] = ("[DEC]",)):
        self.vocab = dict(vocab)
        # the reference appends a [DEC] bos token (blip2.py:33); append any
        # missing specials at the end of the vocab like HF add_special_tokens
        for tok in extra_special_tokens:
            if tok not in self.vocab:
                self.vocab[tok] = len(self.vocab)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        specials = {self.CLS, self.SEP, self.PAD, self.UNK, "[MASK]", *extra_special_tokens}
        self.basic = BasicTokenizer(do_lower_case, never_split=specials)
        self.wordpiece = WordPiece(self.vocab, self.UNK)
        self.cls_id = self.vocab[self.CLS]
        self.sep_id = self.vocab[self.SEP]
        self.pad_id = self.vocab[self.PAD]
        self.bos_id = self.vocab[extra_special_tokens[0]] if extra_special_tokens else None

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "BertWordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, **kw)

    def __len__(self) -> int:
        return len(self.vocab)

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for tok in self.basic.tokenize(text):
            if tok in self.basic.never_split:
                out.append(tok)
            else:
                out.extend(self.wordpiece.tokenize(tok))
        return out

    def encode(self, text: str, max_length: int = 32) -> List[int]:
        ids = [self.vocab.get(t, self.vocab[self.UNK]) for t in self.tokenize(text)]
        ids = ids[: max_length - 2]
        return [self.cls_id] + ids + [self.sep_id]

    def caption_prompt_ids(self, prompt: str) -> List[int]:
        """BOS-prefixed prompt ids without the trailing [SEP] — the decode
        prefix of the BLIP captioner (reference pnp_vqa.py:145-149:
        ``input_ids[:, 0] = bos``, last token dropped). Falls back to [CLS]
        as BOS when no extra special tokens were configured."""
        bos = self.bos_id if self.bos_id is not None else self.cls_id
        ids = [self.vocab.get(t, self.vocab[self.UNK]) for t in self.tokenize(prompt)]
        return [bos] + ids

    def __call__(
        self,
        texts: Iterable[str] | str,
        max_length: int = 32,
        padding: str = "max_length",
        enc_token: bool = False,
    ) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        encoded = [self.encode(t, max_length) for t in texts]
        if enc_token:
            # multimodal-mode marker: [ENC] replaces [CLS] at position 0
            # (reference blip ITM path); falls back to [CLS] when the vocab
            # carries no [ENC]
            enc_id = self.vocab.get("[ENC]", self.cls_id)
            encoded = [[enc_id] + e[1:] for e in encoded]
        if padding == "max_length":
            width = max_length
        else:  # "longest"
            width = max(len(e) for e in encoded)
        ids = np.full((len(encoded), width), self.pad_id, np.int32)
        mask = np.zeros((len(encoded), width), np.int32)
        for i, e in enumerate(encoded):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        # [DEC]/bos and [MASK] are specials too: HF skip_special_tokens drops
        # every added special token, and PNP-VQA's prompt-strip
        # (models/pnp_vqa.py) relies on decoded captions starting at the
        # prompt, not at '[DEC]'
        specials = {self.cls_id, self.sep_id, self.pad_id,
                    self.vocab.get("[MASK]", -1)}
        if self.bos_id is not None:
            specials.add(self.bos_id)
        toks = []
        for i in ids:
            if skip_special_tokens and int(i) in specials:
                continue
            toks.append(self.inv_vocab.get(int(i), self.UNK))
        text = " ".join(toks).replace(" ##", "")
        return text
