"""Document chunking for retrieval / embedding pipelines — the
published Elastic chunking-strategy semantics (the ``word`` and
``sentence`` strategies of the x-pack inference chunking settings:
WordBoundaryChunker / SentenceBoundaryChunker) re-expressed as a
streaming Ray Dataset stage.

Strategies
----------
``word``      fixed windows of ``max_words`` words with ``overlap``
              words carried over from the previous chunk (stride =
              max_words − overlap); the last window is the first one
              that reaches the end of the document. ``overlap`` must
              be at most half of ``max_words`` (the reference's own
              validation).
``sentence``  greedy packing of whole sentences up to ``max_words``;
              a single sentence longer than the budget falls back to
              word windows (no overlap) so no chunk ever exceeds
              ``max_words``.

Splitting is on single spaces (``text.split(" ")``) — not arbitrary
whitespace — so the word strategy has an exact DuckDB twin
(``string_split(text, ' ')`` + list slicing); the synthetic corpus is
single-spaced. Chunking is row-local, so the stage is a streaming
narrow transform: one ``map_batches`` that explodes each document into
``(id, chunk_ix, chunk, n_words)`` rows — no shuffle, no driver pull.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# sentence boundary: terminal punctuation, optional closing quote or
# bracket, then whitespace — the classic rule the reference's ICU
# BreakIterator approximates for western text
_SENT_RE = re.compile(r'(?<=[.!?])["\')\]]*\s+')


def word_chunk_starts(n_words: int, max_words: int, overlap: int
                      ) -> list[int]:
    """Window start offsets for a document of ``n_words`` words:
    0, stride, 2·stride, … up to (and including) the first start whose
    window reaches the end. Equivalently: start 0 plus every multiple
    of stride strictly below ``n_words − overlap``."""
    if not 0 <= overlap <= max_words // 2:
        raise ValueError("overlap must be in [0, max_words/2]")
    stride = max_words - overlap
    starts, start = [0], 0
    while start + max_words < n_words:
        start += stride
        starts.append(start)
    return starts


def word_chunks(text: str, max_words: int = 250, overlap: int = 100
                ) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[s:s + max_words])
            for s in word_chunk_starts(len(words), max_words, overlap)]


def sentence_chunks(text: str, max_words: int = 250) -> list[str]:
    """Greedy sentence packing: append whole sentences while the word
    budget holds; oversized single sentences fall back to plain word
    windows so the ``max_words`` bound is a hard invariant."""
    if max_words < 1:
        raise ValueError("max_words must be >= 1")
    sentences = [s for s in _SENT_RE.split(text) if s]
    out: list[str] = []
    cur: list[str] = []
    cur_words = 0
    for sent in sentences:
        n = len(sent.split(" "))
        if n > max_words:
            if cur:
                out.append(" ".join(cur))
                cur, cur_words = [], 0
            out.extend(word_chunks(sent, max_words, overlap=0))
            continue
        if cur_words + n > max_words and cur:
            out.append(" ".join(cur))
            cur, cur_words = [], 0
        cur.append(sent)
        cur_words += n
    if cur:
        out.append(" ".join(cur))
    return out


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    strategy: str = "word", max_words: int = 250,
                    overlap: int = 100, out_col: str = "chunk"):
    """Explode each document into chunk rows
    ``(id_col, chunk_ix, out_col, n_words)``. Streaming narrow
    transform (row-local explode, no shuffle)."""
    if strategy not in ("word", "sentence"):
        raise ValueError(f"unknown chunking strategy {strategy!r}")
    if strategy == "word":
        # validate eagerly, not first-batch-lazily
        word_chunk_starts(0, max_words, overlap)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, ixs, chunks = [], [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col]):
            t = "" if t is None else str(t)
            if not t:  # empty document -> zero chunk rows (both modes)
                continue
            cs = (word_chunks(t, max_words, overlap)
                  if strategy == "word"
                  else sentence_chunks(t, max_words))
            ids.extend([i] * len(cs))
            ixs.extend(range(len(cs)))
            chunks.extend(cs)
        out = pd.DataFrame({id_col: ids, "chunk_ix": ixs, out_col: chunks})
        out["chunk_ix"] = out["chunk_ix"].astype(np.int64)
        out["n_words"] = np.fromiter(
            (c.count(" ") + 1 if c else 0 for c in chunks),
            np.int64, len(chunks))
        return out

    return ds.map_batches(explode, batch_format="pandas")
