"""Unigram-LM tokenizer TRAINING (Kudo, "Subword Regularization:
Improving Neural Network Translation Models with Multiple Subword
Candidates", ACL 2018, arXiv:1804.10959 §3.2 — the SentencePiece
``unigram`` trainer) — the second of the two standard subword
vocabularies an LLM data pipeline learns (the other is BPE,
ops/bpe.py).

Distribution shape (same split as the paper's own implementation):

1. WORD-FREQUENCY TABLE — the only corpus-sized pass (reused from
   ``ops.bpe.word_frequencies``: per-batch partials → one
   vocabulary-bounded groupby). Heaps' law keeps the distinct-word
   table driver-sized at any corpus scale.
2. SEED + EM + PRUNE on the compact (word, freq) table — inherently
   iterative (piece probabilities feed the next E-step), run on the
   driver exactly like SentencePiece trains from its own counted
   corpus:
   - seed: the most frequent substrings up to ``max_piece_len``
     (every single character is mandatory and unprunable — the
     paper's guarantee that any string stays segmentable);
   - E-step: forward-backward over each word's segmentation lattice
     → expected piece counts (soft EM, the paper's choice — not
     Viterbi hard counts);
   - M-step: re-normalize piece log-probabilities;
   - prune: drop the multi-char pieces whose removal costs the least
     likelihood — cost ≈ freq-weighted (own logp − best alternative
     segmentation), the SentencePiece pruning score — keeping
     ``shrink`` of the vocabulary per round until ``vocab_size``.
3. ENCODING back over the corpus: Viterbi segmentation under the
   final piece log-probs, broadcast once via ``ray.put``, per-batch
   word→pieces cache (Zipf hit rate ≈ 1).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ray.data import Dataset

_NEG_INF = -1e30


def seed_vocabulary(word_freqs: pd.DataFrame, max_piece_len: int = 8,
                    seed_size: int = 4000) -> dict[str, int]:
    """Seed piece → corpus count: every substring of every word up to
    ``max_piece_len``, counted with the word's frequency; the top
    ``seed_size`` by (count, piece) plus ALL single characters."""
    counts: dict[str, int] = {}
    for w, f in zip(word_freqs["word"], word_freqs["freq"]):
        f = int(f)
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + f
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                    key=lambda pc: (-pc[1], pc[0]))
    keep = dict(singles)
    for p, c in multis[:max(0, seed_size - len(singles))]:
        keep[p] = c
    return keep


def _forward_backward(word: str, logp: dict[str, float],
                      max_len: int) -> tuple[dict[str, float], float]:
    """Expected piece usage in one word's segmentation lattice and the
    word's log marginal likelihood (forward-backward over substring
    arcs)."""
    n = len(word)
    alpha = np.full(n + 1, _NEG_INF)
    alpha[0] = 0.0
    arcs = []  # (start, end, piece_logp, piece)
    for j in range(n):
        for i in range(max(0, j + 1 - max_len), j + 1):
            p = word[i:j + 1]
            lp = logp.get(p)
            if lp is not None:
                arcs.append((i, j + 1, lp, p))
    for i, e, lp, _p in sorted(arcs, key=lambda a: a[1]):
        v = alpha[i] + lp
        if v > _NEG_INF / 2:
            alpha[e] = np.logaddexp(alpha[e], v) if alpha[e] > _NEG_INF / 2 \
                else v
    z = alpha[n]
    if z <= _NEG_INF / 2:
        return {}, _NEG_INF
    beta = np.full(n + 1, _NEG_INF)
    beta[n] = 0.0
    for i, e, lp, _p in sorted(arcs, key=lambda a: -a[0]):
        v = beta[e] + lp
        if v > _NEG_INF / 2:
            beta[i] = np.logaddexp(beta[i], v) if beta[i] > _NEG_INF / 2 \
                else v
    exp: dict[str, float] = {}
    for i, e, lp, p in arcs:
        w = alpha[i] + lp + beta[e] - z
        if w > -60:
            exp[p] = exp.get(p, 0.0) + math.exp(w)
    return exp, float(z)


def viterbi_encode_word(word: str, logp: dict[str, float],
                        max_len: int = 8) -> list[str]:
    """Best segmentation under the piece log-probs (ties: fewer,
    longer-first pieces via strictly-better comparison)."""
    n = len(word)
    best = np.full(n + 1, _NEG_INF)
    best[0] = 0.0
    back = np.zeros(n + 1, np.int64)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            v = best[i] + lp
            if v > best[j]:
                best[j] = v
                back[j] = i
    if best[n] <= _NEG_INF / 2:  # unsegmentable (unseen char): chars
        return list(word)
    out = []
    j = n
    while j > 0:
        i = int(back[j])
        out.append(word[i:j])
        j = i
    return out[::-1]


def _em_round(vocab: dict[str, float], word_freqs: pd.DataFrame,
              max_len: int) -> tuple[dict[str, float], float]:
    """One soft-EM round → (new log-probs, corpus log-likelihood)."""
    exp_counts: dict[str, float] = {}
    ll = 0.0
    for w, f in zip(word_freqs["word"], word_freqs["freq"]):
        exp, z = _forward_backward(w, vocab, max_len)
        if z <= _NEG_INF / 2:
            continue
        f = int(f)
        ll += f * z
        for p, c in exp.items():
            exp_counts[p] = exp_counts.get(p, 0.0) + f * c
    total = sum(exp_counts.values())
    logt = math.log(total) if total > 0 else 0.0
    new = {p: math.log(c) - logt for p, c in exp_counts.items()
           if c > 1e-9 or len(p) == 1}
    # characters never vanish (segmentability guarantee)
    for p in vocab:
        if len(p) == 1 and p not in new:
            new[p] = math.log(1e-9) - logt
    return new, ll


def train_unigram(word_freqs: pd.DataFrame, vocab_size: int,
                  max_piece_len: int = 8, seed_size: int = 4000,
                  em_subrounds: int = 2, shrink: float = 0.75
                  ) -> pd.DataFrame:
    """Learn a unigram-LM vocabulary of ``vocab_size`` pieces from a
    (word, freq) table. Returns (piece, logp) sorted by logp desc,
    piece asc. ``shrink`` is the per-prune-round keep fraction (the
    SentencePiece default 0.75)."""
    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    seed = seed_vocabulary(word_freqs, max_piece_len, seed_size)
    n_chars = sum(1 for p in seed if len(p) == 1)
    if vocab_size < n_chars:
        raise ValueError(
            f"vocab_size {vocab_size} < {n_chars} distinct characters")
    total = sum(seed.values())
    vocab = {p: math.log(c / total) for p, c in seed.items()}
    while True:
        for _ in range(em_subrounds):
            vocab, _ll = _em_round(vocab, word_freqs, max_piece_len)
        if len(vocab) <= vocab_size:
            break
        # prune: cost of dropping a multi-char piece = freq-weighted
        # (own logp − best alternative segmentation of the piece's own
        # string without it)
        costs = []
        for p, lp in vocab.items():
            if len(p) == 1:
                continue
            rest = dict(vocab)
            rest.pop(p)
            alt = viterbi_encode_word(p, rest, max_piece_len)
            alt_lp = sum(rest.get(q, _NEG_INF) for q in alt)
            costs.append((lp - alt_lp, p, lp))
        costs.sort(key=lambda t: (t[0], t[1]))
        n_multi = len(costs)
        target = max(vocab_size, int(len(vocab) * shrink))
        target_multi = max(0, target - n_chars)
        drop = {p for _c, p, _lp in costs[:max(0, n_multi - target_multi)]}
        if not drop:
            break
        vocab = {p: lp for p, lp in vocab.items() if p not in drop}
        vocab, _ll = _em_round(vocab, word_freqs, max_piece_len)
    out = pd.DataFrame({"piece": list(vocab), "logp": list(vocab.values())})
    return (out.sort_values(["logp", "piece"], ascending=[False, True],
                            kind="stable").reset_index(drop=True))


def unigram_encode(ds: Dataset, pieces: pd.DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   max_piece_len: int = 8, out: str = "counts") -> Dataset:
    """Viterbi-encode the corpus with a trained vocabulary.
    ``out='counts'`` appends n_pieces per doc; ``out='pieces'`` emits
    (id, piece) rows. Log-probs broadcast once; per-batch word cache."""
    import ray

    ref = ray.put(dict(zip(pieces["piece"], pieces["logp"].astype(float))))

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        logp = ray.get(ref)
        cache: dict[str, list[str]] = {}

        def enc(w):
            p = cache.get(w)
            if p is None:
                p = viterbi_encode_word(w, logp, max_piece_len)
                cache[w] = p
            return p

        toks = df[text_col].fillna("").str.split()
        if out == "counts":
            res = df.copy()
            res["n_pieces"] = np.asarray(
                [sum(len(enc(w)) for w in (doc or [])) for doc in toks],
                np.int64)
            return res
        ids, ps = [], []
        for rid, doc in zip(df[id_col], toks):
            for w in doc or []:
                for p in enc(w):
                    ids.append(rid)
                    ps.append(p)
        return pd.DataFrame({id_col: np.asarray(ids), "piece": ps})

    return ds.map_batches(encode, batch_format="pandas")
