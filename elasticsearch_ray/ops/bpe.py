"""BPE tokenizer TRAINING over a corpus (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016)
— the learn-the-vocabulary step a training-data pipeline runs before
token counting / packing.

Distribution shape (the published algorithm's own split):

1. WORD-FREQUENCY TABLE — the only corpus-sized pass: per-batch
   ``value_counts`` partials → one vocabulary-bounded groupby. At 100 TB
   the distinct-word table is millions of rows (Heaps' law), not
   corpus-sized — it fits the driver by construction, exactly like the
   fastBPE / subword-nmt implementations that train from a pre-counted
   dict file.
2. MERGE LEARNING on the compact (word, freq) table — inherently
   sequential (merge i+1 depends on merge i), run once on the driver
   with incremental pair-count updates touching only words that contain
   the merged pair.
3. ENCODING back over the corpus: the learned merge ranks broadcast
   once via ``ray.put``; each batch encodes with a per-actor word →
   pieces cache (Zipf makes the hit rate ≈1).

End-of-word is marked with the subword-nmt ``</w>`` sentinel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

EOW = "</w>"


def word_frequencies(ds: Dataset, text_col: str = "text") -> pd.DataFrame:
    """Corpus (word, freq) table — per-batch partial counts, one
    vocab-bounded groupby, deterministic (freq desc, word) order."""
    from ray.data.aggregate import Sum

    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split()
        flat = [w for doc in toks for w in (doc or [])]
        if not flat:
            return pd.DataFrame({"word": pd.Series(dtype=str),
                                 "n": pd.Series(dtype=np.int64)})
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"word": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("word").aggregate(Sum("n", alias_name="freq"))
           .to_pandas())
    if out.empty or "freq" not in out.columns:
        return pd.DataFrame({"word": pd.Series(dtype=str),
                             "freq": pd.Series(dtype=np.int64)})
    return (out.sort_values(["freq", "word"], ascending=[False, True],
                            kind="stable").reset_index(drop=True))


def learn_bpe(word_freqs: pd.DataFrame, num_merges: int,
              min_frequency: int = 2) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a (word, freq) table — the ACL'16
    algorithm with incremental pair-stat updates. Ties break on the
    lexicographically smallest pair (deterministic across runs; the
    subword-nmt reference breaks ties the same way after its count
    sort). Stops early when the best pair's count < min_frequency."""
    vocab: dict[tuple, int] = {}
    for w, f in zip(word_freqs["word"], word_freqs["freq"]):
        sym = tuple(w) + (EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(f)

    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    words = list(vocab)

    def add_word(idx, sym, f):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(idx)

    freqs = [vocab[s] for s in words]
    for i, s in enumerate(words):
        add_word(i, s, freqs[i])

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        cnt = max(pair_counts.values())
        a, b = min(p for p, c in pair_counts.items() if c == cnt)
        if cnt < min_frequency:
            break
        merges.append((a, b))
        new = a + b
        for idx in list(pair_words.get((a, b), ())):
            sym, f = words[idx], freqs[idx]
            # remove old pair stats for this word
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(idx)
                    if not ws:
                        pair_words.pop(p, None)
            # apply the merge inside the word
            out = []
            j = 0
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == a and sym[j + 1] == b:
                    out.append(new)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[idx] = tuple(out)
            add_word(idx, words[idx], f)
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Encode one word with learned merge ranks (lowest rank first —
    the standard BPE apply order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        pairs = [(ranks.get((sym[i], sym[i + 1]), np.inf), i)
                 for i in range(len(sym) - 1)]
        rank, i = min(pairs)
        if rank == np.inf:
            break
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(ds: Dataset, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               out: str = "counts") -> Dataset:
    """Encode the corpus with learned merges. ``out='counts'`` appends
    n_pieces per doc; ``out='pieces'`` emits (id, piece) rows. Merge
    ranks broadcast once; per-batch word→pieces dict cache (Zipf)."""
    import ray

    ref = ray.put({p: r for r, p in enumerate(merges)})

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        ranks = ray.get(ref)
        cache: dict[str, list[str]] = {}

        def enc(w):
            p = cache.get(w)
            if p is None:
                p = bpe_encode_word(w, ranks)
                cache[w] = p
            return p

        toks = df[text_col].fillna("").str.split()
        if out == "counts":
            res = df.copy()
            res["n_pieces"] = [
                sum(len(enc(w)) for w in (doc or [])) for doc in toks]
            return res
        ids, pieces = [], []
        for rid, doc in zip(df[id_col], toks):
            for w in doc or []:
                for p in enc(w):
                    ids.append(rid)
                    pieces.append(p)
        return pd.DataFrame({id_col: np.asarray(ids), "piece": pieces})

    return ds.map_batches(encode, batch_format="pandas")
