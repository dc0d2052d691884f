"""BPE tokenizer training (Sennrich et al. ACL 2016): distributed word
counts, driver merge learning with incremental pair stats, corpus
encoding with broadcast ranks."""

import numpy as np
import pandas as pd
import pytest
import ray

from elasticsearch_ray.ops.bpe import (
    EOW,
    bpe_encode,
    bpe_encode_word,
    learn_bpe,
    word_frequencies,
)


def _paper_freqs():
    # the ACL'16 running example
    return pd.DataFrame({
        "word": ["low", "lower", "newest", "widest"],
        "freq": [5, 2, 6, 3],
    })


def _brute_learn(word_freqs, n):
    vocab = {tuple(w) + (EOW,): f
             for w, f in zip(word_freqs.word, word_freqs.freq)}
    merges = []
    for _ in range(n):
        pc = {}
        for sym, f in vocab.items():
            for p in zip(sym, sym[1:]):
                pc[p] = pc.get(p, 0) + f
        if not pc:
            break
        cnt = max(pc.values())
        if cnt < 2:
            break
        a, b = min(p for p, c in pc.items() if c == cnt)
        merges.append((a, b))
        nv = {}
        for sym, f in vocab.items():
            out, j = [], 0
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == a and sym[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def test_learn_matches_naive_recount():
    wf = _paper_freqs()
    assert learn_bpe(wf, 10) == _brute_learn(wf, 10)
    # the famous first merges: ('e','s') then ('es','t') then ('est','</w>')
    m = learn_bpe(wf, 3)
    assert m == [("e", "s"), ("es", "t"), ("est", EOW)]


def test_learn_min_frequency_stops_early():
    wf = pd.DataFrame({"word": ["ab", "cd"], "freq": [5, 1]})
    m = learn_bpe(wf, 10, min_frequency=2)
    # only 'ab' pairs reach freq >= 2: (a,b) then (ab,</w>)
    assert m == [("a", "b"), ("ab", EOW)]


def test_encode_word_round_trip_and_rank_order():
    wf = _paper_freqs()
    merges = learn_bpe(wf, 10)
    ranks = {p: r for r, p in enumerate(merges)}
    for w in ["newest", "lowest", "wider", "low"]:
        pieces = bpe_encode_word(w, ranks)
        assert "".join(pieces) == w + EOW  # lossless
    assert bpe_encode_word("newest", ranks)[-1].endswith(EOW)
    # an unseen script falls back to characters
    assert bpe_encode_word("zq", {}) == ["z", "q", EOW]


def test_distributed_counts_and_encode(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["low low lower", "newest widest", "low newest",
                 "newest newest", "widest", ""],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    wf = word_frequencies(ds)
    want = pd.Series(" ".join(df.text).split()).value_counts()
    assert dict(zip(wf.word, wf.freq)) == want.to_dict()
    # freq-desc, word-asc deterministic order
    assert wf.freq.is_monotonic_decreasing

    merges = learn_bpe(wf, 8)
    enc = (bpe_encode(ds, merges).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    ranks = {p: r for r, p in enumerate(merges)}
    for _i, row in enc.iterrows():
        want_n = sum(len(bpe_encode_word(w, ranks))
                     for w in row["text"].split())
        assert row["n_pieces"] == want_n
    pieces = bpe_encode(ds, merges, out="pieces").to_pandas()
    joined = (pieces.groupby("doc_id")["piece"]
              .agg("".join).to_dict())
    for i, t in zip(df.doc_id, df.text):
        if t:
            assert joined[i] == t.replace(" ", EOW) + EOW
