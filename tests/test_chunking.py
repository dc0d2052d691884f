"""Chunking strategies (x-pack inference chunking settings: word /
sentence boundary chunkers) — invariants + DuckDB twin for the word
strategy."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.chunking import (
    chunk_documents,
    sentence_chunks,
    word_chunk_starts,
    word_chunks,
)


def test_word_chunk_starts_rule():
    # n=10, max=4, overlap=1 -> stride 3; starts while s+4 < 10
    assert word_chunk_starts(10, 4, 1) == [0, 3, 6]
    assert word_chunk_starts(4, 4, 1) == [0]
    assert word_chunk_starts(5, 4, 1) == [0, 3]
    assert word_chunk_starts(0, 4, 1) == [0]
    with pytest.raises(ValueError):
        word_chunk_starts(10, 4, 3)  # overlap > max/2


def test_word_chunks_overlap_and_coverage():
    words = [f"w{i}" for i in range(23)]
    text = " ".join(words)
    cs = word_chunks(text, max_words=10, overlap=4)
    # every chunk except maybe the last has exactly max_words words
    assert all(len(c.split(" ")) == 10 for c in cs[:-1])
    assert len(cs[-1].split(" ")) <= 10
    # consecutive chunks share exactly `overlap`... the stride rule:
    # chunk k starts at k*(max-overlap)
    assert cs[1].split(" ")[0] == "w6"
    # coverage: concatenating de-overlapped chunks recovers the text
    stride = 6
    rebuilt = cs[0].split(" ")
    for c in cs[1:]:
        rebuilt.extend(c.split(" ")[len(rebuilt) - stride * (
            (len(rebuilt) - 10) // stride + 1):] if False else
            c.split(" ")[10 - stride:])
    # simpler: every source word appears in at least one chunk in order
    seen = [w for c in cs for w in c.split(" ")]
    assert set(seen) == set(words)
    assert seen[:10] == words[:10]


def test_sentence_chunks_pack_and_fallback():
    text = ("One two three. Four five six! Seven eight nine? "
            "Ten eleven twelve.")
    cs = sentence_chunks(text, max_words=7)
    # whole sentences only, each chunk <= 7 words
    assert all(len(c.split(" ")) <= 7 for c in cs)
    assert cs[0] == "One two three. Four five six!"
    # a single over-budget sentence falls back to word windows
    long = " ".join(f"w{i}" for i in range(20)) + "."
    cs2 = sentence_chunks("Hi there. " + long, max_words=8)
    assert cs2[0] == "Hi there."
    assert all(len(c.split(" ")) <= 8 for c in cs2)
    assert sum(len(c.split(" ")) for c in cs2[1:]) == 20


def test_chunk_documents_matches_duckdb_twin(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    docs = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [" ".join(rng.choice(["alpha", "beta", "gamma", "delta"],
                                     rng.integers(1, 90)))
                 for _ in range(40)],
    })
    out = (chunk_documents(rd.from_pandas(docs), max_words=16, overlap=6)
           .to_pandas().sort_values(["doc_id", "chunk_ix"],
                                    ignore_index=True))
    want = duckdb.sql("""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 len(string_split(text, ' ')) AS n
          FROM docs
        )
        SELECT doc_id, ((gs - 1) / 10)::BIGINT AS chunk_ix,
               array_to_string(ws[gs : gs + 15], ' ') AS chunk,
               least(16, n - gs + 1)::BIGINT AS n_words
        FROM w, LATERAL unnest(generate_series(1, n, 10)) AS t(gs)
        WHERE gs = 1 OR gs <= n - 6
        ORDER BY doc_id, chunk_ix
    """).df()
    assert len(out) == len(want)
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["chunk"].tolist() == want["chunk"].tolist()
    assert out["n_words"].tolist() == want["n_words"].astype(int).tolist()


def test_chunk_documents_sentence_strategy(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["A b c. D e f. G h i j k l m n o p.", ""],
    })
    out = (chunk_documents(rd.from_pandas(docs), strategy="sentence",
                           max_words=6)
           .to_pandas().sort_values(["doc_id", "chunk_ix"],
                                    ignore_index=True))
    d0 = out[out.doc_id == 0]
    assert (d0["n_words"] <= 6).all()
    assert d0["chunk"].iloc[0] == "A b c. D e f."
    # empty doc -> zero chunk rows
    assert (out.doc_id == 1).sum() == 0
