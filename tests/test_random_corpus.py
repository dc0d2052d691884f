"""Seeded-random-corpus invariants (SURVEY §5 adoption, point 3): for
generated corpora with zipfian vocab and varied doc lengths, the full
distributed pipeline must agree with a brute-force in-memory BM25 — and
BMW must equal exhaustive — across query shapes."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.norms import byte4_to_int, int_to_byte4
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchPhraseQuery, MatchQuery

K1, B = 1.2, 0.75


def _zipf_corpus(seed, n_docs=400, vocab_size=300):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(vocab_size)])
    weights = 1.0 / np.arange(1, vocab_size + 1) ** 1.1
    weights /= weights.sum()
    docs = []
    for i in range(n_docs):
        n = int(rng.integers(3, 200))
        docs.append(" ".join(rng.choice(vocab, size=n, p=weights)))
    return docs


def _brute(docs_tokens, terms, op="or"):
    N = len(docs_tokens)
    avgdl = sum(len(t) for t in docs_tokens) / N
    df = Counter()
    for toks in docs_tokens:
        df.update(set(toks))
    out = []
    for i, toks in enumerate(docs_tokens):
        c = Counter(toks)
        dl = float(byte4_to_int(int_to_byte4(np.array([len(toks)])))[0])
        s, matched = 0.0, 0
        for t in terms:
            tf = c.get(t, 0)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (K1 + 1) * tf / (tf + K1 * (1 - B + B * dl / avgdl))
        need = len(terms) if op == "and" else 1
        if matched >= need:
            out.append((i, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("seed", [11, 29, 53])
def test_random_corpus_pipeline_matches_bruteforce(ray_session, tmp_path, seed):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    docs = _zipf_corpus(seed)
    docs_tokens = [d.split() for d in docs]
    src = tmp_path / "src"
    src.mkdir()
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    # several files → several partitions → cross-partition merge exercised
    for fi in range(4):
        part = df.iloc[fi * 100 : (fi + 1) * 100]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       src / f"d-{fi}.parquet")
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                IndexSpec(use_html=False, text_column="text", doc_columns=("doc_id",),
                          files_per_partition=2, salt_docs=32, head_df_ratio=0.05),
                concurrency=2)
    eng = QueryEngine(idx, dtype="float64")

    rng = np.random.default_rng(seed + 1)
    vocab = sorted({t for toks in docs_tokens for t in toks})
    for qi in range(6):
        n_terms = int(rng.integers(1, 4))
        # mix head terms and random tail terms
        terms = list(rng.choice(vocab[:20], n_terms // 2 + 1)) + list(
            rng.choice(vocab, n_terms)
        )
        terms = list(dict.fromkeys(terms))[: max(1, n_terms)]
        op = "and" if qi % 3 == 0 else "or"
        want = _brute(docs_tokens, terms, op)[:15]
        got = eng.search(MatchQuery(" ".join(terms), operator=op), k=15,
                         mode="exhaustive", fetch=("doc_id",)).to_pylist()
        assert [(r["doc_id"]) for r in got] == [d for d, _ in want], (seed, terms, op)
        for r, (d, s) in zip(got, want):
            assert abs(r["score"] - s) < 1e-9 * max(s, 1)
        # BMW == exhaustive on the same query
        bmw = eng.search(MatchQuery(" ".join(terms), operator=op), k=15,
                         mode="bmw", fetch=("doc_id",)).to_pylist()
        assert [(r["doc_id"], r["score"]) for r in bmw] == [
            (r["doc_id"], r["score"]) for r in got
        ]

    # phrase invariant: engine phrase hits == python scan for consecutive pair
    toks0 = docs_tokens[0]
    if len(toks0) >= 2:
        a, b = toks0[0], toks0[1]
        got = {
            r["doc_id"]
            for r in eng.search(MatchPhraseQuery(f"{a} {b}"), k=10**9,
                                mode="exhaustive", fetch=("doc_id",)).to_pylist()
        }
        want = {
            i
            for i, toks in enumerate(docs_tokens)
            if any(x == a and y == b for x, y in zip(toks, toks[1:]))
        }
        assert got == want
