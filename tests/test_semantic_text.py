"""semantic_text analog (SemanticTextFieldMapper + SemanticQueryBuilder):
chunked index-time inference, max-over-chunks semantic query, DuckDB
twin of the full bow pipeline."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.search.semantic_text import (
    semantic_index,
    semantic_query,
)


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(11)
    vocab = ["ray", "data", "search", "vector", "chunk", "query",
             "index", "token", "score", "text"]
    rows = []
    for i in range(60):
        rows.append(" ".join(rng.choice(vocab, rng.integers(5, 60))))
    return pd.DataFrame({"doc_id": np.arange(60), "text": rows})


def test_semantic_index_long_shape(ray_session, docs):
    import ray.data as rd

    idx = semantic_index(rd.from_pandas(docs), max_words=16,
                         overlap=4).to_pandas()
    assert set(idx.columns) == {"doc_id", "chunk_ix", "token", "weight"}
    # bow weight = 1 + ln(tf) >= 1
    assert (idx["weight"] >= 1.0 - 1e-12).all()
    # every non-empty doc produced at least one chunk of tokens
    assert set(idx["doc_id"]) == set(range(60))


def test_semantic_query_matches_duckdb_twin(ray_session, docs):
    import ray.data as rd

    idx = semantic_index(rd.from_pandas(docs), max_words=16, overlap=4)
    got = semantic_query(idx, "ray vector vector", k=10)
    # twin: same chunker (stride 12, overlap 4), same bow weights,
    # chunk dot product, max over chunks, top-10
    want = duckdb.sql("""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 len(string_split(text, ' ')) AS n
          FROM docs WHERE text <> ''
        ), chunks AS (
          SELECT doc_id, ((gs - 1) / 12)::BIGINT AS chunk_ix,
                 array_to_string(ws[gs : gs + 15], ' ') AS chunk
          FROM w, LATERAL unnest(generate_series(1, n, 12)) AS t(gs)
          WHERE gs = 1 OR gs <= n - 4
        ), toks AS (
          SELECT doc_id, chunk_ix, t, count(*)::DOUBLE AS tf
          FROM (SELECT doc_id, chunk_ix,
                       unnest(string_split(lower(chunk), ' ')) AS t
                FROM chunks)
          GROUP BY ALL
        ), q AS (
          SELECT * FROM (VALUES ('ray', 1.0),
                                ('vector', 1.0 + ln(2))) AS q(t, qw)
        ), per_chunk AS (
          SELECT doc_id, chunk_ix,
                 sum((1 + ln(tf)) * qw) AS chunk_score
          FROM toks JOIN q USING (t)
          GROUP BY doc_id, chunk_ix
        )
        SELECT doc_id, max(chunk_score) AS score
        FROM per_chunk GROUP BY doc_id
        ORDER BY round(score, 6) DESC, doc_id LIMIT 10
    """).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"], want["score"])


def test_semantic_query_max_over_chunks(ray_session):
    import ray.data as rd

    # doc 0: the match is dense in ONE chunk; doc 1 spreads the same
    # total across chunks -> doc 0 must win under max-over-chunks
    d0 = " ".join(["hit"] * 6 + ["pad"] * 26)
    d1 = " ".join((["hit"] + ["pad"] * 15) * 2)
    docs = pd.DataFrame({"doc_id": [0, 1], "text": [d0, d1]})
    idx = semantic_index(rd.from_pandas(docs), max_words=16, overlap=0)
    got = semantic_query(idx, "hit", k=2)
    assert got["doc_id"].tolist() == [0, 1]
    assert got["score"].iloc[0] > got["score"].iloc[1]


def test_semantic_query_no_overlap_empty_and_unknown_model(ray_session, docs):
    import ray.data as rd

    idx = semantic_index(rd.from_pandas(docs), max_words=16, overlap=4)
    got = semantic_query(idx, "zzz qqq", k=5)
    assert len(got) == 0
    with pytest.raises(ValueError):
        semantic_index(rd.from_pandas(docs), inference_id="elser-v999")


def test_persisted_semantic_index_serving(ray_session, docs,
                                          tmp_path_factory):
    """Persisted serving: chunk index + rank_features sidecar built
    ONCE; semantic queries run weighted_tokens over the index (no
    re-inference), ranks match the streaming path, repeats rebuild
    nothing."""
    import os

    import ray.data as rd

    from elasticsearch_ray.search.semantic_text import (
        build_semantic_text_index,
        semantic_search_indexed,
    )

    idx = str(tmp_path_factory.mktemp("semidx") / "chunks_index")
    eng = build_semantic_text_index(rd.from_pandas(docs), idx,
                                    max_words=16, overlap=4)
    got = semantic_search_indexed(eng, "ray vector vector", k=10)
    # streaming twin on the same chunker: rank set must agree (scores
    # differ only by the 1/32 FeatureField quantization)
    stream_idx = semantic_index(rd.from_pandas(docs), max_words=16,
                                overlap=4)
    want = semantic_query(stream_idx, "ray vector vector", k=10)
    # quantization can swap near-ties: top doc identical, top-5 as a SET
    assert got["doc_id"].iloc[0] == want["doc_id"].iloc[0]
    assert set(got["doc_id"][:5]) == set(want["doc_id"][:5])
    assert np.allclose(np.sort(got["score"]), np.sort(want["score"]),
                       atol=0.20)
    # nothing rebuilds on a repeat: part manifests + sidecars untouched
    # (index_meta.json itself is legitimately rewritten by the resume)
    part0 = os.path.join(idx, "parts", "part=00000")
    m0 = os.path.getmtime(os.path.join(part0, "manifest.json"))
    side0 = [f for f in os.listdir(part0) if "semantic" in f]
    eng2 = build_semantic_text_index(rd.from_pandas(docs), idx,
                                     max_words=16, overlap=4)
    got2 = semantic_search_indexed(eng2, "ray vector vector", k=10)
    assert os.path.getmtime(os.path.join(part0, "manifest.json")) == m0
    assert [f for f in os.listdir(part0) if "semantic" in f] == side0
    assert got2["doc_id"].tolist() == got["doc_id"].tolist()
    # no-match query -> typed empty
    assert len(semantic_search_indexed(eng, "zzz qqq", k=5)) == 0


def test_review_r5f_stale_stage_params_rebuild(ray_session, docs,
                                               tmp_path_factory):
    """Changing chunker params against a cached stage dir must rebuild
    the stage (params marker), not silently serve stale chunks."""
    import os

    import ray.data as rd

    from elasticsearch_ray.search.semantic_text import (
        build_semantic_text_index,
        semantic_search_indexed,
    )

    idx = str(tmp_path_factory.mktemp("semidx2") / "ci")
    build_semantic_text_index(rd.from_pandas(docs), idx,
                              max_words=16, overlap=4)
    stage = idx + ".chunks"
    m0 = os.path.getmtime(stage)
    # different chunker params -> stage regenerates
    # (fresh index dir: the chunk corpus changed entirely)
    idx2 = str(tmp_path_factory.mktemp("semidx3") / "ci")
    import shutil

    shutil.copytree(stage, idx2 + ".chunks")
    shutil.copy(stage + ".params.json", idx2 + ".chunks.params.json")
    eng2 = build_semantic_text_index(rd.from_pandas(docs), idx2,
                                     max_words=12, overlap=2)
    with open(idx2 + ".chunks.params.json") as f:
        import json

        assert json.load(f)["max_words"] == 12
    got = semantic_search_indexed(eng2, "ray vector", k=3)
    assert len(got) > 0
    assert os.path.getmtime(stage) == m0  # original untouched
