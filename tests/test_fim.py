"""Fill-in-the-middle transform (Bavarian et al. 2022, arXiv:2207.14255):
deterministic hash-derived split points, PSM/SPM reorderings, SQL twin."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.llm_prep import fim_transform


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(41)
    texts = ["".join(rng.choice(list("abcdefgh "), size=rng.integers(0, 60)))
             for _ in range(200)]
    texts[0] = ""  # empty-doc edge
    return pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                         "text": texts})


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_fim_character_conservation_and_rate(ray_session, frame):
    out = fim_transform(_ds(frame), "text", "doc_id", rate=0.5).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    applied = 0
    for _, r in out.iterrows():
        if r["fim"] == r["text"] and "<PRE>" not in r["fim"]:
            continue
        applied += 1
        # sentinel-delimited pieces reassemble to the original text
        assert r["fim"].startswith("<PRE>")
        body = r["fim"][len("<PRE>"):]
        p, rest = body.split("<SUF>", 1)
        x, m = rest.split("<MID>", 1)
        assert p + m + x == r["text"]
    assert 0.4 < applied / len(out) < 0.6


def test_fim_spm_mode_prefix_follows_mid(ray_session, frame):
    out = fim_transform(_ds(frame), "text", "doc_id", rate=1.0,
                        mode="spm").to_pandas()
    r = out.sort_values("doc_id").iloc[5]
    body = r["fim"][len("<PRE>"):]
    assert body.startswith("<SUF>")
    x, pm = body[len("<SUF>"):].split("<MID>", 1)
    assert pm + x == r["text"]
    # prefix+middle contiguous after <MID>, suffix between the sentinels
    assert x == r["text"][len(r["text"]) - len(x):]


def test_fim_layout_independent_and_validation(ray_session, frame):
    import ray.data as rd

    a = fim_transform(_ds(frame), "text", "doc_id").to_pandas()
    b = fim_transform(rd.from_pandas(frame).repartition(8),
                      "text", "doc_id").to_pandas()
    pd.testing.assert_frame_equal(a.sort_values("doc_id",
                                                ignore_index=True),
                                  b.sort_values("doc_id",
                                                ignore_index=True))
    with pytest.raises(ValueError, match="mode"):
        fim_transform(None, "text", "doc_id", mode="mps")
    with pytest.raises(ValueError, match="rate"):
        fim_transform(None, "text", "doc_id", rate=1.5)


def test_fim_matches_duckdb_twin(ray_session, frame):
    import duckdb

    got = fim_transform(_ds(frame), "text", "doc_id",
                        rate=0.5).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)[["doc_id", "fim"]]
    documents = frame  # noqa: F841 — duckdb binds it
    want = duckdb.sql("""
        SELECT doc_id,
               CASE WHEN (doc_id * 2654435761) % 4294967296
                         < floor(0.5 * 4294967296)
               THEN '<PRE>' || substr(text, 1, lo)
                    || '<SUF>' || substr(text, hi + 1)
                    || '<MID>' || substr(text, lo + 1, hi - lo)
               ELSE text END AS fim
        FROM (
          SELECT doc_id, text, least(c1, c2) AS lo,
                 greatest(c1, c2) AS hi
          FROM (
            SELECT doc_id, text,
                   ((doc_id * 2 + 1) * 2654435761 % 4294967296)
                     % (length(text) + 1) AS c1,
                   ((doc_id * 2 + 2) * 2654435761 % 4294967296)
                     % (length(text) + 1) AS c2
            FROM documents))
        ORDER BY doc_id
    """).df()
    assert got["fim"].tolist() == want["fim"].tolist()
