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


def test_span_corruption_reconstructs_and_density(ray_session, frame):
    """T5 span corruption (Raffel et al. 2020 §3.1.4): interleaving
    inputs/targets around matching sentinels reconstructs the original
    token stream; noise fraction tracks the density; deterministic
    across layouts."""
    import ray.data as rd

    from elasticsearch_ray.ops.llm_prep import span_corruption

    rng = np.random.default_rng(43)
    texts = [" ".join(f"t{j}" for j in range(rng.integers(2, 80)))
             for _ in range(150)] + ["", "one"]
    df = pd.DataFrame({"doc_id": np.arange(152, dtype=np.int64),
                       "text": texts})
    out = span_corruption(_ds(df), "text", "doc_id",
                          noise_density=0.15).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    noise_frac = []
    for _, r in out.iterrows():
        toks = r["text"].split()
        if len(toks) < 2:
            assert r["inputs"] == r["text"] and r["targets"] == ""
            continue
        inp, tgt = r["inputs"].split(), r["targets"].split()
        # stitch: walk inputs, swapping each sentinel for its span
        spans = {}
        cur = None
        for t in tgt:
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt, n_noise = [], 0
        for t in inp:
            if t.startswith("<extra_id_"):
                rebuilt.extend(spans[t])
                n_noise += len(spans[t])
            else:
                rebuilt.append(t)
        assert rebuilt == toks
        # per-doc exact T5 count: clamp(round(n*density), 1, n-1)
        assert n_noise == min(max(int(round(len(toks) * 0.15)), 1),
                              len(toks) - 1)
        # sentinels appear in ascending order in BOTH streams
        sent_i = [t for t in inp if t.startswith("<extra_id_")]
        sent_t = [t for t in tgt if t.startswith("<extra_id_")]
        assert sent_i == [f"<extra_id_{j}>" for j in range(len(sent_i))]
        assert sent_t[:-1] == sent_i
        assert sent_t[-1] == f"<extra_id_{len(sent_i)}>"
        noise_frac.append(n_noise / len(toks))
    assert 0.10 < np.mean(noise_frac) < 0.20
    b = span_corruption(rd.from_pandas(df).repartition(9), "text",
                        "doc_id", noise_density=0.15).to_pandas()
    pd.testing.assert_frame_equal(
        out, b.sort_values("doc_id", ignore_index=True))


def test_span_corruption_validation():
    from elasticsearch_ray.ops.llm_prep import span_corruption

    with pytest.raises(ValueError, match="noise_density"):
        span_corruption(None, "text", "doc_id", noise_density=1.0)
    with pytest.raises(ValueError, match="mean_span_length"):
        span_corruption(None, "text", "doc_id", mean_span_length=0)


def test_prefix_lm_split_bounds_and_duckdb(ray_session, frame):
    import duckdb
    import ray.data as rd

    from elasticsearch_ray.ops.llm_prep import prefix_lm_split

    out = prefix_lm_split(_ds(frame), "text", "doc_id").to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    for _, r in out.iterrows():
        assert r["inputs"] + r["targets"] == r["text"]
        n = len(r["text"])
        assert int(0.25 * n) <= len(r["inputs"]) <= int(0.75 * n)
    b = prefix_lm_split(rd.from_pandas(frame).repartition(6), "text",
                        "doc_id").to_pandas()
    pd.testing.assert_frame_equal(out, b.sort_values("doc_id",
                                                     ignore_index=True))
    documents = frame  # noqa: F841
    want = duckdb.sql("""
        SELECT doc_id, substr(text, 1, cut) AS inputs,
               substr(text, cut + 1) AS targets
        FROM (
          SELECT doc_id, text,
                 floor(0.25 * length(text))::BIGINT
                 + ((doc_id * 3 + 1) * 2654435761 % 4294967296)
                   % (floor(0.75 * length(text))::BIGINT
                      - floor(0.25 * length(text))::BIGINT + 1) AS cut
          FROM documents)
        ORDER BY doc_id
    """).df()
    assert out["inputs"].tolist() == want["inputs"].tolist()
    assert out["targets"].tolist() == want["targets"].tolist()
    with pytest.raises(ValueError, match="min_prefix"):
        prefix_lm_split(None, "text", "doc_id", min_prefix=0.9,
                        max_prefix=0.5)
