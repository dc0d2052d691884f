"""DoReMi domain reweighting (Xie et al. 2023, arXiv:2305.10429):
closed-form single-step EG weights from unigram-vs-bigram excess loss,
uniform smoothing, deterministic Knuth-hash resample."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.doremi import (
    doremi_domain_weights,
    doremi_rates,
    doremi_resample,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(31)
    rows = []
    # domain "struct": strong bigram structure (fixed phrases) — the
    # bigram reference beats the unigram proxy by a lot → high excess
    phrases = ["alpha beta gamma delta", "epsilon zeta eta theta"]
    for i in range(120):
        rows.append(("struct", " ".join(
            phrases[j % 2] for j in range(i % 3 + 2))))
    # domain "soup": tokens drawn independently — bigrams add ~nothing
    vocab = [f"w{j}" for j in range(40)]
    for i in range(120):
        rows.append(("soup", " ".join(rng.choice(vocab, size=12))))
    # domain "tiny": few docs, mild structure
    for i in range(20):
        rows.append(("tiny", "kappa lambda mu " * (i % 2 + 1)))
    df = pd.DataFrame(rows, columns=["lang", "text"])
    df.insert(0, "doc_id", np.arange(len(df), dtype=np.int64))
    return df


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_weights_shape_and_ordering(ray_session, corpus):
    stats = doremi_domain_weights(_ds(corpus), "lang", eta=1.0,
                                  smoothing=0.1)
    assert list(stats["domain"]) == ["soup", "struct", "tiny"]
    assert np.isclose(stats["alpha"].sum(), 1.0)
    # uniform smoothing floor: alpha_d >= c / K
    assert (stats["alpha"] >= 0.1 / 3 - 1e-12).all()
    s = stats.set_index("domain")
    # bigram-predictable domain has the largest excess → largest alpha
    assert s.loc["struct", "excess"] > s.loc["soup", "excess"]
    assert s.loc["struct", "alpha"] > s.loc["soup", "alpha"]
    assert (stats["excess"] >= 0).all()


def test_resample_layout_independent(ray_session, corpus):
    import ray.data as rd

    sampled1, stats = doremi_resample(_ds(corpus), "lang", "doc_id",
                                      target_fraction=0.5)
    ids1 = sorted(sampled1.to_pandas()["doc_id"])
    sampled8, _ = doremi_resample(rd.from_pandas(corpus).repartition(8),
                                  "lang", "doc_id", target_fraction=0.5)
    ids8 = sorted(sampled8.to_pandas()["doc_id"])
    assert ids1 == ids8 and 0 < len(ids1) < len(corpus)


def test_rates_formula_and_validation(ray_session, corpus):
    stats = doremi_domain_weights(_ds(corpus), "lang")
    rates = doremi_rates(stats, target_fraction=0.5)
    n = stats.set_index("domain")["n_docs"]
    total = n.sum()
    a = stats.set_index("domain")["alpha"]
    for d, r in rates.items():
        assert r == min(1.0, round(0.5 * total * a[d] / n[d], 6))
    with pytest.raises(ValueError, match="smoothing"):
        doremi_domain_weights(_ds(corpus), "lang", smoothing=1.5)
    with pytest.raises(ValueError, match="eta"):
        doremi_domain_weights(_ds(corpus), "lang", eta=-1)


def test_resample_matches_duckdb_twin(ray_session, corpus):
    """Full-chain SQL twin: LM NLLs, domain means, EG weight, smoothing,
    rate, Knuth-hash rule — selected ids must match exactly."""
    import duckdb

    sampled, _ = doremi_resample(_ds(corpus), "lang", "doc_id",
                                 eta=1.0, smoothing=0.1,
                                 target_fraction=0.5)
    got = sorted(sampled.to_pandas()["doc_id"])
    documents = corpus  # noqa: F841 — duckdb binds it
    want = duckdb.sql("""
        WITH d AS (
          SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), x -> x <> '') AS ts
          FROM documents WHERE length(text) > 0
        ),
        uni_tok AS (SELECT doc_id, unnest(ts) AS t FROM d),
        freq AS (SELECT t, count(*) AS c FROM uni_tok GROUP BY t),
        tot AS (SELECT sum(c) AS s, count(*) AS v FROM freq),
        pu AS (SELECT t, (c + 1.0) / (s + v) AS p FROM freq, tot),
        bg AS (SELECT doc_id,
                      unnest([ts[i] || chr(31) || ts[i+1]
                              FOR i IN range(1, len(ts))]) AS pair
               FROM d),
        bc AS (SELECT pair, count(*) AS c FROM bg GROUP BY pair),
        ctx AS (SELECT split_part(pair, chr(31), 1) AS pt, sum(c) AS n
                FROM bc GROUP BY pt),
        pml AS (SELECT pair, bc.c * 1.0 / ctx.n AS p
                FROM bc JOIN ctx
                  ON split_part(bc.pair, chr(31), 1) = ctx.pt),
        nll1 AS (SELECT doc_id, round(-avg(ln(pu.p)), 4) AS v
                 FROM uni_tok JOIN pu USING (t) GROUP BY doc_id),
        lps2 AS (
          SELECT d.doc_id, ln(pu.p) AS lp
          FROM d JOIN pu ON d.ts[1] = pu.t
          UNION ALL
          SELECT bg.doc_id, ln(0.9 * pml.p + 0.1 * pu.p) AS lp
          FROM bg JOIN pml USING (pair)
          JOIN pu ON split_part(bg.pair, chr(31), 2) = pu.t
        ),
        nll2 AS (SELECT doc_id, round(-avg(lp), 4) AS v
                 FROM lps2 GROUP BY doc_id),
        dom AS (
          SELECT doc.lang, count(*) AS n, avg(nll1.v) AS m1,
                 avg(nll2.v) AS m2
          FROM documents doc
          LEFT JOIN nll1 USING (doc_id) LEFT JOIN nll2 USING (doc_id)
          GROUP BY doc.lang
        ),
        w AS (SELECT lang, n, exp(1.0 * greatest(m1 - m2, 0)) AS ew
              FROM dom),
        a AS (SELECT lang, n,
                     0.9 * ew / sum(ew) OVER ()
                       + 0.1 / count(*) OVER () AS alpha,
                     sum(n) OVER () AS total FROM w),
        r AS (SELECT lang,
                     round(least(1.0, 0.5 * total * alpha / n), 6)
                       AS rate FROM a)
        SELECT doc.doc_id FROM documents doc JOIN r USING (lang)
        WHERE (doc.doc_id * 2654435761) % 4294967296
              < floor(r.rate * 4294967296)
        ORDER BY doc_id
    """).df()["doc_id"].tolist()
    assert got == want
