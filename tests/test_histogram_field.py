"""histogram field type — agg-over-preagg == agg-over-raw contract.

Reference semantics: HistogramFieldMapper.java (parallel increasing values /
non-negative counts), HistoBacked{Sum,ValueCount,Avg,Min,Max}Aggregator,
AbstractHistoBackedTDigestPercentilesAggregator (weighted centroids).
"""

import numpy as np
import pandas as pd
import pytest
import ray

from elasticsearch_ray.ops.histogram_field import (
    build_histogram_docs,
    histogram_bucket_agg,
    histogram_percentiles,
    histogram_stats,
    validate_histogram,
)


def _raw(n=4000):
    rng = np.random.RandomState(11)
    return pd.DataFrame({
        "user_id": rng.randint(0, 60, n).astype(np.int64),
        "value": np.round(rng.gamma(2.0, 50.0, n), 2),
    })


def test_validate_histogram_mapper_rules():
    validate_histogram(np.array([1.0, 2.0]), np.array([3, 0]))
    with pytest.raises(ValueError, match="same length"):
        validate_histogram(np.array([1.0]), np.array([1, 2]))
    with pytest.raises(ValueError, match=">= 0"):
        validate_histogram(np.array([1.0]), np.array([-1]))
    with pytest.raises(ValueError, match="increasing"):
        validate_histogram(np.array([2.0, 1.0]), np.array([1, 1]))


def test_build_docs_and_stats_match_raw(ray_session):
    df = _raw()
    ds = ray.data.from_pandas(df).repartition(5)
    docs = build_histogram_docs(ds, "user_id", "value").materialize()
    pdocs = docs.to_pandas()
    assert len(pdocs) == df["user_id"].nunique()
    for _, row in pdocs.head(5).iterrows():
        validate_histogram(np.array(row["values"]),
                           np.array(row["counts"]))

    stats = histogram_stats(docs)
    assert stats["value_count"] == len(df)
    assert np.isclose(stats["sum"], df["value"].sum())
    assert stats["min"] == df["value"].min()
    assert stats["max"] == df["value"].max()
    assert np.isclose(stats["avg"], df["value"].mean())


def test_bucket_agg_exact_vs_raw(ray_session):
    df = _raw()
    docs = build_histogram_docs(
        ray.data.from_pandas(df).repartition(4), "user_id", "value")
    got = histogram_bucket_agg(docs, 25.0)
    want = (df.assign(bucket=np.floor(df["value"] / 25.0) * 25.0)
            .groupby("bucket", as_index=False).size()
            .rename(columns={"size": "doc_count"})
            .sort_values("bucket", ignore_index=True))
    assert got["bucket"].tolist() == want["bucket"].tolist()
    assert got["doc_count"].tolist() == want["doc_count"].tolist()


def test_percentiles_weighted_centroids(ray_session):
    df = _raw(6000)
    docs = build_histogram_docs(
        ray.data.from_pandas(df).repartition(4), "user_id", "value")
    got = histogram_percentiles(docs, [50, 95, 99])
    raw = np.sort(df["value"].to_numpy())
    for p in (50, 95, 99):
        exact = float(np.percentile(raw, p))
        rel = abs(got[f"{p}"] - exact) / max(abs(exact), 1e-9)
        assert rel < 0.05, (p, got[f"{p}"], exact)


def test_empty_and_single_value(ray_session):
    docs = ray.data.from_pandas(pd.DataFrame({
        "k": [1], "values": [[7.5]], "counts": [[3]]}))
    s = histogram_stats(docs)
    assert s == {"sum": 22.5, "value_count": 3, "min": 7.5, "max": 7.5,
                 "avg": 7.5}
    b = histogram_bucket_agg(docs, 5.0)
    assert b["bucket"].tolist() == [5.0]
    assert b["doc_count"].tolist() == [3]
