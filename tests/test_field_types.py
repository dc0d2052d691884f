"""mapper-plugin field types: aggregate_metric_double equivalence,
unsigned_long sortable-signed order, constant_keyword can_match."""

import numpy as np
import pandas as pd
import pytest

import ray

from elasticsearch_ray.ops.field_types import (
    ConstantKeywordField,
    aggregate_metric_aggs,
    build_aggregate_metric,
    sort_unsigned_long,
    sortable_to_unsigned,
    unsigned_long_range,
    unsigned_to_sortable,
)


def _events(n=1200):
    rng = np.random.RandomState(4)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "value": rng.gamma(2.0, 25.0, n).round(2),
    })


def test_aggregate_metric_equals_raw(ray_session):
    """The field's core contract: aggregating the pre-aggregated
    sub-metrics == aggregating the raw values they summarize."""
    df = _events()
    ds = ray.data.from_pandas(df).repartition(4)
    pre = build_aggregate_metric(ds, ["user_id"], "value", "v")
    got = aggregate_metric_aggs(pre, "v", default_metric="max")
    assert got["min"] == pytest.approx(df["value"].min())
    assert got["max"] == pytest.approx(df["value"].max())
    assert got["sum"] == pytest.approx(df["value"].sum())
    assert got["value_count"] == len(df)
    assert got["avg"] == pytest.approx(df["value"].mean())
    assert got["_default_metric_value"] == got["max"]


def test_unsigned_long_sortable_roundtrip():
    edge = np.array([0, 1, 2**63 - 1, 2**63, 2**64 - 1], np.uint64)
    s = unsigned_to_sortable(edge)
    assert s.dtype == np.int64
    # signed order of the shifted values == unsigned order
    assert (np.argsort(s) == np.arange(len(edge))).all()
    back = sortable_to_unsigned(s)
    assert (back == edge).all()


def test_unsigned_long_sort_and_range(ray_session):
    # values straddling 2^63: as raw int64 bit patterns some are negative
    u = np.array([5, 2**63 + 7, 2**64 - 1, 123456, 2**63 - 1],
                 np.uint64)
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "u": u.view(np.int64)})  # int64 carrier
    ds = ray.data.from_pandas(df).repartition(2)
    out = sort_unsigned_long(ds, "u").to_pandas()
    got = sortable_to_unsigned(unsigned_to_sortable(
        out["u"].to_numpy(np.int64).view(np.uint64)))
    assert got.tolist() == sorted(u.tolist())
    assert "u__sortable" not in out.columns
    # range crossing the sign boundary: [2^63-1, 2^63+7]
    rng = unsigned_long_range(ds, "u", gte=2**63 - 1,
                              lte=2**63 + 7).to_pandas()
    kept = rng["u"].to_numpy(np.int64).view(np.uint64)
    assert sorted(kept.tolist()) == [2**63 - 1, 2**63 + 7]


def test_constant_keyword_can_match(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2]})
    ds = ray.data.from_pandas(df)
    f = ConstantKeywordField("tenant", "acme")
    assert f.matches("acme") and not f.matches("other")
    assert f.matches(["other", "acme"])
    assert f.filter_dataset(ds, "acme").count() == 3
    assert f.filter_dataset(ds, "nope").count() == 0
    # unset constant matches nothing but exists() is False
    unset = ConstantKeywordField("tenant", None)
    assert not unset.matches("acme") and not unset.exists()


def test_token_count_field(ray_session):
    """TokenCountFieldMapper.countPositions: analyzer token positions,
    stop-filter holes counted when position increments are enabled."""
    import ray.data as rd

    from elasticsearch_ray.ops.field_types import token_count_column

    df = pd.DataFrame({"id": [0, 1, 2],
                       "t": ["Hello big wide world", "", "one two"]})
    out = token_count_column(rd.from_pandas(df), "t").to_pandas() \
        .sort_values("id")
    assert out["token_count"].tolist() == [4, 0, 2]
    # a stop-filtered chain: holes count with increments enabled,
    # collapse without (the reference's enable_position_increments)
    stopped = token_count_column(
        rd.from_pandas(df), "t", analyzer="stop").to_pandas() \
        .sort_values("id")["token_count"].tolist()
    flat = token_count_column(
        rd.from_pandas(df), "t", analyzer="stop",
        enable_position_increments=False).to_pandas() \
        .sort_values("id")["token_count"].tolist()
    assert flat[0] <= stopped[0]


def test_murmur3_field_reference_vectors(ray_session):
    """Murmur3FieldMapper stores hash128(utf8).h1 (seed 0) — pinned to
    the published MurmurHash3 x64_128 test vectors."""
    import ray.data as rd

    from elasticsearch_ray.ops.field_types import (
        _murmur3_x64_128_h1,
        murmur3_column,
    )

    assert _murmur3_x64_128_h1(b"") == 0
    assert _murmur3_x64_128_h1(b"hello") & (2**64 - 1) == \
        0xCBD8A7B341BD9B02
    assert _murmur3_x64_128_h1(
        b"The quick brown fox jumps over the lazy dog") & (2**64 - 1) == \
        0xE34BBC7BBC071B6C
    df = pd.DataFrame({"k": ["hello", None, "hello", "other"]})
    ds_out = murmur3_column(rd.from_pandas(df), "k")
    # int64-signed like the Java long (Arrow schema; pandas floats nulls)
    assert ds_out.schema().base_schema.field("k.hash").type == "int64"
    out = ds_out.to_pandas()
    assert out["k.hash"][0] == out["k.hash"][2]  # stable across rows
    assert pd.isna(out["k.hash"][1])
    assert out["k.hash"][0] != out["k.hash"][3]
