"""unsigned_long / constant_keyword / aggregate_metric_double mapper
semantics (x-pack mapper plugins), pinned to the reference's parse,
saturation, rewrite and delegation rules."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops import xpack_mappers as xm

U64_MAX = (1 << 64) - 1


# ------------------------------------------------------------ unsigned_long

def test_lane_roundtrip_and_order():
    vals = np.array([0, 1, 2**63 - 1, 2**63, 2**63 + 1, U64_MAX],
                    dtype=np.uint64)
    lane = xm.unsigned_to_lane(vals)
    assert list(xm.lane_to_unsigned(lane)) == list(vals)
    # signed order of the lane == unsigned order of the values
    assert list(np.argsort(lane)) == list(range(len(vals)))


def test_parse_term_rules():
    assert xm.parse_term(5) == 5
    assert xm.parse_term(-1) is None
    assert xm.parse_term(U64_MAX) == U64_MAX
    assert xm.parse_term(U64_MAX + 1) is None
    assert xm.parse_term("18446744073709551615") == U64_MAX
    assert xm.parse_term(10.5) is None
    assert xm.parse_term("10.5") is None
    assert xm.parse_term(10.0) == 10
    with pytest.raises(ValueError):
        xm.parse_term("not-a-number")


def test_parse_range_term_saturation():
    # lower: clamp below zero, decimal rounds UP, exclusive steps up
    assert xm.parse_lower_range_term(-5, True) == 0
    assert xm.parse_lower_range_term("10.5", True) == 11
    assert xm.parse_lower_range_term(10, False) == 11
    assert xm.parse_lower_range_term(U64_MAX, False) is None
    assert xm.parse_lower_range_term(U64_MAX + 10, True) is None
    # upper: clamp above max, decimal truncates, exclusive steps down
    assert xm.parse_upper_range_term(U64_MAX + 10, True) == U64_MAX
    assert xm.parse_upper_range_term("10.5", True) == 10
    assert xm.parse_upper_range_term(10, False) == 9
    assert xm.parse_upper_range_term(-1, True) is None
    assert xm.parse_upper_range_term(0, False) is None
    assert xm.parse_upper_range_term(0, True) == 0


def test_unsigned_filters_and_stats(ray_session):
    import ray.data as rd

    vals = np.array([0, 10, 2**63 - 1, 2**63, 2**63 + 5, U64_MAX],
                    dtype=np.uint64)
    ds = rd.from_pandas(pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "u": xm.unsigned_to_lane(vals)}))
    # range crossing the signed boundary
    hit = xm.unsigned_range_filter(ds, "u", gte=2**63 - 1,
                                   lte=2**63 + 5).to_pandas()
    assert sorted(hit["id"]) == [2, 3, 4]
    # negative lower bound saturates to 0 (matches everything)
    assert xm.unsigned_range_filter(ds, "u", gte=-100).count() == 6
    # impossible ranges are empty, schema preserved
    empty = xm.unsigned_range_filter(ds, "u", gt=U64_MAX).to_pandas()
    assert len(empty) == 0
    # term above the signed boundary
    t = xm.unsigned_term_filter(ds, "u", 2**63 + 5).to_pandas()
    assert list(t["id"]) == [4]
    assert xm.unsigned_term_filter(ds, "u", -3).count() == 0
    st = xm.unsigned_stats(ds, "u")
    assert st["count"] == 6
    assert st["min"] == 0 and st["max"] == U64_MAX
    assert st["sum"] == sum(int(v) for v in vals)  # > int64 max: exact
    assert st["sum"] > np.iinfo(np.int64).max


def test_unsigned_top_k(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, size=200, dtype=np.uint64)
    vals[10] = U64_MAX
    vals[50] = 2**63 + 123
    ds = rd.from_pandas(pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "u": xm.unsigned_to_lane(vals)}))
    top = xm.unsigned_top_k(ds, "u", 3)
    got = list(xm.lane_to_unsigned(top["u"].to_numpy()))
    want = sorted((int(v) for v in vals), reverse=True)[:3]
    assert got == want


# --------------------------------------------------------- constant_keyword

def test_constant_keyword_rewrites():
    f = xm.ConstantKeywordField("corpus", "web-prod")
    assert f.term_query("web-prod")
    assert not f.term_query("web-dev")
    assert f.term_query("WEB-PROD", case_insensitive=True)
    assert f.terms_query(["a", "web-prod"])
    assert f.exists_query()
    assert not xm.ConstantKeywordField("corpus", None).exists_query()
    # simpleMatch: only * is special; ? is a literal
    assert f.wildcard_query("web-*")
    assert f.wildcard_query("*prod")
    assert f.wildcard_query("w*b*d")
    assert not f.wildcard_query("web-????")
    assert f.prefix_query("web")
    # lexicographic range with inclusive-flag edges (:183-204)
    assert f.range_query("web-prod", None, include_lower=True)
    assert not f.range_query("web-prod", None, include_lower=False)
    assert f.range_query(None, "web-prod", include_upper=True)
    assert not f.range_query(None, "web-prod", include_upper=False)
    assert f.range_query("web-a", "web-z")
    assert not f.range_query("web-q", "web-z")
    # fuzzy: AUTO over an 8-char term allows 2 edits
    assert f.fuzzy_query("web-prud")
    assert f.fuzzy_query("web-rpod")  # one transposition
    assert not f.fuzzy_query("web-rpod", transpositions=False,
                             fuzziness=1)
    assert not f.fuzzy_query("wxy-prod", prefix_length=3)
    assert f.regexp_query("web-.*")
    assert not f.regexp_query("web")


def test_constant_keyword_null_never_matches():
    f = xm.ConstantKeywordField("corpus", None)
    assert not f.term_query("x")
    assert not f.range_query("a", "z")
    assert not f.wildcard_query("*")
    assert not f.fuzzy_query("x")
    assert not f.regexp_query(".*")


# --------------------------------------------- aggregate_metric_double

def test_aggregate_metric_spec_validation():
    s = xm.AggregateMetricSpec(("min", "max"), "max")
    assert s.subfield("max") == "m.max"
    # single metric: becomes the default
    assert xm.AggregateMetricSpec(("sum",)).default_metric == "sum"
    with pytest.raises(ValueError, match="default_metric.*required"):
        xm.AggregateMetricSpec(("min", "max"))
    with pytest.raises(ValueError, match="not defined in the metrics"):
        xm.AggregateMetricSpec(("min",), "max")
    with pytest.raises(ValueError, match="unknown metrics"):
        xm.AggregateMetricSpec(("median",), "median")


@pytest.fixture()
def metric_docs(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    raw = pd.DataFrame({
        "g": rng.integers(0, 20, size=500),
        "v": rng.normal(50, 10, size=500)})
    spec = xm.AggregateMetricSpec(
        ("min", "max", "sum", "value_count"), "max")
    docs = xm.build_aggregate_metric_docs(
        rd.from_pandas(raw), ["g"], "v", spec)
    return raw, spec, docs


def test_aggregate_metric_aggs_match_raw(metric_docs):
    raw, spec, docs = metric_docs
    assert xm.aggregate_metric_agg(docs, spec, "min") == \
        pytest.approx(raw["v"].min())
    assert xm.aggregate_metric_agg(docs, spec, "max") == \
        pytest.approx(raw["v"].max())
    assert xm.aggregate_metric_agg(docs, spec, "sum") == \
        pytest.approx(raw["v"].sum())
    assert xm.aggregate_metric_agg(docs, spec, "value_count") == 500
    assert xm.aggregate_metric_agg(docs, spec, "avg") == \
        pytest.approx(raw["v"].mean())


def test_aggregate_metric_missing_metric_raises(ray_session):
    import ray.data as rd

    raw = pd.DataFrame({"g": [1, 1, 2], "v": [1.0, 2.0, 3.0]})
    spec = xm.AggregateMetricSpec(("min", "max"), "max")
    docs = xm.build_aggregate_metric_docs(
        rd.from_pandas(raw), ["g"], "v", spec)
    with pytest.raises(ValueError, match="needs metric"):
        xm.aggregate_metric_agg(docs, spec, "sum")
    with pytest.raises(ValueError, match="needs metric"):
        xm.aggregate_metric_agg(docs, spec, "avg")


def test_aggregate_metric_range_uses_default_metric(metric_docs):
    raw, spec, docs = metric_docs
    # default metric is max: docs whose group max >= threshold survive
    got = xm.aggregate_metric_range_filter(docs, spec,
                                           gte=70.0).to_pandas()
    want = raw.groupby("g")["v"].max()
    assert sorted(got["g"]) == sorted(want[want >= 70.0].index)
