"""Regression tests for round-1 advisor findings (ADVICE.md):
_intersect alignment, block-max bound under u16 tf saturation."""

import numpy as np

from elasticsearch_ray.index.postings import encode_postings, read_headers
from elasticsearch_ray.search.bm25 import BM25Scorer
from elasticsearch_ray.search.engine import _intersect
from elasticsearch_ray.search.topk import TermCursor


def test_intersect_b_aligned_scores_same_length():
    # len(a) == len(b) but different doc sets: the old length heuristic
    # mis-aligned b-side scores (returned [200, 300] instead of [100, 300]).
    a = np.array([0, 2, 4, 6], np.int64)
    b = np.array([2, 3, 4, 9], np.int64)
    sb = np.array([100.0, 200.0, 300.0, 900.0])
    docs, (out,) = _intersect(a, b, (), (sb,))
    assert docs.tolist() == [2, 4]
    assert out.tolist() == [100.0, 300.0]


def test_intersect_both_sides():
    a = np.array([0, 2, 4, 6], np.int64)
    b = np.array([2, 3, 4, 9], np.int64)
    sa = np.array([1.0, 2.0, 3.0, 4.0])
    sb = np.array([100.0, 200.0, 300.0, 900.0])
    docs, (oa, ob) = _intersect(a, b, (sa,), (sb,))
    assert docs.tolist() == [2, 4]
    assert oa.tolist() == [2.0, 3.0]
    assert ob.tolist() == [100.0, 300.0]


def test_intersect_empty_b():
    a = np.array([1, 2], np.int64)
    b = np.empty(0, np.int64)
    docs, (oa,) = _intersect(a, b, (np.array([1.0, 2.0]),))
    assert len(docs) == 0 and len(oa) == 0


def test_blockmax_bound_with_saturated_tf():
    # tf > 0xFFFF saturates the u16 header field; the bound must still
    # dominate the true score (falls back to the tf→∞ limit = weight).
    docs = np.array([5], np.int64)
    tfs = np.array([200_000], np.int64)
    norm_bytes = np.array([200], np.uint8)
    blob = encode_postings(docs, tfs, norm_bytes)
    h = read_headers(blob)
    assert int(h["max_tf"][0]) == 0xFFFF
    sc = BM25Scorer(df=1, doc_count=10, avgdl=100.0, dtype="float64")
    cur = TermCursor(blob, sc)
    bound = float(cur.block_max_scores()[0])
    _d, t = cur.decode_all()
    true_score = float(sc.score(t, norm_bytes)[0])
    assert bound >= true_score
    assert bound <= float(sc.weight) * (1 + 1e-12)


# ---- round-2 advisor findings ----

def test_range_on_unknown_field_is_parse_error():
    import pytest

    from elasticsearch_ray.search.dsl import DslError, parse_dsl

    cols = frozenset({"lang", "length"})
    assert parse_dsl({"range": {"length": {"gte": 10}}}, doc_columns=cols) is not None
    with pytest.raises(DslError):
        parse_dsl({"range": {"text": {"gte": "a"}}}, doc_columns=cols)
    with pytest.raises(DslError):
        parse_dsl({"range": {"nope": {"gte": 1}}}, doc_columns=cols)


# ---- round-4 advisor findings ----

import pytest


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    """Small built index wrapped in a QueryEngine (for mget/termvectors/
    _locate edge-case tests)."""
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf("/root/testdata/sf0.001", multiplier=1, num_files=2)
    idx = str(tmp_path_factory.mktemp("advidx") / "index")
    build_index(corpus, idx, IndexSpec(files_per_partition=1), concurrency=2)
    return QueryEngine(idx)

def test_expressions_power_right_associative():
    """'**' binds tighter than '*' and is right-associative (JS): the
    round-4 advisor caught 2**3**2 evaluating left-assoc to 64."""
    import numpy as np

    from elasticsearch_ray.search.expressions import compile_expression

    f = compile_expression("2 ** 3 ** 2")
    np.testing.assert_allclose(f({}), 512.0)
    f2 = compile_expression("2 * 3 ** 2")  # power over mul
    np.testing.assert_allclose(f2({}), 18.0)
    f3 = compile_expression("x ** 2", )
    np.testing.assert_allclose(f3({"x": np.array([3.0, 4.0])}), [9.0, 16.0])


def test_sayt_query_requires_field():
    import pytest

    from elasticsearch_ray.search.sayt import sayt_query

    with pytest.raises(ValueError, match="field"):
        sayt_query("", "spark jo")
    with pytest.raises(ValueError, match="field"):
        sayt_query(None, "spark jo")


def test_geoip_unmatched_ip_bounded_walk():
    """Nested CIDR table + an unmatched ip ABOVE many rows: the ancestor
    chain terminates immediately (parent of a top-level range is -1) and
    nested matches still resolve most-specific-first."""
    import pandas as pd

    from elasticsearch_ray.ops.processors import GeoIpProcessor

    table = (
        [(f"10.{i}.0.0/16", {"country_iso_code": f"C{i}"})
         for i in range(64)]
        + [("10.5.1.0/24", {"country_iso_code": "NEST"}),
           ("10.0.0.0/8", {"country_iso_code": "TOP"})]
    )
    p = GeoIpProcessor("ip", table, target_field="geo",
                       properties=("country_iso_code",))
    df = pd.DataFrame({"ip": [
        "10.5.1.9",     # /24 beats /16 beats /8
        "10.7.3.3",     # /16
        "10.99.0.1",    # only /8 covers
        "192.168.1.1",  # unmatched, ABOVE every 10.* row
        "9.0.0.1",      # unmatched, below the table
    ]})
    out = p(df.copy())
    assert out["geo.country_iso_code"].tolist() == [
        "NEST", "C7", "TOP", None, None]


def test_mget_unknown_ids_found_false(ray_session, built_index):
    """mget with out-of-range ids: per-doc found=false null rows in
    request order, never an Arrow IndexError (round-4 advisor)."""
    eng = built_index
    n = eng.n_docs
    t = eng.mget([1, n + 5, 0, -3], columns=("doc_id", "lang"))
    assert t["found"].to_pylist() == [True, False, True, False]
    assert t["doc_id"].to_pylist() == [1, n + 5, 0, -3]
    assert t["lang"][1].as_py() is None and t["lang"][3].as_py() is None
    assert t["lang"][0].as_py() is not None


def test_termvectors_unknown_id_found_false(ray_session, built_index):
    from elasticsearch_ray.search.termvectors import termvectors

    eng = built_index
    out = termvectors(eng, doc_id=eng.n_docs + 7)
    assert out == {"doc_id": eng.n_docs + 7, "found": False, "terms": {}}


def test_locate_out_of_range_raises(ray_session, built_index):
    import pytest

    eng = built_index
    with pytest.raises(ValueError, match="outside"):
        eng._locate(eng.n_docs)
    with pytest.raises(ValueError, match="outside"):
        eng._locate(-1)


def test_cumulative_cardinality_emits_all_seen_buckets(ray_session):
    """A bucket whose events are ALL previously-seen ids must still get a
    row carrying the running total (round-4 advisor: first-seen shape
    silently dropped it)."""
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.analytics import cumulative_cardinality

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-02",
                              "2024-01-02", "2024-01-04"]),
        "uid": [1, 2, 1, 2, 3],  # Jan-2: only repeat ids; Jan-3 absent
    })
    out = cumulative_cardinality(rd.from_pandas(df), "ts", "uid")
    assert out["bucket"].dt.strftime("%Y-%m-%d").tolist() == [
        "2024-01-01", "2024-01-02", "2024-01-04"]
    assert out["cumulative_cardinality"].tolist() == [2, 2, 3]
