"""Regression tests for the round-5 code-review findings."""

import os

import numpy as np
import pandas as pd
import pytest


def test_r5_1_int8_rescore_bit_equals_brute_f64(ray_session, tmp_path):
    """int8 full-oversample must be BIT-equal to brute (f64 rescore store,
    not the f32 graph memmap)."""
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_ray.index.vectors import (
        VectorIndexReader,
        build_vector_index,
        vpart_dir,
    )

    rng = np.random.default_rng(2)
    n, d = 500, 24
    vecs = rng.normal(size=(n, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs))}))
    idx = str(tmp_path / "vq")
    build_vector_index(ds, idx, num_partitions=2, quantize=True)
    assert os.path.exists(os.path.join(vpart_dir(idx, 0), "vnorm64.npy"))
    r = VectorIndexReader(idx)
    a = r.topk([0, 1], vecs[:2], k=7, brute=True)
    b = r.topk([0, 1], vecs[:2], k=7, int8=True, int8_oversample=n)
    # UNROUNDED bit equality of the cosine columns
    assert a["cosine"].tolist() == b["cosine"].tolist()
    assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()


def test_r5_2_rollup_value_count_skips_nulls(ray_session, tmp_path):
    import ray.data as rd

    from elasticsearch_ray.pipelines.rollup import (
        rollup_search,
        run_rollup_job,
    )

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 03:00", "2024-01-01 07:00",
                              "2024-01-01 09:00"]).astype("datetime64[us]"),
        "kind": ["a", "a", "a"],
        "value": [10.0, None, 30.0],
    })
    dest = str(tmp_path / "ro")
    run_rollup_job(rd.from_pandas(df), dest, ts_field="ts",
                   interval="hour", terms=["kind"],
                   metrics={"value": ["avg"]})
    out = rollup_search(dest, "day", metrics={"value": ["avg"]})
    # ES avg = sum / non-null count = 40/2 = 20, NOT 40/3
    assert out["value.avg"].iloc[0] == pytest.approx(20.0)


def test_r5_3_rebuild_removes_manifest_before_rewrite(ray_session,
                                                      tmp_path,
                                                      monkeypatch):
    """Rewriting a previously-complete vpart must drop the old manifest
    FIRST (crash mid-rewrite must not pair old manifest + new files)."""
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_ray.index import vectors as V

    n = 40
    rng = np.random.default_rng(1)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(rng.normal(size=(n, 8))))}))
    idx = str(tmp_path / "v")
    V.build_vector_index(ds, idx, num_partitions=1)
    man = os.path.join(V.vpart_dir(idx, 0), "manifest.json")
    assert os.path.exists(man)
    # crash injection: building the graph (first data step) must already
    # see the manifest gone
    seen = {}
    orig = V.HNSWGraph

    class Boom(Exception):
        pass

    def spy(*a, **kw):
        seen["manifest_exists"] = os.path.exists(man)
        raise Boom()

    monkeypatch.setattr(V, "HNSWGraph", spy)
    g = pd.DataFrame({
        "_vpart": [0] * n,
        "vec_id": np.arange(n),
        "embedding": list(rng.normal(size=(n, 8)))})
    with pytest.raises(Boom):
        V._build_vpart(g, idx, "vec_id", "embedding", 16, 100, {})
    assert seen["manifest_exists"] is False
    monkeypatch.setattr(V, "HNSWGraph", orig)


def test_r5_4_unary_minus_power_precedence():
    from elasticsearch_ray.search.expressions import compile_expression

    assert compile_expression("-2**2")({})[0] == -4.0
    assert compile_expression("2**-2")({})[0] == 0.25
    assert compile_expression("(-2)**2")({})[0] == 4.0
    assert compile_expression("2**3**2")({})[0] == 512.0


def test_r5_5_runtime_field_cycle_and_shadowing(ray_session,
                                                tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import (
        BoolQuery,
        MatchAllQuery,
        RangeFilter,
    )

    base = tmp_path_factory.mktemp("rtc")
    corpus = str(base / "c")
    os.makedirs(corpus)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"word{i}" for i in range(20)]),
        "n": pa.array(range(20), pa.int64())}),
        os.path.join(corpus, "docs.parquet"))
    idx = str(base / "i")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text",
                                       doc_columns=("n",),
                                       files_per_partition=1),
                concurrency=1, file_pattern="docs.parquet")
    # mutual recursion → clear error, not RecursionError
    eng = QueryEngine(idx, runtime_fields={"a": "b + 1", "b": "a + 1"})
    with pytest.raises(ValueError, match="cycle"):
        eng.count(BoolQuery(must=(MatchAllQuery(),),
                            filter=(RangeFilter("a", gte=0),)))
    # shadowing a stored column resolves the self-name to STORED data
    eng2 = QueryEngine(idx, runtime_fields={"n": "n * 2"})
    got = eng2.count(BoolQuery(must=(MatchAllQuery(),),
                               filter=(RangeFilter("n", gte=20),)))
    assert got == 10  # 2*n >= 20 → n >= 10 → docs 10..19


def test_r5_6_esql_in_list_exponent_literal(ray_session):
    import ray.data as rd

    from elasticsearch_ray.search.esql import esql

    ds = rd.from_pandas(pd.DataFrame({"x": [10.0, 1000.0, 5.0]}))
    out = esql("FROM t | WHERE x IN (1e3, 5)", {"t": ds}).to_pandas()
    assert sorted(out["x"]) == [5.0, 1000.0]


def test_r5_7_eql_zero_candidates_typed_empty(ray_session):
    import ray.data as rd

    from elasticsearch_ray.search.eql import eql_sequence

    df = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [1, 1],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        "event_type": ["zzz", "zzz"],
    })
    out = eql_sequence(rd.from_pandas(df), by="user_id", ts_col="ts",
                       stages=[{"event_type": "view"},
                               {"event_type": "purchase"}], mode="asof")
    assert len(out) == 0
    # the documented consumer projection must not KeyError
    assert len(out[["user_id", "ts_0", "ts_1", "id_0", "id_1"]]) == 0


def test_r5_8_reader_filter_generator_not_swallowed(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_ray.index.vectors import (
        VectorIndexReader,
        build_vector_index,
    )

    rng = np.random.default_rng(9)
    n = 60
    vecs = rng.normal(size=(n, 8))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
        "bucket": pa.array((np.arange(n) % 2).astype(np.int64))}))
    idx = str(tmp_path / "vg")
    build_vector_index(ds, idx, num_partitions=1,
                       metadata_cols=["bucket"])
    r = VectorIndexReader(idx)
    pairs = [("bucket", 1)]
    a = r.topk([0], vecs[:1], k=5, brute=True, flt=pairs)
    b = r.topk([0], vecs[:1], k=5, brute=True,
               flt=(p for p in pairs))  # generator input
    pd.testing.assert_frame_equal(a, b)
    assert set(a.neighbor_id % 2) == {1}
