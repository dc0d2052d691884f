"""Cross-cluster search — remote cluster registry + index expressions.

Reference semantics: RemoteClusterService.groupClusterIndices (cluster:index
expressions, simpleMatch globs), TransportSearchAction cross-cluster DFS
(combined stats == merged index), SearchResponse.Clusters
total/successful/skipped with skip_unavailable.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.ccs import RemoteClusterRegistry


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index

    root = tmp_path_factory.mktemp("ccs")
    rng = np.random.RandomState(3)
    words = ["spark", "join", "merge", "sort", "scan", "index", "query"]
    dirs = []
    for i in range(2):
        corpus = str(root / f"corpus{i}")
        os.makedirs(corpus, exist_ok=True)
        n = 30
        t = pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([" ".join(rng.choice(words, 10))
                              for _ in range(n)]),
            "lang": pa.array(["en"] * n),
        })
        pq.write_table(t, f"{corpus}/docs.parquet")
        idx = str(root / f"idx{i}")
        build_index(corpus, idx,
                    IndexSpec(use_html=False, text_column="text",
                              doc_columns=("lang",)),
                    concurrency=2, file_pattern="docs.parquet")
        dirs.append(idx)
    return dirs


def _registry(dirs, euro_available=True, skip=False):
    reg = RemoteClusterRegistry()
    reg.register_local({"logs": dirs[0]})
    reg.register("europe", {"logs": dirs[1]}, skip_unavailable=skip,
                 available=euro_available)
    return reg


def test_resolution_and_labels(two_indexes):
    reg = _registry(two_indexes)
    resolved, clusters = reg.resolve("logs,europe:logs")
    assert [lbl for lbl, _ in resolved] == ["logs", "europe:logs"]
    assert clusters == {"total": 2, "successful": 2, "skipped": 0}
    # globs on both sides; duplicates collapse
    resolved2, _ = reg.resolve("log*,*:log*,europe:logs")
    assert [lbl for lbl, _ in resolved2] == ["logs", "europe:logs"]
    with pytest.raises(ValueError, match="no such remote cluster"):
        reg.resolve("asia:logs")
    with pytest.raises(ValueError, match="no such index"):
        reg.resolve("europe:nope")
    assert reg.resolve("europe:nope*")[0] == []  # wildcard miss is fine


def test_ccs_search_equals_multi_index(two_indexes):
    from elasticsearch_ray.search.multi import MultiIndexEngine

    reg = _registry(two_indexes)
    got, clusters = reg.search("logs,europe:logs", "spark join", k=20)
    assert clusters["successful"] == 2
    want = MultiIndexEngine(list(two_indexes), dtype="float64").search(
        "spark join", k=20, fetch=("doc_id",))
    assert got["score"].to_pylist() == want["score"].to_pylist()
    labels = set(got["_index"].to_pylist())
    assert labels == {"logs", "europe:logs"}
    # label maps to the right sub-index ordinal
    ords = want["_index"].to_numpy()
    assert [("europe:logs" if o else "logs") for o in ords] == \
        got["_index"].to_pylist()


def test_skip_unavailable(two_indexes):
    reg = _registry(two_indexes, euro_available=False, skip=True)
    got, clusters = reg.search("logs,europe:logs", "spark", k=10)
    assert clusters == {"total": 2, "successful": 1, "skipped": 1}
    assert set(got["_index"].to_pylist()) == {"logs"}
    reg2 = _registry(two_indexes, euro_available=False, skip=False)
    with pytest.raises(ValueError, match="not available"):
        reg2.search("logs,europe:logs", "spark", k=10)


def test_indices_boost(two_indexes):
    """indices_boost scales each index's scores before the merge
    (DefaultSearchContext queryBoost); first matching pattern wins."""
    import numpy as np

    reg = _registry(two_indexes)
    plain, _ = reg.search("logs,europe:logs", "spark join", k=60)
    boosted, _ = reg.search("logs,europe:logs", "spark join", k=60,
                            indices_boost=[("europe:*", 2.0),
                                           ("europe:logs", 9.0)])
    pd_p = plain.to_pandas().set_index(["_index", "part", "local"])
    pd_b = boosted.to_pandas().set_index(["_index", "part", "local"])
    joined = pd_p.join(pd_b, rsuffix="_b")
    local = joined.index.get_level_values(0) == "logs"
    assert np.allclose(joined.loc[local, "score_b"],
                       joined.loc[local, "score"])
    # first pattern (2.0) wins over the later exact 9.0
    assert np.allclose(joined.loc[~local, "score_b"],
                       joined.loc[~local, "score"] * 2.0)
    # merged order is by BOOSTED score
    s = boosted["score"].to_numpy()
    assert (np.diff(s) <= 1e-12).all()


def test_all_skipped_returns_typed_empty(two_indexes):
    """review r5 #10: when every targeted cluster is skipped the result
    is a TYPED empty table — standard column selection cannot KeyError."""
    reg = RemoteClusterRegistry()
    reg.register("europe", {"logs": two_indexes[1]},
                 skip_unavailable=True, available=False)
    got, clusters = reg.search("europe:logs", "spark", k=5,
                               fetch=("doc_id",))
    assert clusters == {"total": 1, "successful": 0, "skipped": 1}
    df = got.to_pandas()[["doc_id", "score"]]
    assert len(df) == 0
