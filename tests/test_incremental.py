"""Incremental ingestion: appending input files to a corpus and re-running
build_index only builds the new (and boundary-partial) partitions — the
append-only data-stream/rollover analog, falling out of partition-level
manifest resume + contiguous doc-id planning."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchQuery


def _write_file(src, name, words, n=40, base=0):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"id": range(base, base + n), "text": [words] * n}),
            preserve_index=False,
        ),
        src / name,
    )


def test_incremental_append(ray_session, tmp_path):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    src = tmp_path / "src"
    src.mkdir()
    for i, words in enumerate(["alpha beta", "beta gamma", "gamma delta", "delta alpha"]):
        _write_file(src, f"f-{i:02d}.parquet", words, base=i * 40)
    idx = str(tmp_path / "idx")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("id",),
                     files_per_partition=2)
    meta1 = build_index(str(src), idx, spec, concurrency=2)
    assert meta1["num_parts"] == 2 and meta1["n_docs"] == 160
    mtime0 = os.path.getmtime(os.path.join(idx, "parts", "part=00000", "postings.bin"))

    eng1 = QueryEngine(idx, dtype="float64")
    n_beta_1 = eng1.search(MatchQuery("beta"), k=1000).num_rows

    # append two files (sort AFTER the existing ones → stable planning)
    _write_file(src, f"f-04.parquet", "epsilon beta", base=160)
    _write_file(src, f"f-05.parquet", "zeta epsilon", base=200)
    meta2 = build_index(str(src), idx, spec, concurrency=2)
    assert meta2["num_parts"] == 3 and meta2["n_docs"] == 240

    # untouched partitions were NOT rebuilt
    assert os.path.getmtime(os.path.join(idx, "parts", "part=00000", "postings.bin")) == mtime0

    # fresh engine sees the union with updated global stats
    eng2 = QueryEngine(idx, dtype="float64")
    assert eng2.search(MatchQuery("beta"), k=1000).num_rows == n_beta_1 + 40
    assert eng2.search(MatchQuery("zeta"), k=1000).num_rows == 40
    assert eng2.n_docs == 240
    # global df for 'beta' must include the appended partition (dfs semantics)
    assert eng2._global_stats(["beta"])["beta"] == 120


def test_incremental_partial_boundary_partition(ray_session, tmp_path):
    """Appending into a partial trailing partition rebuilds ONLY it."""
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):  # fpp=2 → part0 full (2 files), part1 partial (1 file)
        _write_file(src, f"g-{i:02d}.parquet", f"word{i} shared", base=i * 40)
    idx = str(tmp_path / "idx")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("id",),
                     files_per_partition=2)
    build_index(str(src), idx, spec, concurrency=2)
    m0 = os.path.getmtime(os.path.join(idx, "parts", "part=00000", "postings.bin"))
    m1 = os.path.getmtime(os.path.join(idx, "parts", "part=00001", "postings.bin"))
    import hashlib as _hl

    h1 = _hl.md5(open(os.path.join(idx, "parts", "part=00001", "postings.bin"),
                      "rb").read()).hexdigest()

    _write_file(src, "g-03.parquet", "word3 shared", base=120)
    meta = build_index(str(src), idx, spec, concurrency=2)
    assert meta["num_parts"] == 2 and meta["n_docs"] == 160
    # part 0 untouched; part 1 (its file list grew) rebuilt — mtime can tie
    # on coarse-granularity filesystems, so the rebuild is proven by CONTENT
    assert os.path.getmtime(os.path.join(idx, "parts", "part=00000", "postings.bin")) == m0
    h1b = _hl.md5(open(os.path.join(idx, "parts", "part=00001", "postings.bin"),
                       "rb").read()).hexdigest()
    assert h1b != h1, "part 1 postings must change (new docs merged in)"
    eng = QueryEngine(idx, dtype="float64")
    assert eng.search(MatchQuery("shared"), k=1000).num_rows == 160
    assert eng.search(MatchQuery("word3"), k=1000).num_rows == 40
