"""Fetch-phase (_source read) tests — FetchPhase / FetchSourcePhase analog."""

def test_fetch_source_rows_row_group_pushdown(tmp_path, monkeypatch):
    """_fetch_source_rows reads only the row groups covering the hit
    offsets (FetchPhase analog of Lucene's stored-field block access) and
    still reassembles rows in exact hit order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.search.engine import _fetch_source_rows

    path = str(tmp_path / "src.parquet")
    t = pa.table({"doc_id": list(range(1000)),
                  "text": [f"row {i}" for i in range(1000)]})
    pq.write_table(t, path, row_group_size=100)  # 10 row groups

    read_groups = []
    orig = pq.ParquetFile.read_row_groups

    def spy(self, groups, *a, **kw):
        read_groups.append(list(groups))
        return orig(self, groups, *a, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_groups", spy)
    manifest = {"input_path": path}
    hits = [955, 5, 101, 950]
    out = _fetch_source_rows(manifest, np.asarray(hits), columns=["doc_id", "text"])
    assert out["doc_id"].to_pylist() == hits
    assert out["text"].to_pylist() == [f"row {i}" for i in hits]
    assert read_groups == [[0, 1, 9]]  # 3 of 10 groups touched
