"""Reindex — the reference's scroll-read → transform → bulk-write ETL loop
(``modules/reindex/.../Reindexer.java:69,97``,
``AbstractAsyncBulkByScrollAction.java:333-384``), Ray-Data-shaped:

  read per input shard → ingest-processor Pipeline (one map_batches) →
  partitioned parquet sink, one output file per input shard written
  atomically + a manifest — so a failed run resumes by skipping finished
  shards (the slice-parallelism of BulkByScrollParallelizationHelper is
  native here: one task per shard)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from elasticsearch_ray.ops.processors import Pipeline
from elasticsearch_ray.sources.webpages import plan_shards


def reindex(
    src_dir: str,
    dst_dir: str,
    processors: list | None = None,
    file_pattern: str = "*.parquet",
    columns: list[str] | None = None,
) -> dict:
    """Returns {'shards': n, 'skipped': n_resumed, 'rows': total}."""
    os.makedirs(dst_dir, exist_ok=True)
    shards = plan_shards(src_dir, file_pattern)
    pipe = Pipeline(processors or [])

    todo = []
    skipped = 0
    for s in shards:
        mpath = os.path.join(dst_dir, f"part-{s['part']:05d}.manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                if json.load(f).get("input_rows") == s["rows"]:
                    skipped += 1
                    continue
        todo.append(s)

    def one_shard(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            tbl = pq.read_table(row["path"], columns=columns)
            df = pipe(tbl.to_pandas())
            out_path = os.path.join(dst_dir, f"part-{row['part']:05d}.parquet")
            tmp = out_path + ".tmp"
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
            os.replace(tmp, out_path)
            man = {"input_path": row["path"], "input_rows": row["rows"], "output_rows": len(df)}
            with open(out_path.replace(".parquet", ".manifest.json"), "w") as f:
                json.dump(man, f)
            outs.append({"part": row["part"], "rows": len(df)})
        return pa.Table.from_pylist(outs)

    rows = 0
    if todo:
        res = (
            rd.from_items(todo, override_num_blocks=len(todo))
            .map_batches(one_shard, batch_size=1, batch_format="pyarrow", num_cpus=1)
            .take_all()
        )
        rows = sum(r["rows"] for r in res)
    return {"shards": len(shards), "skipped": skipped, "rows": rows}


def reindex_query(engine, dst_dir: str, q, processors: list | None = None,
                  source_columns: tuple = ("text", "lang"),
                  fetch: tuple = ("doc_id",)) -> int:
    """Query-filtered reindex (``Reindexer.java`` source-with-query +
    ``remote.query`` surface): the distributed sliced scroll
    (``engine.scan_dataset``) heads the pipeline, ingest processors run per
    batch, and the partitioned parquet sink streams — index → query →
    transform → sink without any driver materialization. Returns rows
    written."""
    pipe = Pipeline(processors or [])
    ds = engine.scan_dataset(q, fetch=fetch, source_columns=source_columns)

    def xf(df):
        return pipe(df)

    ds = ds.map_batches(xf, batch_format="pandas")
    # fresh sink: write_parquet emits uuid-named files, so stale output from
    # a previous run would otherwise mix into (and inflate) the result
    import shutil

    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir, exist_ok=True)
    ds.write_parquet(dst_dir)
    import glob

    return sum(pq.read_metadata(p).num_rows
               for p in glob.glob(os.path.join(dst_dir, "*.parquet")))
