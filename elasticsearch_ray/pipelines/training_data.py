"""End-to-end training-data pipeline composition — the 100 TB shape:

  raw web pages → html_strip → quality filter → exact dedup → inverted index
  → BM25 search

All stages stream as one Ray Data flow up to the dedup groupby; the kept-id
set is broadcast for the filter (semi-join pattern); the index build then
consumes the cleaned corpus. Demonstrates that the engine's pieces compose
without driver-side materialization of the big path."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from elasticsearch_ray.analysis.html_strip import HtmlStripBatch
from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.ops.dedup import add_content_hash
from elasticsearch_ray.ops.textstats import TextQuality
from elasticsearch_ray.search.engine import QueryEngine
from elasticsearch_ray.sources.webpages import corpus_files


def training_data_pipeline(
    corpus_dir: str,
    work_dir: str,
    min_tokens: int = 20,
    max_stopword_ratio: float = 0.9,
    min_unique_ratio: float = 0.1,
) -> dict:
    """Returns {'input_pages', 'after_quality', 'after_dedup', 'engine'}."""
    os.makedirs(work_dir, exist_ok=True)
    files = corpus_files(corpus_dir, "pages-*.parquet")
    ds = rd.read_parquet(files, columns=["url", "warc_ts", "html", "lang"])
    n_input = ds.count()

    # html_strip + quality features in one streaming pass
    def strip_and_score(batch: pa.Table) -> pa.Table:
        batch = HtmlStripBatch(src="html", dst="text")(batch)
        q = TextQuality(text_col="text", id_col="url")(batch)
        batch = batch.append_column("n_tokens", q["n_tokens"])
        batch = batch.append_column("stopword_ratio", q["stopword_ratio"])
        batch = batch.append_column("unique_ratio", q["unique_ratio"])
        return batch

    scored = ds.map_batches(strip_and_score, batch_format="pyarrow")

    def quality_filter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch["n_tokens"], min_tokens),
                pc.less_equal(batch["stopword_ratio"], max_stopword_ratio),
            ),
            pc.greater_equal(batch["unique_ratio"], min_unique_ratio),
        )
        return batch.filter(keep)

    clean = scored.map_batches(quality_filter, batch_format="pyarrow")

    # exact dedup: min-url per content hash → broadcast keep-set semi-join
    hashed = add_content_hash(clean, ["text"])
    from ray.data.aggregate import Min

    kept = (
        hashed.select_columns(["content_hash", "url"])
        .groupby("content_hash")
        .aggregate(Min("url", alias_name="url"))
        .to_pandas()
    )
    keep_ref = ray.put(frozenset(kept["url"]))

    def keep_only(batch: pa.Table) -> pa.Table:
        keep_set = ray.get(keep_ref)
        mask = pa.array([u in keep_set for u in batch["url"].to_pylist()], pa.bool_())
        return batch.filter(mask)

    deduped = clean.map_batches(keep_only, batch_format="pyarrow")

    # write the cleaned corpus partitioned, then index it
    clean_dir = os.path.join(work_dir, "clean")
    shutil.rmtree(clean_dir, ignore_errors=True)
    deduped.select_columns(["url", "warc_ts", "text", "lang"]).write_parquet(clean_dir)

    idx_dir = os.path.join(work_dir, "index")
    shutil.rmtree(idx_dir, ignore_errors=True)
    meta = build_index(
        clean_dir,
        idx_dir,
        IndexSpec(use_html=False, text_column="text", doc_columns=("url", "warc_ts", "lang")),
    )
    return {
        "input_pages": int(n_input),
        "after_quality": int(clean.count()),
        "after_dedup": int(meta["n_docs"]),
        "index_dir": idx_dir,
        "engine": QueryEngine(idx_dir, dtype="float64"),
    }
