"""Cluster job entrypoint for the index build — the ``ray job submit`` form
the north rule specifies:

    ray job submit --working-dir . -- \
        python tools/build_index_job.py --corpus /data/pages --index /data/idx \
        [--files-per-partition 8] [--analyzer standard] [--no-positions] \
        [--resume] [--force-merge N] [--query "spark join merge"]

On a cluster the script attaches to the running Ray (RAY_ADDRESS is set by
the job server); standalone it starts a local session. The build is resumable:
re-submitting after a failure skips partitions with complete manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="directory of input parquet shards")
    ap.add_argument("--index", required=True, help="output index directory")
    ap.add_argument("--file-pattern", default="*.parquet")
    ap.add_argument("--files-per-partition", type=int, default=8)
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--similarity", default="BM25")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--from-html", action="store_true", help="extract text from html column")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing completed partitions (default: fresh build)")
    ap.add_argument("--force-merge", type=int, default=0, metavar="N",
                    help="force-merge down to N segments after the build")
    ap.add_argument("--query", default=None, help="optional smoke query after the build")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec

    if not args.resume:
        shutil.rmtree(args.index, ignore_errors=True)
    spec = IndexSpec(
        analyzer=args.analyzer,
        similarity=args.similarity,
        use_html=args.from_html,
        text_column=args.text_column,
        store_positions=not args.no_positions,
        files_per_partition=args.files_per_partition,
    )
    t0 = time.time()
    meta = build_index(args.corpus, args.index, spec, file_pattern=args.file_pattern)
    dt = time.time() - t0
    if args.force_merge:
        from elasticsearch_ray.index.merge import force_merge

        meta = force_merge(args.index, args.force_merge)
    out = {
        "n_docs": meta["n_docs"],
        "num_parts": meta["num_parts"],
        "build_sec": round(dt, 2),
        "docs_per_sec": round(meta["n_docs"] / dt, 1) if dt else None,
    }
    if args.query:
        from elasticsearch_ray.search.engine import QueryEngine

        eng = QueryEngine(args.index)
        hits = eng.search(args.query, k=5)
        out["query"] = args.query
        out["top_hits"] = hits.to_pylist()
    print(json.dumps(out, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
