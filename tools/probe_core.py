"""Single-core tokenize probe — the controlled number for this shared host.

Runs strip_html + the standard analyzer over a fixed slice of the bench
corpus in ONE process (no Ray, no shuffle): the result moves with the
HOST's state, not with this repo's code, so it is the reference point for
deciding whether a wall-clock swing is a regression or a slow host hour
(calm-window readings: ~9.2-10.4k docs/s/core; degraded hours: ~6.8k).

Usage: python tools/probe_core.py [n_procs]
With n_procs > 1, runs that many independent processes concurrently and
reports per-process + aggregate throughput (the host-capacity curve).
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 1500


def _corpus_file() -> str:
    import glob

    for pat in ("/tmp/esray_corpus/sf0.1-m*/pages-00000.parquet",
                "/tmp/esray_corpus/sf0.01-m*/pages-00000.parquet",
                "/tmp/esray_corpus/*/pages-00000.parquet"):
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    # no cached corpus yet: generate the smallest one
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    d = corpus_for_sf("/root/testdata/sf0.001", multiplier=1, num_files=1)
    return os.path.join(d, sorted(os.listdir(d))[-1])


def probe_once(n_docs: int = N_DOCS) -> float:
    """docs/s for one process, warm."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.analysis.analyzers import get_analyzer
    from elasticsearch_ray.analysis.html_strip import strip_html

    t = pq.read_table(_corpus_file(), columns=["html"])[:n_docs]
    htmls = [h if isinstance(h, str) else h.decode() for h in t["html"].to_pylist()]
    an = get_analyzer("standard")
    for h in htmls[:100]:
        an(strip_html(h))
    t0 = time.time()
    for h in htmls:
        an(strip_html(h))
    return len(htmls) / (time.time() - t0)


def _worker(q):
    q.put(probe_once())


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    _corpus_file()  # materialize the corpus ONCE in the parent: children
    # racing the generator (rmtree vs mid-write) under the same cache key
    # was a hang source
    if n <= 1:
        print(f"1 proc: {probe_once():.0f} docs/s/core")
        return
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(n)]
    for p in ps:
        p.start()
    rates = [q.get(timeout=120) for _ in ps]  # a dead child must not hang
    # the probe on the very degraded hosts it exists to diagnose
    for p in ps:
        p.join()
    print(f"{n} procs: per-proc {sum(rates) / n:.0f} docs/s, "
          f"aggregate {sum(rates):.0f} docs/s")


if __name__ == "__main__":
    main()
