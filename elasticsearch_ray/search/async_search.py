"""Async search API (x-pack async-search:
``AsyncSearchTask.java``, ``MutableSearchResponse.java``,
``TransportSubmitAsyncSearchAction.java`` / Get / Status / Delete).

``submit`` starts the query and returns within
``wait_for_completion_timeout`` — with the complete response when the
search beat the timeout, else a PARTIAL response (``is_partial=True``,
``is_running=True``) plus an id; ``get`` retrieves the current state
(optionally waiting again), ``status`` returns progress counters only,
``delete`` cancels/forgets. Responses expire ``keep_alive`` seconds
after submit unless refreshed by ``get(..., keep_alive=...)``.

Execution model: partitions play the reference's shards. A background
thread walks them, merging each partition's top-k into a mutable
response under a lock (MutableSearchResponse.updatePartialResponse);
readers snapshot it without blocking the runner. Partial hits are the
best-k over COMPLETED partitions with the usual (score desc, part, doc)
merge order, so a partial response is always a correct prefix view of
the partitions it covers.
"""

from __future__ import annotations

import itertools
import threading
import time

import numpy as np
import pyarrow as pa


class AsyncSearchError(KeyError):
    pass


class _Task:
    def __init__(self, total_shards: int, keep_alive: float):
        self.lock = threading.Lock()
        self.done = threading.Event()
        self.total_shards = total_shards
        self.completed = 0
        self.results = []  # (part, docs, scores)
        self.error: Exception | None = None
        self.cancelled = False
        self.start_time = time.time()
        self.expiration_time = self.start_time + keep_alive


class AsyncSearchService:
    """One service per QueryEngine (the engine's partitions are the
    shard set)."""

    def __init__(self, engine):
        self.engine = engine
        self._tasks: dict[str, _Task] = {}
        self._ids = itertools.count(1)

    # ------------------------------------------------------------ API

    def submit(self, q, k: int = 10, mode: str = "bmw",
               fetch: tuple = ("doc_id",),
               wait_for_completion_timeout: float = 1.0,
               keep_alive: float = 300.0,
               _between_parts=None) -> dict:
        """Start an async search; ``_between_parts`` is a test hook
        called after every completed partition."""
        from elasticsearch_ray.search.query import MatchQuery

        eng = self.engine
        if isinstance(q, str):
            q = MatchQuery(q)
        q_resolved = eng._apply_field_analyzers(eng._rewrite(q))
        # reap expired entries (the reference's maintenance service) so a
        # fire-and-forget caller can't grow the store unboundedly
        now = time.time()
        for tid in [t for t, tk in self._tasks.items()
                    if now > tk.expiration_time]:
            self._tasks[tid].cancelled = True
            del self._tasks[tid]
        task_id = f"async_{next(self._ids)}"
        task = _Task(len(eng.parts), keep_alive)
        self._tasks[task_id] = task

        def run():
            try:
                scorers, _ = eng._scorers_cached(q_resolved)
                for p in eng.parts:
                    if task.cancelled:
                        return
                    d, s = _part_topk(eng, p, q_resolved, scorers, k,
                                      mode)
                    with task.lock:
                        task.results.append((p, d, s))
                        task.completed += 1
                    if _between_parts is not None:
                        _between_parts(p)
            except Exception as e:  # surfaced via get(), like the ref
                task.error = e
            finally:
                task.done.set()

        threading.Thread(target=run, daemon=True).start()
        task.done.wait(wait_for_completion_timeout)
        return self._response(task_id, task, k, fetch)

    def get(self, task_id: str, k: int = 10, fetch: tuple = ("doc_id",),
            wait_for_completion_timeout: float = 0.0,
            keep_alive: float | None = None) -> dict:
        task = self._lookup(task_id)
        if keep_alive is not None:
            task.expiration_time = time.time() + keep_alive
        if wait_for_completion_timeout:
            task.done.wait(wait_for_completion_timeout)
        return self._response(task_id, task, k, fetch)

    def status(self, task_id: str) -> dict:
        task = self._lookup(task_id)
        running = not task.done.is_set()
        with task.lock:
            completed = task.completed
        return {"id": task_id, "is_running": running,
                "is_partial": running or task.error is not None,
                "start_time": task.start_time,
                "expiration_time": task.expiration_time,
                "total_shards": task.total_shards,
                "successful_shards": completed}

    def delete(self, task_id: str) -> None:
        task = self._lookup(task_id)
        task.cancelled = True
        del self._tasks[task_id]

    # ------------------------------------------------------- internals

    def _lookup(self, task_id: str) -> _Task:
        task = self._tasks.get(task_id)
        if task is None:
            raise AsyncSearchError(f"unknown async search id {task_id!r}")
        if time.time() > task.expiration_time:
            del self._tasks[task_id]
            raise AsyncSearchError(f"async search {task_id!r} expired")
        return task

    def _response(self, task_id: str, task: _Task, k: int,
                  fetch: tuple) -> dict:
        if task.error is not None:
            raise task.error
        running = not task.done.is_set()
        with task.lock:
            results = list(task.results)
            completed = task.completed
        tbl = _merge_topk(self.engine, results, k, fetch)
        return {"id": task_id, "is_running": running,
                "is_partial": running,
                "start_time": task.start_time,
                "expiration_time": task.expiration_time,
                "response": {"total_shards": task.total_shards,
                             "successful_shards": completed,
                             "hits": tbl}}


def _part_topk(eng, p, q, scorers, k, mode):
    return eng._searcher(p).topk(q, scorers, k, mode, None, p)


def _merge_topk(eng, results, k, fetch) -> pa.Table:
    parts_l, docs_l, scores_l = [], [], []
    for p, d, s in results:
        parts_l.append(np.full(len(d), p, dtype=np.int64))
        docs_l.append(np.asarray(d, np.int64))
        scores_l.append(np.asarray(s, np.float64))
    if not docs_l or sum(map(len, docs_l)) == 0:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "part": pa.array([], pa.int64()),
                         "local": pa.array([], pa.int64())})
    parts_a = np.concatenate(parts_l)
    docs_a = np.concatenate(docs_l)
    scores_a = np.concatenate(scores_l)
    order = np.lexsort((docs_a, parts_a, -scores_a))[:k]
    parts_a, docs_a, scores_a = parts_a[order], docs_a[order], scores_a[order]
    tbl = pa.table({"rank": pa.array(np.arange(1, len(order) + 1)),
                    "score": pa.array(scores_a),
                    "part": pa.array(parts_a),
                    "local": pa.array(docs_a)})
    return eng._attach_fetch(tbl, parts_a, docs_a, fetch)
