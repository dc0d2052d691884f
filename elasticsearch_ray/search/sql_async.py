"""Async SQL (``x-pack/plugin/sql`` async support — ``sql.query`` with
``wait_for_completion_timeout`` / ``keep_alive``, plus
``sql.get_async`` / ``sql.get_async_status`` / ``sql.delete_async``).

The reference stores an in-flight SQL search as an async task in the
``.async-search`` index keyed by an opaque id; callers poll with get /
status and results expire after ``keep_alive``. Same model here: the
statement compiles through :func:`search.sql.sql_query` on a worker
thread, the response is held until its expiry, and a get with
``wait_for_completion_timeout`` blocks up to that long before returning
``is_running`` state (``SqlQueryResponse`` columns/rows shape)."""

from __future__ import annotations

import threading
import time


class SqlAsyncService:
    def __init__(self, tables, enrich_policies: dict | None = None):
        self.tables = tables
        self.enrich = enrich_policies
        self._tasks: dict[str, dict] = {}
        self._n = 0

    def submit(self, sql: str, keep_alive: float = 300.0,
               wait_for_completion_timeout: float = 0.0) -> dict:
        from elasticsearch_ray.search.sql import sql_query

        self._n += 1
        task_id = f"sql-async-{self._n}"
        task = {"id": task_id, "done": threading.Event(),
                "result": None, "error": None,
                "expires_unix": time.monotonic() + keep_alive,
                "keep_alive": keep_alive, "start": time.monotonic()}
        self._tasks[task_id] = task

        def run():
            try:
                task["result"] = sql_query(sql, self.tables,
                                           self.enrich)
            except Exception as e:  # surfaced on get, like the API
                task["error"] = e
            finally:
                task["done"].set()

        threading.Thread(target=run, daemon=True).start()
        if wait_for_completion_timeout:
            task["done"].wait(wait_for_completion_timeout)
        return self._response(task)

    def get_async(self, task_id: str,
                  wait_for_completion_timeout: float = 0.0,
                  keep_alive: float | None = None) -> dict:
        task = self._lookup(task_id)
        if keep_alive is not None:
            task["expires_unix"] = time.monotonic() + keep_alive
        if wait_for_completion_timeout:
            task["done"].wait(wait_for_completion_timeout)
        return self._response(task)

    def get_async_status(self, task_id: str) -> dict:
        task = self._lookup(task_id)
        running = not task["done"].is_set()
        return {"id": task_id, "is_running": running,
                "is_partial": running,
                "completion_status": None if running
                else (500 if task["error"] else 200)}

    def delete_async(self, task_id: str) -> None:
        self._lookup(task_id)
        del self._tasks[task_id]

    def _lookup(self, task_id: str) -> dict:
        task = self._tasks.get(task_id)
        if task is None or time.monotonic() >= task["expires_unix"]:
            self._tasks.pop(task_id, None)
            raise KeyError(f"async sql task [{task_id}] not found "
                           f"(missing or expired)")
        return task

    def _response(self, task: dict) -> dict:
        running = not task["done"].is_set()
        out = {"id": task["id"], "is_running": running,
               "is_partial": running, "columns": None, "rows": None}
        if not running:
            if task["error"] is not None:
                raise task["error"]
            df = task["result"]
            if not hasattr(df, "values"):  # Dataset / pyarrow.Table
                df = df.to_pandas()
            out["columns"] = [{"name": c, "type": str(df[c].dtype)}
                              for c in df.columns]
            out["rows"] = df.values.tolist()
        return out
