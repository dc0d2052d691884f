"""Task management API (``server/src/main/java/org/elasticsearch/tasks/``
— TaskManager / ListTasksAction / CancellableTask).

The reference tracks every long-running action as a node-scoped task
(``node_id:task_id``) that can be listed (filtered by action glob) and
cancelled (cooperative: CancellableTask sets a flag the action polls).
Here the registry is a driver-side table — the natural home on Ray,
where the driver owns all long-running orchestration (async search,
reindex, forecasts, transforms) and per-batch workers are short-lived
Ray tasks that need no individual tracking.
"""

from __future__ import annotations

import fnmatch
import threading
import time


class TaskCancelledException(RuntimeError):
    pass


class _Task:
    __slots__ = ("task_id", "action", "description", "cancellable",
                 "start_time", "cancelled", "completed", "on_cancel")

    def __init__(self, task_id, action, description, cancellable,
                 on_cancel, now):
        self.task_id = task_id
        self.action = action
        self.description = description
        self.cancellable = cancellable
        self.start_time = now
        self.cancelled = False
        self.completed = False
        self.on_cancel = on_cancel

    def ensure_not_cancelled(self) -> None:
        """CancellableTask#ensureNotCancelled — actions poll this at
        batch boundaries (cooperative cancellation, like the
        reference)."""
        if self.cancelled:
            raise TaskCancelledException(
                f"task cancelled [by user request]")

    def info(self) -> dict:
        return {"task_id": self.task_id, "action": self.action,
                "description": self.description,
                "cancellable": self.cancellable,
                "cancelled": self.cancelled,
                "completed": self.completed,
                "start_time_in_millis": int(self.start_time * 1000),
                "running_time_in_nanos":
                    int((time.time() - self.start_time) * 1e9)}


class TaskManager:
    """node-scoped registry: register → task handle; _tasks list/get/
    cancel semantics (ListTasksAction: action globs, completed tasks
    drop out of the listing)."""

    def __init__(self, node_id: str = "node-0"):
        self.node_id = node_id
        self._seq = 0
        self._tasks: dict[str, _Task] = {}
        self._lock = threading.Lock()

    def register(self, action: str, description: str = "",
                 cancellable: bool = True, on_cancel=None) -> _Task:
        with self._lock:
            self._seq += 1
            tid = f"{self.node_id}:{self._seq}"
            t = _Task(tid, action, description, cancellable, on_cancel,
                      time.time())
            self._tasks[tid] = t
            return t

    def unregister(self, task) -> None:
        """Remove the task from the registry (the reference's TaskManager
        evicts on unregister — retaining every completed task would grow
        a long-lived driver unboundedly, review r5 #10). The handle the
        caller holds is marked completed."""
        with self._lock:
            t = self._tasks.pop(task.task_id, None)
            if t is not None:
                t.completed = True
        task.completed = True

    def list_tasks(self, actions: str | None = None,
                   include_completed: bool = False) -> list[dict]:
        with self._lock:
            out = []
            for t in self._tasks.values():
                if t.completed and not include_completed:
                    continue
                if actions and not any(
                        fnmatch.fnmatch(t.action, g)
                        for g in actions.split(",")):
                    continue
                out.append(t.info())
            # numeric id order ("node-0:10" must not sort before
            # "node-0:2", review r5 #10)
            return sorted(out, key=lambda d: (
                d["task_id"].rsplit(":", 1)[0],
                int(d["task_id"].rsplit(":", 1)[1])))

    def get_task(self, task_id: str) -> dict:
        with self._lock:
            t = self._tasks.get(task_id)
            if t is None:
                raise KeyError(
                    f"task [{task_id}] isn't running and hasn't stored "
                    f"its results")
            return t.info()

    def cancel(self, task_id: str, reason: str = "by user request") -> dict:
        with self._lock:
            t = self._tasks.get(task_id)
            if t is None:
                raise KeyError(f"task [{task_id}] is not found")
            if not t.cancellable:
                raise ValueError(
                    f"task [{task_id}] is not cancellable")
            t.cancelled = True
            cb = t.on_cancel
        if cb is not None:
            cb(reason)
        return t.info()
