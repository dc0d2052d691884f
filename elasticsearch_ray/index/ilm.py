"""Index lifecycle: rollover write alias (SURVEY beyond-§2 —
``x-pack/plugin/ilm``: ``RolloverAction.java`` / ``TransportRolloverAction``
conditions ``max_docs`` / ``max_age`` / ``max_size``, plus the delete-phase
retention step).

A :class:`RolloverAlias` owns a directory of GENERATION indexes
(``gen-000001``, ``gen-000002``, …) and an atomic ``alias.json`` naming
the current WRITE generation — the reference's write-alias swap. Writers
always target :meth:`current`; when a rollover condition trips, a fresh
generation directory is cut and the alias swaps atomically (manifest
rewrite via atomic replace), exactly the pattern of the reference where
``logs-000002`` is created and the alias moves in one cluster-state
update. Old generations are immutable from then on — the Lucene
"new documents become new segments/indexes" model this repo already uses
for incremental vparts.

Searching spans every completed generation through
:class:`MultiIndexEngine` (cross-index DFS-combined stats — results are
rank-identical to one merged index, the property its oracle pins), so a
rolled deployment serves reads exactly like an unrolled one.

Retention (`apply_retention`) is the delete-phase analog: drop the
oldest generations beyond ``keep_last`` (never the write generation).
"""

from __future__ import annotations

import json
import os
import shutil
import time

GEN_FMT = "gen-{:06d}"


class RolloverAlias:
    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self._alias_file = os.path.join(base_dir, "alias.json")
        if not os.path.exists(self._alias_file):
            self._write_state({"generation": 1,
                               "created": {"1": time.time()}})

    # -- state --
    def _state(self) -> dict:
        with open(self._alias_file) as f:
            return json.load(f)

    def _write_state(self, st: dict) -> None:
        tmp = self._alias_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f, sort_keys=True)
        os.replace(tmp, self._alias_file)

    # -- write side --
    def current(self) -> str:
        """Directory the write alias points at (created on demand)."""
        gen = self._state()["generation"]
        d = os.path.join(self.base, GEN_FMT.format(gen))
        os.makedirs(d, exist_ok=True)
        return d

    def generations(self) -> list[str]:
        """All generation dirs holding a COMPLETED index build, oldest
        first."""
        st = self._state()
        out = []
        for g in range(1, st["generation"] + 1):
            d = os.path.join(self.base, GEN_FMT.format(g))
            if os.path.exists(os.path.join(d, "index_meta.json")):
                out.append(d)
        return out

    def _gen_stats(self) -> tuple[int, float, int]:
        """(n_docs, age_seconds, size_bytes) of the write generation."""
        st = self._state()
        d = os.path.join(self.base, GEN_FMT.format(st["generation"]))
        meta = os.path.join(d, "index_meta.json")
        n_docs = 0
        if os.path.exists(meta):
            with open(meta) as f:
                n_docs = json.load(f).get("n_docs", 0)
        age = time.time() - st["created"][str(st["generation"])]
        size = 0
        for root, _dirs, files in os.walk(d):
            size += sum(os.path.getsize(os.path.join(root, f))
                        for f in files)
        return n_docs, age, size

    def rollover_if_needed(self, max_docs: int | None = None,
                           max_age_s: float | None = None,
                           max_size_bytes: int | None = None) -> bool:
        """RolloverAction conditions: trip when ANY given bound is met or
        exceeded (the reference ORs its conditions). Returns whether a
        rollover happened."""
        if max_docs is None and max_age_s is None and max_size_bytes is None:
            raise ValueError("rollover needs at least one condition")
        n_docs, age, size = self._gen_stats()
        if ((max_docs is not None and n_docs >= max_docs)
                or (max_age_s is not None and age >= max_age_s)
                or (max_size_bytes is not None and size >= max_size_bytes)):
            self.force_rollover()
            return True
        return False

    def force_rollover(self) -> str:
        """Cut the next generation and swap the write alias atomically."""
        st = self._state()
        st["generation"] += 1
        st["created"][str(st["generation"])] = time.time()
        self._write_state(st)
        return self.current()

    # -- read side --
    def engine(self, **engine_kwargs):
        """Search engine spanning every completed generation
        (DFS-combined stats — rank-identical to one merged index)."""
        from elasticsearch_ray.search.engine import QueryEngine
        from elasticsearch_ray.search.multi import MultiIndexEngine

        gens = self.generations()
        if not gens:
            raise ValueError(f"no completed generations under {self.base}")
        if len(gens) == 1:
            return QueryEngine(gens[0], **engine_kwargs)
        return MultiIndexEngine(gens, **engine_kwargs)

    # -- delete phase --
    def apply_retention(self, keep_last: int) -> list[str]:
        """Delete-phase analog: remove the oldest completed generations
        beyond ``keep_last`` (the write generation is always kept).
        Returns the removed dirs."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        gens = self.generations()
        write_gen = os.path.join(
            self.base, GEN_FMT.format(self._state()["generation"]))
        victims = [g for g in gens[:-keep_last] if g != write_gen] \
            if len(gens) > keep_last else []
        for v in victims:
            shutil.rmtree(v)
        return victims
