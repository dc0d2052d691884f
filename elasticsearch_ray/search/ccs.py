"""Cross-cluster search (CCS) — remote-cluster index expressions.

Reference semantics: ``server/src/main/java/org/elasticsearch/transport/
RemoteClusterService.java`` + ``action/search/TransportSearchAction.java`` —
index expressions are comma-separated, a ``cluster:index`` item routes to a
registered remote cluster (``groupClusterIndices``; a bare item is local),
``*`` globs match both cluster aliases and index names
(``Regex.simpleMatch``), ``skip_unavailable`` clusters are silently skipped
(recorded in the response's ``_clusters`` section: total/successful/skipped),
and a non-skippable miss fails the whole search (``NoSuchRemoteClusterException``).
Scoring: with minimized roundtrips disabled the coordinating node runs a
cross-cluster DFS phase so every cluster scores with combined statistics —
exactly :class:`~elasticsearch_ray.search.multi.MultiIndexEngine`'s model,
which this module composes (one engine over every resolved index, combined
df/N/avgdl, merged top-k).

Ray-Data shape: a "cluster" here is a named group of built index
directories (each its own partitioned artifact set); resolution is pure
metadata, and the search itself is the ordinary distributed multi-index
path. Resolved engine groups are cached by their directory tuple so
repeated CCS queries reuse warm partition caches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_ray.search.multi import MultiIndexEngine
from elasticsearch_ray.search.security import _glob_match as _simple_match

_LOCAL = ""  # alias of the local "cluster"


class RemoteClusterRegistry:
    """RemoteClusterService analog: alias → {index_name: index_dir} plus the
    per-cluster ``skip_unavailable`` setting. The local cluster is the
    unaliased group."""

    def __init__(self):
        self._clusters: dict[str, dict[str, str]] = {_LOCAL: {}}
        self._skip: dict[str, bool] = {}
        self._engines: dict[tuple, MultiIndexEngine] = {}

    def register(self, alias: str, indices: dict[str, str],
                 skip_unavailable: bool = False,
                 available: bool = True) -> None:
        if ":" in alias:
            raise ValueError("cluster alias must not contain ':'")
        self._clusters[alias] = dict(indices)
        self._skip[alias] = bool(skip_unavailable)
        self._available = getattr(self, "_available", {})
        self._available[alias] = bool(available)

    def register_local(self, indices: dict[str, str]) -> None:
        self._clusters[_LOCAL].update(indices)

    # -- resolution (groupClusterIndices) --

    def resolve(self, expression: str) -> tuple[list[tuple[str, str]], dict]:
        """Expand an index expression into [(label, index_dir)] plus the
        ``_clusters`` response section. Label is ``alias:index`` for remote
        hits, bare ``index`` locally."""
        resolved: list[tuple[str, str]] = []
        skipped_clusters: set[str] = set()
        seen_clusters: set[str] = set()
        avail = getattr(self, "_available", {})
        for item in filter(None, (p.strip() for p in expression.split(","))):
            if ":" in item:
                cpat, ipat = item.split(":", 1)
                aliases = [a for a in self._clusters
                           if a != _LOCAL and _simple_match(cpat, a)]
                if not aliases and "*" not in cpat:
                    raise ValueError(f"no such remote cluster: [{cpat}]")
            else:
                aliases, ipat = [_LOCAL], item
            for a in aliases:
                seen_clusters.add(a)
                if a != _LOCAL and not avail.get(a, True):
                    # unreachable remote: skip_unavailable decides
                    # (RemoteClusterAware / SearchResponse.Clusters)
                    if self._skip.get(a, False):
                        skipped_clusters.add(a)
                        continue
                    raise ValueError(
                        f"remote cluster [{a}] is not available")
                idxs = {n: d for n, d in self._clusters[a].items()
                        if _simple_match(ipat, n)}
                if not idxs and "*" not in ipat:
                    raise ValueError(
                        f"no such index [{ipat}] in cluster "
                        f"[{a or '(local)'}]")
                for n, d in sorted(idxs.items()):
                    label = f"{a}:{n}" if a else n
                    if all(lbl != label for lbl, _ in resolved):
                        resolved.append((label, d))
        total = len(seen_clusters)
        skipped = len(skipped_clusters)
        return resolved, {"total": total, "successful": total - skipped,
                          "skipped": skipped}

    # -- search --

    def _engine(self, dirs: tuple[str, ...]) -> MultiIndexEngine:
        eng = self._engines.get(dirs)
        if eng is None:
            eng = self._engines[dirs] = MultiIndexEngine(
                list(dirs), dtype="float64")
        return eng

    def search(self, expression: str, q, k: int = 10,
               fetch: tuple = ("doc_id",),
               indices_boost: list | dict | None = None
               ) -> tuple[pa.Table, dict]:
        """CCS top-k: resolve → one DFS-combined multi-index search →
        ``_index`` ordinals relabeled to ``cluster:index`` strings.

        ``indices_boost`` — [(pattern, boost), ...] (or a dict) matched
        against resolved labels; FIRST matching pattern wins per index
        (SearchSourceBuilder indices_boost array semantics), default 1.0."""
        resolved, clusters = self.resolve(expression)
        if not resolved:
            # typed-empty result (every cluster skipped): callers select
            # (rank, score, fetch...) columns without KeyError
            empty = {"rank": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64()),
                     "part": pa.array([], pa.int64()),
                     "local": pa.array([], pa.int64()),
                     "_index": pa.array([], pa.string())}
            for c in fetch:
                empty.setdefault(c, pa.nulls(0))
            return pa.table(empty), clusters
        labels = [lbl for lbl, _ in resolved]
        boosts = None
        if indices_boost:
            items = list(indices_boost.items()) \
                if isinstance(indices_boost, dict) else list(indices_boost)
            boosts = [next((float(b) for p, b in items
                            if _simple_match(p, lbl)), 1.0)
                      for lbl in labels]
        eng = self._engine(tuple(d for _, d in resolved))
        t = eng.search(q, k=k, fetch=fetch, index_boosts=boosts)
        if len(t):
            ords = t["_index"].to_numpy()
            t = t.set_column(t.column_names.index("_index"), "_index",
                             pa.array(np.asarray(labels, dtype=object)[ords]))
        return t, clusters
