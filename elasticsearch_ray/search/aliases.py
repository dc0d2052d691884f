"""Index aliases — the reference's alias surface (`IndicesAliasesRequest`,
`MetadataIndexAliasesService`): an alias names one or more indexes and may
carry a FILTER query; every search through the alias transparently applies
the filter (filtered aliases are the reference's standard multi-tenancy /
view mechanism).

Semantics implemented:
- alias → one index:  search delegates with the alias filter ANDed in
  as a non-scoring ``bool.filter`` clause (exactly how the reference
  applies alias filters — scores unchanged vs the same query + filter).
- alias → many indexes: the engines wrap into a MultiIndexEngine shell
  (DFS-combined stats — NOTE: like MultiIndexEngine, this rewrites the
  member engines' global stats; don't share members with standalone use).
  One filter per alias (the reference allows per-member filters on add;
  documented subset).
- ``remove`` / atomic swap (`actions: [{remove, add}]`): supported via
  ``update_aliases`` applying all actions atomically (all-or-nothing,
  like IndicesAliasesRequest).
"""

from __future__ import annotations

from elasticsearch_ray.search.query import BoolQuery, MatchQuery, Query


class AliasRegistry:
    def __init__(self):
        self._aliases: dict[str, dict] = {}

    # -- management -------------------------------------------------------
    def put(self, alias: str, engines, filter: "Query | dict | None" = None) -> None:
        """Add/replace an alias. ``engines``: one engine or a list;
        ``filter``: a Query or a JSON-DSL dict (parsed once here)."""
        if filter is not None and not isinstance(filter, Query):
            from elasticsearch_ray.search.dsl import parse_dsl

            filter = parse_dsl(filter)
        members = engines if isinstance(engines, (list, tuple)) else [engines]
        self._aliases[alias] = {"engines": list(members), "filter": filter}

    def remove(self, alias: str) -> None:
        if alias not in self._aliases:
            raise KeyError(f"no alias {alias!r}")
        del self._aliases[alias]

    def update_aliases(self, actions: list[dict]) -> None:
        """Atomic batch (IndicesAliasesRequest): every action validates
        before any applies — a failing action leaves the registry untouched."""
        staged = dict(self._aliases)
        for act in actions:
            if "add" in act:
                a = act["add"]
                members = a["engines"] if isinstance(a["engines"], (list, tuple)) \
                    else [a["engines"]]
                filt = a.get("filter")
                if filt is not None and not isinstance(filt, Query):
                    from elasticsearch_ray.search.dsl import parse_dsl

                    filt = parse_dsl(filt)
                staged[a["alias"]] = {"engines": list(members), "filter": filt}
            elif "remove" in act:
                name = act["remove"]["alias"]
                if name not in staged:
                    raise KeyError(f"no alias {name!r}")
                del staged[name]
            else:
                raise ValueError(f"unknown alias action {sorted(act)}")
        self._aliases = staged

    def aliases(self) -> dict[str, int]:
        """GET _alias analog: alias → member count."""
        return {a: len(e["engines"]) for a, e in self._aliases.items()}

    # -- search -----------------------------------------------------------
    def _resolve(self, alias: str):
        ent = self._aliases.get(alias)
        if ent is None:
            raise KeyError(f"no alias {alias!r}")
        if len(ent["engines"]) == 1:
            return ent["engines"][0], ent["filter"]
        multi = ent.get("_multi")
        if multi is None:
            from elasticsearch_ray.search.multi import MultiIndexEngine

            # idempotent: from_engines recombines from each member's
            # original-stats snapshot, so re-puts / shared members never
            # compound the mutated totals
            multi = ent["_multi"] = MultiIndexEngine.from_engines(ent["engines"])
        return multi, ent["filter"]

    def search(self, alias: str, q, k: int = 10, **kw):
        eng, filt = self._resolve(alias)
        if isinstance(q, str):
            q = MatchQuery(q)
        if filt is not None:
            # alias filter = non-scoring bool.filter clause (the reference's
            # AliasFilter wrapping): scores identical to the unfiltered query
            q = BoolQuery(must=(q,), filter=(filt,))
        return eng.search(q, k=k, **kw)


