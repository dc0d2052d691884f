"""``alias`` field type (FieldAliasMapper): a mapping-level indirection
from an alternate name to a concrete field.

Reference semantics
(``server/src/main/java/org/elasticsearch/index/mapper/FieldAliasMapper.java``,
``MappingLookup#checkFieldNames``):

- an alias has a mandatory ``path`` naming a CONCRETE field — the target
  may not itself be an alias (``FieldAliasMapper#validate`` rejects
  "Invalid [path] value ... is not a concrete field"), which also rules
  out cycles;
- aliases resolve in queries, aggregations, sorts and suggestions, and
  surface in ``_field_caps`` as ordinary entries whose capabilities are
  the target's;
- documents are never stored under the alias (it is query-side only).

Here resolution is ONE immutable-tree walk (the same generic dataclass
recursion FLS uses, ``search/security.py:126``) performed on the driver
before the query ships to workers — zero per-batch cost.
"""

from __future__ import annotations

import dataclasses

from .query import Query


class FieldAliases:
    """Validated alias table: ``{alias: path}``."""

    def __init__(self, aliases: dict[str, str]):
        for alias, path in aliases.items():
            if alias == path:
                raise ValueError(
                    f"Invalid [path] value [{path}] for field alias "
                    f"[{alias}]: an alias cannot refer to itself.")
            if path in aliases:
                raise ValueError(
                    f"Invalid [path] value [{path}] for field alias "
                    f"[{alias}]: an alias cannot refer to another alias.")
        self._map = dict(aliases)

    def resolve(self, field: str | None) -> str | None:
        if field is None:
            return None
        return self._map.get(field, field)

    def resolve_query(self, q: Query) -> Query:
        """Rewrite every field reference in the query tree through the
        alias table (leaves: ``field``/``column`` attrs; multi-field
        leaves: the ``fields`` tuple; compounds recurse)."""
        if not dataclasses.is_dataclass(q):
            return q
        changes = {}
        flds = getattr(q, "fields", None)
        if isinstance(flds, tuple) and flds and \
                all(isinstance(f, str) or f is None for f in flds):
            nv = tuple(self.resolve(f) for f in flds)
            if nv != flds:
                changes["fields"] = nv
        for attr in ("field", "column"):
            if hasattr(q, attr):
                name = getattr(q, attr)
                if isinstance(name, str):
                    r = self.resolve(name)
                    if r != name:
                        changes[attr] = r
        # field-KEYED parallel tuples (MultiMatchQuery.boosts): the keys
        # must resolve with the fields or per-field boosts silently fall
        # back to 1.0 after resolution (review r5 #6)
        boosts = getattr(q, "boosts", None)
        if isinstance(boosts, tuple) and all(
                isinstance(b, tuple) and len(b) == 2
                and (isinstance(b[0], str) or b[0] is None)
                for b in boosts):
            nv = tuple((self.resolve(f), w) for f, w in boosts)
            if nv != boosts:
                changes["boosts"] = nv
        for f in dataclasses.fields(q):
            v = getattr(q, f.name)
            if isinstance(v, Query):
                nv = self.resolve_query(v)
                if nv is not v:
                    changes[f.name] = nv
            elif isinstance(v, tuple) and any(isinstance(x, Query)
                                              for x in v):
                nv = tuple(self.resolve_query(x) if isinstance(x, Query)
                           else x for x in v)
                if nv != v:
                    changes[f.name] = nv
        return dataclasses.replace(q, **changes) if changes else q

    def field_caps_entries(self, concrete_caps: dict[str, dict]) -> dict:
        """_field_caps rows for the aliases: each alias mirrors its
        target's capabilities (FieldCapabilitiesFetcher resolves through
        MappingLookup, so an alias and its path report identically)."""
        out = {}
        for alias, path in self._map.items():
            if path in concrete_caps:
                out[alias] = dict(concrete_caps[path])
        return out
