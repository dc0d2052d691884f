"""Document- and field-level security (x-pack security DLS / FLS).

Reference semantics:
- ``x-pack/plugin/core/.../security/authz/permission/DocumentPermissions.java``
  (:120-190): each role may carry a DLS query; the per-shard filter ORs the
  role queries as SHOULD clauses with ``minimum_should_match=1``, and a
  *limited-by* scope (API keys / ``LimitedRole``) adds its own OR-group as an
  independent FILTER clause — both must pass.
- ``FieldPermissions.java`` (:43-44, :146-176): a field is readable iff it
  matches a ``grant`` pattern and no ``except`` pattern; ``except`` must be a
  subset of ``grant`` (``ElasticsearchSecurityException`` otherwise); groups
  from multiple roles union; metadata fields are always readable. Patterns
  are ``Regex.simpleMatch`` globs (``*`` only).
- ``FieldSubsetReader`` (x-pack security): a denied field behaves as if
  UNMAPPED — queries against it match nothing, fetches omit it.

Ray-Data shape: both controls are COORDINATOR-side rewrites, so the secured
path is exactly the normal distributed search path — no per-partition state:
FLS walks the immutable query tree once (generic dataclass recursion) turning
denied-field leaves into ``match_none`` and dropping denied members from
multi-field leaves; DLS wraps the query in ``bool.filter`` (non-scoring, so
BM25 stats stay corpus-wide, like Lucene's FILTER occur); fetch columns are
masked before the fetch phase reads anything. Documented divergence: the
reference masks at the index-reader level, so *every* access (including
script/decay field reads inside scoring functions) is filtered; here the
query/filter/sort/collapse/fetch surfaces are masked and score-function
field reads are not — do not pass secrets through score functions.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass

from elasticsearch_ray.search.query import (
    BoolQuery,
    MatchNoneQuery,
    MatchQuery,
    Query,
)

#: metadata fields are always granted (FieldPermissions metaFieldsAutomaton)
META_FIELDS = frozenset({"_id", "_index", "_score", "_shard_doc", "doc_id",
                         "rank", "score", "part", "local"})


@dataclass(frozen=True)
class RoleDescriptor:
    """One role's index privileges: FLS grant/except globs + optional DLS
    query (RoleDescriptor.IndicesPrivileges)."""

    name: str
    grant: tuple = ("*",)
    except_: tuple = ()
    query: Query | None = None


def _glob_match(pattern: str, s: str) -> bool:
    """Regex.simpleMatch: only ``*`` is special."""
    if "*" not in pattern:
        return pattern == s
    rx = ".*".join(re.escape(p) for p in pattern.split("*"))
    return re.fullmatch(rx, s) is not None


def _glob_covers(g: str, e: str) -> bool:
    """L(e) ⊆ L(g) for ``*``-only globs (the subsetOf automaton check,
    FieldPermissions.java:171-175, specialized to simpleMatch patterns)."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def cov(i: int, j: int) -> bool:
        if i == len(g):
            return j == len(e)
        if g[i] == "*":
            return cov(i + 1, j) or (j < len(e) and cov(i, j + 1))
        if j == len(e) or e[j] == "*":
            return False  # e can generate strings g's literal can't absorb
        return g[i] == e[j] and cov(i + 1, j + 1)

    return cov(0, 0)


class FieldPermissions:
    """Union of (grant, except) groups — one per role
    (FieldPermissionsDefinition). ``limit()`` intersects with another
    permission set (LimitedRole.limitFieldPermissions)."""

    def __init__(self, groups: list[tuple[tuple, tuple]]):
        self.groups = []
        for grant, except_ in groups:
            grant = tuple(grant) or ("*",)
            except_ = tuple(except_)
            for e in except_:
                if not any(_glob_covers(g, e) for g in grant):
                    raise ValueError(
                        "Exceptions for field permissions must be a subset "
                        f"of the granted fields: {e!r} not covered by "
                        f"{grant!r}")
            self.groups.append((grant, except_))
        self._limited_by: FieldPermissions | None = None

    @classmethod
    def from_roles(cls, roles) -> "FieldPermissions":
        return cls([(r.grant, r.except_) for r in roles])

    def limit(self, other: "FieldPermissions") -> "FieldPermissions":
        fp = FieldPermissions(self.groups)
        fp._limited_by = other
        return fp

    def is_granted(self, field: str) -> bool:
        if field in META_FIELDS:
            return True
        if self._limited_by is not None and \
                not self._limited_by.is_granted(field):
            return False
        for grant, except_ in self.groups:
            if any(_glob_match(g, field) for g in grant) and \
                    not any(_glob_match(e, field) for e in except_):
                return True
        return False


def apply_fls(q: Query, fp: FieldPermissions, default_field: str) -> Query:
    """FieldSubsetReader behavior at the query tree: a leaf targeting a
    denied field becomes ``match_none`` (unmapped-field semantics); denied
    members of multi-field leaves are dropped; compound queries recurse."""
    if not dataclasses.is_dataclass(q):
        return q
    flds = getattr(q, "fields", None)
    if isinstance(flds, tuple) and flds and \
            all(isinstance(f, str) or f is None for f in flds):
        # None names the default (body) field in multi-field leaves
        keep = [fp.is_granted(f if f is not None else default_field)
                for f in flds]
        if not any(keep):
            return MatchNoneQuery()
        if not all(keep):
            changes = {"fields": tuple(f for f, k in zip(flds, keep) if k)}
            # positionally-aligned parallel tuples (combined_fields
            # weights) must drop the same slots or later fields inherit
            # the denied field's weight
            w = getattr(q, "weights", None)
            if isinstance(w, tuple) and len(w) == len(flds):
                changes["weights"] = tuple(v for v, k in zip(w, keep) if k)
            q = dataclasses.replace(q, **changes)
    for attr in ("field", "column"):
        if hasattr(q, attr):
            name = getattr(q, attr)
            name = name if name is not None else default_field
            if isinstance(name, str) and not fp.is_granted(name):
                return MatchNoneQuery()
    changes = {}
    for f in dataclasses.fields(q):
        v = getattr(q, f.name)
        if isinstance(v, Query):
            nv = apply_fls(v, fp, default_field)
            if nv is not v:
                changes[f.name] = nv
        elif isinstance(v, tuple) and any(isinstance(x, Query) for x in v):
            nv = tuple(apply_fls(x, fp, default_field)
                       if isinstance(x, Query) else x for x in v)
            if nv != v:
                changes[f.name] = nv
    return dataclasses.replace(q, **changes) if changes else q


def dls_filter(roles) -> Query | None:
    """DocumentPermissions.filter/buildRoleQuery: role queries OR as SHOULD
    with msm=1; a role WITHOUT a DLS query grants unrestricted access
    (IndicesPermission union semantics), so the filter disappears."""
    roles = list(roles)
    if not roles or any(r.query is None for r in roles):
        return None
    return BoolQuery(should=tuple(r.query for r in roles),
                     minimum_should_match=1)


def secured_search(engine, roles, q, k: int = 10,
                   fetch: tuple = ("doc_id",), limited_by=None,
                   default_field: str | None = None, **kwargs):
    """Run ``engine.search`` under the roles' DLS + FLS.

    ``limited_by`` — an optional second role list (the API-key scope):
    its DLS OR-group is ANDed as an independent filter and its field
    permissions intersect (DocumentPermissions.filter:129-135,
    LimitedRole)."""
    if isinstance(q, str):
        q = MatchQuery(q)
    fp = FieldPermissions.from_roles(roles)
    if limited_by:
        fp = fp.limit(FieldPermissions.from_roles(limited_by))
    if default_field is None:
        default_field = engine.spec.get("text_column", "text")
    rq = apply_fls(q, fp, default_field)
    filters = [f for f in (dls_filter(roles),
                           dls_filter(limited_by or []) if limited_by
                           else None) if f is not None]
    if filters:
        rq = BoolQuery(must=(rq,), filter=tuple(filters))
    # query-carrying options must pass through the same FLS rewrite —
    # an unmasked post_filter would leak a denied column's values
    if kwargs.get("post_filter") is not None:
        kwargs["post_filter"] = apply_fls(kwargs["post_filter"], fp,
                                          default_field)
    if kwargs.get("rescore") is not None:
        rs = kwargs["rescore"]
        kwargs["rescore"] = (apply_fls(rs[0], fp, default_field),
                             *rs[1:])
    fetch_ok = tuple(c for c in fetch if fp.is_granted(c))
    for key in ("sort", "collapse"):
        v = kwargs.get(key)
        cols = [v] if isinstance(v, str) else \
            [c for c, _o in v] if isinstance(v, list) else []
        for c in cols:
            if c != "_score" and not fp.is_granted(c):
                raise ValueError(f"field [{c}] is not granted ({key})")
    return engine.search(rq, k=k, fetch=fetch_ok, **kwargs)


# ----------------------------------------------------- privilege checking
# _security/user/_has_privileges (TransportHasPrivilegesAction) over the
# reference's privilege lattices (IndexPrivilege.java / ClusterPrivilege
# name sets): "all" implies everything, "read" the search-family, "write"
# the doc-mutation family, "manage" implies "monitor".

INDEX_PRIV_IMPLIES = {
    "all": {"read", "write", "manage", "search", "get", "count", "index",
            "delete", "create", "update", "monitor", "view_index_metadata"},
    "read": {"search", "get", "count"},
    "write": {"index", "delete", "create", "update"},
    "manage": {"monitor", "view_index_metadata"},
}

CLUSTER_PRIV_IMPLIES = {
    "all": {"monitor", "manage", "manage_ilm", "read_ilm",
            "manage_security", "manage_ml", "monitor_ml"},
    "manage": {"monitor"},
    "manage_ilm": {"read_ilm"},
    "manage_ml": {"monitor_ml"},
}


def _priv_closure(privs, implies) -> set:
    out = set(privs)
    for p in list(privs):
        out |= implies.get(p, set())
    return out


@dataclass(frozen=True)
class IndexPrivilege:
    """One granted entry: index-name patterns + privilege names
    (RoleDescriptor.IndicesPrivileges name/privilege halves)."""

    names: tuple
    privileges: tuple


def has_privileges(granted_index: list[IndexPrivilege],
                   granted_cluster: tuple = (),
                   check: dict | None = None) -> dict:
    """``POST _security/user/_has_privileges`` analog. ``check`` mirrors
    the request body: ``{"cluster": [...], "index": [{"names": [...],
    "privileges": [...]}]}``. Response carries per-privilege booleans and
    the overall ``has_all_requested``."""
    check = check or {}
    cluster_have = _priv_closure(set(granted_cluster), CLUSTER_PRIV_IMPLIES)
    resp_cluster = {p: p in cluster_have
                    for p in check.get("cluster", [])}
    resp_index: dict[str, dict] = {}
    for entry in check.get("index", []):
        for name in entry["names"]:
            row = resp_index.setdefault(name, {})
            for priv in entry["privileges"]:
                ok = any(
                    any(_glob_match(pat, name) for pat in g.names)
                    and priv in _priv_closure(set(g.privileges),
                                              INDEX_PRIV_IMPLIES)
                    for g in granted_index)
                row[priv] = row.get(priv, False) or ok
    all_ok = (all(resp_cluster.values())
              and all(v for row in resp_index.values()
                      for v in row.values()))
    return {"has_all_requested": bool(all_ok),
            "cluster": resp_cluster, "index": resp_index}


# --------------------------------------------------------------- API keys
# _security/api_key (CreateApiKeyAction / InvalidateApiKeyAction):
# an API key snapshots the creator's roles; requests authenticated with
# it are LIMITED BY those roles (the limited_by list secured_search
# already intersects). Key material is a stable hash of (id, name, seed)
# — deterministic for tests; a deployment would use a CSPRNG.

_API_KEYS: dict[str, dict] = {}


def create_api_key(name: str, roles, limited_by=None,
                   seed: int = 0) -> dict:
    import hashlib as _h

    key_id = _h.sha256(f"id:{name}:{len(_API_KEYS)}:{seed}"
                       .encode()).hexdigest()[:20]
    secret = _h.sha256(f"secret:{key_id}:{seed}".encode()).hexdigest()[:28]
    _API_KEYS[key_id] = {"name": name, "secret": secret,
                         "roles": tuple(roles),
                         "limited_by": tuple(limited_by or roles),
                         "invalidated": False}
    return {"id": key_id, "api_key": secret, "name": name}


def authenticate_api_key(key_id: str, secret: str) -> dict:
    rec = _API_KEYS.get(key_id)
    if rec is None or rec["invalidated"] or rec["secret"] != secret:
        raise PermissionError("unable to authenticate api key")
    return {"roles": list(rec["roles"]),
            "limited_by": list(rec["limited_by"])}


def invalidate_api_key(key_id: str) -> dict:
    rec = _API_KEYS.get(key_id)
    if rec is None:
        return {"invalidated_api_keys": [], "error_count": 1}
    rec["invalidated"] = True
    return {"invalidated_api_keys": [key_id], "error_count": 0}


# --------------------------------------------------------------------------
# Role mappings (x-pack security PUT/GET/DELETE _security/role_mapping and
# the expression DSL: ExpressionRoleMapping.java + expressiondsl/
# {All,Any,Except,Field}Expression.java + ExpressionParser.java).
#
# Rules are a boolean tree over the user model (username, dn, groups,
# realm.name, metadata.*): `field` matches when ANY of its provided values
# matches the user value (FieldExpression javadoc); a user value that is a
# list (groups) matches when ANY element matches (ExpressionModel.test);
# string values that contain simpleMatch wildcards match as globs, values
# of the `/regex/` Lucene-regex form match as regexes
# (FieldExpression.FieldValue:122), null matches a missing/null field;
# `any` ORs, `all` ANDs (empty -> true, matching AllExpression over an
# empty list), `except` negates and is only legal directly inside `all`
# (ExpressionParser rule).  Role resolution unions the roles of every
# ENABLED mapping whose rule tree matches.

_ROLE_MAPPINGS: dict[str, dict] = {}


def _validate_mapping_rules(rules: dict, *, inside_all: bool = False):
    if not isinstance(rules, dict) or len(rules) != 1:
        raise ValueError(f"a rule must be a single-key object: {rules!r}")
    (kind, body), = rules.items()
    if kind == "field":
        if not isinstance(body, dict) or len(body) != 1:
            raise ValueError("field rule takes {name: value | [values]}")
        (name, values), = body.items()
        if not name:
            raise ValueError("null or empty field name")
        vals = values if isinstance(values, list) else [values]
        if not vals:
            raise ValueError(f"null or empty values ({values!r})")
    elif kind in ("any", "all"):
        if not isinstance(body, list):
            raise ValueError(f"{kind} takes a rule list")
        for sub in body:
            _validate_mapping_rules(sub, inside_all=(kind == "all"))
    elif kind == "except":
        # ExpressionParser: except is only allowed within an all rule
        if not inside_all:
            raise ValueError(
                "[except] is not allowed outside of an [all] rule")
        _validate_mapping_rules(body)
    else:
        raise ValueError(f"unknown rule type [{kind}]")


def _field_value_matches(rule_value, user_value) -> bool:
    import fnmatch

    if isinstance(user_value, (list, tuple, set)):
        return any(_field_value_matches(rule_value, u) for u in user_value)
    if rule_value is None:
        return user_value is None
    if isinstance(rule_value, bool) or isinstance(user_value, bool):
        return rule_value is user_value
    if isinstance(rule_value, (int, float)) and \
            isinstance(user_value, (int, float)):
        return float(rule_value) == float(user_value)
    if isinstance(rule_value, str) and isinstance(user_value, str):
        if len(rule_value) > 1 and rule_value.startswith("/") \
                and rule_value.endswith("/"):
            return re.fullmatch(rule_value[1:-1], user_value) is not None
        if "*" in rule_value:
            return fnmatch.fnmatchcase(
                user_value, rule_value.replace("?", "[?]"))
        return rule_value == user_value
    return False


def _user_field(user: dict, name: str):
    """Dotted lookup (``metadata.key`` / ``realm.name``) over the user
    model, trying the literal key first like ExpressionModel's flat map."""
    if name in user:
        return user[name]
    cur = user
    for part in name.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def evaluate_mapping_rules(rules: dict, user: dict) -> bool:
    (kind, body), = rules.items()
    if kind == "field":
        (name, values), = body.items()
        vals = values if isinstance(values, list) else [values]
        uval = _user_field(user, name)
        return any(_field_value_matches(v, uval) for v in vals)
    if kind == "any":
        return any(evaluate_mapping_rules(sub, user) for sub in body)
    if kind == "all":
        return all(evaluate_mapping_rules(sub, user) for sub in body)
    if kind == "except":
        return not evaluate_mapping_rules(body, user)
    raise ValueError(f"unknown rule type [{kind}]")


def put_role_mapping(name: str, roles: list[str], rules: dict,
                     enabled: bool = True,
                     metadata: dict | None = None) -> dict:
    if not roles:
        raise ValueError("role mappings must define at least one role")
    _validate_mapping_rules(rules)
    created = name not in _ROLE_MAPPINGS
    _ROLE_MAPPINGS[name] = {"roles": list(roles), "rules": rules,
                            "enabled": bool(enabled),
                            "metadata": dict(metadata or {})}
    return {"role_mapping": {"created": created}}


def get_role_mapping(name: str | None = None) -> dict:
    if name is None:
        return {k: dict(v) for k, v in sorted(_ROLE_MAPPINGS.items())}
    if name not in _ROLE_MAPPINGS:
        raise KeyError(name)
    return {name: dict(_ROLE_MAPPINGS[name])}


def delete_role_mapping(name: str) -> dict:
    found = _ROLE_MAPPINGS.pop(name, None) is not None
    return {"found": found}


def resolve_mapped_roles(user: dict) -> list[str]:
    """Union of the roles from every enabled mapping whose rule tree
    matches the user model, sorted (ExpressionRoleMapping resolution in
    NativeRoleMappingStore.resolveRoles)."""
    roles: set[str] = set()
    for rec in _ROLE_MAPPINGS.values():
        if rec["enabled"] and evaluate_mapping_rules(rec["rules"], user):
            roles.update(rec["roles"])
    return sorted(roles)
