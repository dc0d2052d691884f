"""Range field types (``integer_range``/``long_range``/``float_range``/
``double_range``/``date_range``/``ip_range``) + relation queries.

Reference semantics (all public):

- ``server/src/main/java/org/elasticsearch/index/mapper/RangeFieldMapper.java``
  — a range field stores a ``{gte, lte}`` pair per document; a missing
  ``gte`` defaults to the type's minimum and a missing ``lte`` to its
  maximum (``RangeFieldMapper.Range`` ctor), so half-open stored ranges
  behave as unbounded on that side.
- ``server/src/main/java/org/elasticsearch/index/mapper/RangeType.java``
  — ``range`` queries against a range field carry a ``relation``:
  ``INTERSECTS`` (default: ``doc.lte >= from AND doc.gte <= to``),
  ``WITHIN`` (``doc.gte >= from AND doc.lte <= to``), ``CONTAINS``
  (``doc.gte <= from AND doc.lte >= to``). Exclusive query bounds are
  folded into inclusive ones with the type's ``nextUp``/``nextDown``
  (``RangeType.LONG.nextUp = v + 1``; floats use the IEEE successor) —
  the same trick this module applies before the vectorized compare.
- ``termQuery`` on a range field is the point-intersects form:
  ``doc.gte <= v <= doc.lte`` (``RangeType#termQuery`` delegating to
  ``rangeQuery(v, v, true, true, INTERSECTS)``).

Ray-Data shape: the pair rides as two ordinary columns (``lo_col`` /
``hi_col``), every relation is a pair of vectorized numpy compares per
batch — no per-row objects. ``ip_range`` reuses the (hi, lo) uint64 lane
encoding from :mod:`elasticsearch_ray.ops.ip_field` so IPv4/IPv6 compare
in one byte order. Rows where BOTH bounds are null are treated as missing
(never match), matching the mapper's null_value-less default.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .ip_field import _ge as _ip_ge
from .ip_field import _lt as _ip_lt
from .ip_field import encode_ips

RELATIONS = ("intersects", "within", "contains")

_I64_MIN = np.iinfo(np.int64).min
_I64_MAX = np.iinfo(np.int64).max


def _next_up(v, kind: str):
    if kind == "float":
        return np.nextafter(v, np.inf)
    return v + 1


def _next_down(v, kind: str):
    if kind == "float":
        return np.nextafter(v, -np.inf)
    return v - 1


def _coerce(v, kind: str):
    """Query-bound coercion: dates → int64 epoch-us (the stored lane for
    date_range), ints stay python ints, floats stay floats."""
    if v is None:
        return None
    if kind == "date":
        return int(pd.Timestamp(v).value // 1000)
    if kind == "float":
        return float(v)
    return int(v)


def _bounds_arrays(df: pd.DataFrame, lo_col: str, hi_col: str, kind: str):
    """(lo, hi, valid) numpy lanes with the mapper's open-side defaults:
    null gte → type min, null lte → type max; both null → missing row.

    Lanes are float64 so null handling is one vectorized pass; integer /
    epoch-us values above 2^53 would lose ulp precision — fine for the
    date_range epoch range (~2^51 us covers year 9999) and the numeric
    ranges this engine stores; a full-width long_range at the int64
    extremes would need dedicated int lanes."""
    lo_raw, hi_raw = df[lo_col], df[hi_col]
    if kind == "date":
        lo_raw = pd.to_datetime(lo_raw)
        hi_raw = pd.to_datetime(hi_raw)
        lo = np.where(lo_raw.isna(), np.nan,
                      lo_raw.values.astype("datetime64[us]").astype(
                          "int64").astype("float64"))
        hi = np.where(hi_raw.isna(), np.nan,
                      hi_raw.values.astype("datetime64[us]").astype(
                          "int64").astype("float64"))
    else:
        lo = lo_raw.to_numpy(dtype="float64", na_value=np.nan)
        hi = hi_raw.to_numpy(dtype="float64", na_value=np.nan)
    lo_na, hi_na = np.isnan(lo), np.isnan(hi)
    valid = ~(lo_na & hi_na)
    if kind == "float":
        lo = np.where(lo_na, -np.inf, lo)
        hi = np.where(hi_na, np.inf, hi)
    else:
        lo = np.where(lo_na, float(_I64_MIN), lo)
        hi = np.where(hi_na, float(_I64_MAX), hi)
    return lo, hi, valid


def relation_mask(lo: np.ndarray, hi: np.ndarray, valid: np.ndarray,
                  frm, to, relation: str) -> np.ndarray:
    """Vectorized relation over inclusive-adjusted query bounds [frm, to]
    (None = open side). ``RangeType#dvRangeQuery`` compare shape."""
    if relation not in RELATIONS:
        raise ValueError(f"unknown relation {relation!r}")
    m = valid.copy()
    if relation == "intersects":
        if frm is not None:
            m &= hi >= frm
        if to is not None:
            m &= lo <= to
    elif relation == "within":
        if frm is not None:
            m &= lo >= frm
        if to is not None:
            m &= hi <= to
    else:  # contains: an open query side is vacuously contained only by
        # a stored side that reaches the type extreme — the null-bound
        # default already put ±extreme there, so compare vs the extreme
        if frm is not None:
            m &= lo <= frm
        if to is not None:
            m &= hi >= to
    return m


def range_field_filter(ds: Dataset, lo_col: str, hi_col: str,
                       frm=None, to=None, relation: str = "intersects",
                       include_lower: bool = True,
                       include_upper: bool = True,
                       kind: str = "long") -> Dataset:
    """``range`` query against a range field (two-column layout). ``kind``
    in {"long", "float", "date"} picks the nextUp/nextDown used to fold
    exclusive bounds (RangeType.LONG/DOUBLE/DATE)."""
    frm = _coerce(frm, kind)
    to = _coerce(to, kind)
    if frm is not None and not include_lower:
        frm = _next_up(frm, kind)
    if to is not None and not include_upper:
        to = _next_down(to, kind)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi, valid = _bounds_arrays(df, lo_col, hi_col, kind)
        return df[relation_mask(lo, hi, valid, frm, to, relation)]

    return ds.map_batches(keep, batch_format="pandas")


def range_field_term(ds: Dataset, lo_col: str, hi_col: str, value,
                     kind: str = "long") -> Dataset:
    """term query on a range field: docs whose stored range contains the
    point (``RangeType#termQuery`` → rangeQuery(v, v, INTERSECTS))."""
    return range_field_filter(ds, lo_col, hi_col, frm=value, to=value,
                              relation="intersects", kind=kind)


# ------------------------------------------------------------- ip_range


def ip_range_field_filter(ds: Dataset, lo_col: str, hi_col: str,
                          frm: str | None = None, to: str | None = None,
                          relation: str = "intersects") -> Dataset:
    """``ip_range`` field relation query. Stored bounds are address
    STRINGS (parsed per batch into the (hi, lo) uint64 lanes); query
    bounds are inclusive addresses. Null stored sides default to the
    address-space extremes (RangeType.IP minValue/maxValue)."""
    from .ip_field import _encode_one

    qf = _encode_one(frm) if frm is not None else None
    qt = _encode_one(to) if to is not None else None

    def _le(h, l, b):  # (h, l) <= b  ==  (h, l) < b  OR  == b
        return _ip_lt(h, l, b) | ((h == np.uint64(b[0]))
                                  & (l == np.uint64(b[1])))

    def keep(batch: pa.Table) -> pa.Table:
        lo_h, lo_l, lo_v = encode_ips(batch[lo_col].to_pylist())
        hi_h, hi_l, hi_v = encode_ips(batch[hi_col].to_pylist())
        mx = np.uint64(0xFFFFFFFFFFFFFFFF)
        z = np.uint64(0)
        # null-side defaults: open gte → ::, open lte → address-space max
        lo_h = np.where(lo_v, lo_h, z)
        lo_l = np.where(lo_v, lo_l, z)
        hi_h = np.where(hi_v, hi_h, mx)
        hi_l = np.where(hi_v, hi_l, mx)
        m = lo_v | hi_v
        if relation == "intersects":
            if qf is not None:
                m &= _ip_ge(hi_h, hi_l, qf)           # doc.hi >= from
            if qt is not None:
                m &= _le(lo_h, lo_l, qt)              # doc.lo <= to
        elif relation == "within":
            if qf is not None:
                m &= _ip_ge(lo_h, lo_l, qf)
            if qt is not None:
                m &= _le(hi_h, hi_l, qt)
        elif relation == "contains":
            if qf is not None:
                m &= _le(lo_h, lo_l, qf)
            if qt is not None:
                m &= _ip_ge(hi_h, hi_l, qt)
        else:
            raise ValueError(f"unknown relation {relation!r}")
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")
