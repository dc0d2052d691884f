"""Deep query/parse semantics for the x-pack mapper field types, layered
over the carrier primitives in :mod:`elasticsearch_ray.ops.field_types`
(which owns the sortable-lane encoding, the pre-agg doc builder and the
``ConstantKeywordField`` rewrite family).

This module adds what the reference enforces ABOVE the storage shape:

- ``x-pack/plugin/mapper-unsigned-long/.../UnsignedLongFieldMapper.java``
  — term parsing (``parseTerm`` :360) folds negative / fractional /
  out-of-range values to no-match (None); range bounds SATURATE: a
  lower term < 0 clamps to 0, an upper term > 2^64-1 clamps to the
  max, a decimal lower bound rounds UP and a decimal upper bound
  truncates, exclusive bounds step inward
  (``parseLowerRangeTerm``/``parseUpperRangeTerm`` :394-460). Filters
  here run on the int64 SORTABLE LANE column (the
  ``unsignedToSortableSignedLong`` v^2^63 storage form, :632-646) with
  one vectorized signed compare per batch; sums are exact
  arbitrary-precision integers (a u64 sum overflows int64).
- ``x-pack/plugin/mapper-aggregate-metric/.../AggregateDoubleMetricFieldMapper.java``
  — ``metrics`` must be a non-empty subset of min/max/sum/value_count
  and ``default_metric`` must be one of them (required unless exactly
  one metric is configured — Builder :192-207); term/range queries
  DELEGATE to the default metric subfield (:346-366); each agg reads
  ONLY its backing subfield and avg = Σsum / Σvalue_count
  (``aggregations/metrics/AggregateMetricBacked*Aggregator.java``).
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal, InvalidOperation

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .field_types import (  # noqa: F401  (re-exported carrier API)
    ConstantKeywordField,
    build_aggregate_metric,
    sortable_to_unsigned,
    unsigned_to_sortable,
)

_U64_MAX = (1 << 64) - 1

# lane == the int64 sortable-signed storage form of a u64 column
unsigned_to_lane = unsigned_to_sortable
lane_to_unsigned = sortable_to_unsigned


# ------------------------------------------------------------ unsigned_long

def parse_term(value) -> int | None:
    """``parseTerm``: the exact u64 integer, or None when the value can
    never match (negative, fractional, out of range). Malformed
    non-numeric strings raise, like the reference."""
    if isinstance(value, (int, np.integer)) and not isinstance(value, bool):
        v = int(value)
        return v if 0 <= v <= _U64_MAX else None
    if isinstance(value, float):
        if value.is_integer() and 0 <= value <= _U64_MAX:
            return int(value)
        float(value)  # well-formed number, just not a u64 term
        return None
    s = str(value)
    try:
        v = int(s)
        return v if 0 <= v <= _U64_MAX else None
    except ValueError:
        float(s)  # raises ValueError on a malformed number
        return None


def parse_lower_range_term(value, include: bool) -> int | None:
    """``parseLowerRangeTerm``: clamp <0 to 0; decimal bounds round UP;
    None = bound beyond the u64 maximum (empty range)."""
    try:
        d = Decimal(str(value))
    except InvalidOperation:
        raise ValueError(f"malformed unsigned_long bound {value!r}")
    if d <= 0:
        return 0
    if d > _U64_MAX or (d == _U64_MAX and not include):
        return None
    v = int(d)
    has_decimal = d != v
    if not include or has_decimal:
        v += 1
    return v


def parse_upper_range_term(value, include: bool) -> int | None:
    """``parseUpperRangeTerm``: None = bound below 0 (empty range);
    clamp > max to max; decimal bounds truncate; exclusive steps down."""
    try:
        d = Decimal(str(value))
    except InvalidOperation:
        raise ValueError(f"malformed unsigned_long bound {value!r}")
    if d < 0 or (d == 0 and not include):
        return None
    if d > _U64_MAX:
        return _U64_MAX
    v = int(d)
    if not include and d == v:
        v -= 1
    return v


def unsigned_range_filter(ds: Dataset, col: str, gte=None, gt=None,
                          lte=None, lt=None) -> Dataset:
    """Range filter over an unsigned_long column stored as its int64
    sortable lane. Bounds go through the reference's parse/saturate
    rules, then ONE vectorized signed compare on the lane."""
    lo = parse_lower_range_term(gt, False) if gt is not None else (
        parse_lower_range_term(gte, True) if gte is not None else 0)
    hi = parse_upper_range_term(lt, False) if lt is not None else (
        parse_upper_range_term(lte, True) if lte is not None else _U64_MAX)
    if lo is None or hi is None or lo > hi:
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow")
    lo_lane = int(unsigned_to_lane(np.asarray([lo], np.uint64))[0])
    hi_lane = int(unsigned_to_lane(np.asarray([hi], np.uint64))[0])

    def _f(batch: pa.Table) -> pa.Table:
        lane = batch.column(col).to_numpy(zero_copy_only=False)
        m = (lane >= lo_lane) & (lane <= hi_lane)
        return batch.filter(pa.array(m))

    return ds.map_batches(_f, batch_format="pyarrow")


def unsigned_term_filter(ds: Dataset, col: str, value) -> Dataset:
    v = parse_term(value)
    if v is None:
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow")
    lane_v = int(unsigned_to_lane(np.asarray([v], np.uint64))[0])

    def _f(batch: pa.Table) -> pa.Table:
        lane = batch.column(col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(lane == lane_v))

    return ds.map_batches(_f, batch_format="pyarrow")


def unsigned_stats(ds: Dataset, col: str) -> dict:
    """Exact min/max/sum/count over an unsigned_long lane column. The
    sum is an arbitrary-precision Python int combined from per-block
    partials (a u64 sum overflows int64; the reference's sum agg loses
    this to double — we keep it exact, like DuckDB's HUGEINT)."""
    def _partial(batch: pa.Table) -> pa.Table:
        lane = batch.column(col).to_numpy(zero_copy_only=False)
        if len(lane) == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "s": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        u = lane_to_unsigned(lane)
        total = int(np.sum(u.astype(object)))
        return pa.table({"mn": pa.array([int(lane.min())], pa.int64()),
                         "mx": pa.array([int(lane.max())], pa.int64()),
                         "s": pa.array([str(total)], pa.string()),
                         "n": pa.array([len(lane)], pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    if parts.empty or parts["n"].sum() == 0:
        return {"count": 0, "min": None, "max": None, "sum": 0}
    mn = int(lane_to_unsigned(np.array([parts["mn"].min()]))[0])
    mx = int(lane_to_unsigned(np.array([parts["mx"].max()]))[0])
    return {"count": int(parts["n"].sum()), "min": mn, "max": mx,
            "sum": sum(int(s) for s in parts["s"])}


def unsigned_top_k(ds: Dataset, col: str, k: int,
                   descending: bool = True) -> pd.DataFrame:
    """Top-k rows by unsigned order: per-block vectorized pre-cut on
    the lane (signed order == unsigned order), then a k·P driver merge
    — never a global sort."""
    def _cut(batch: pa.Table) -> pa.Table:
        lane = batch.column(col).to_numpy(zero_copy_only=False)
        if len(lane) <= k:
            return batch
        idx = np.argsort(lane, kind="stable")
        take = idx[-k:] if descending else idx[:k]
        return batch.take(pa.array(np.sort(take)))

    parts = ds.map_batches(_cut, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(col, ascending=not descending,
                              kind="mergesort", ignore_index=True)
    return parts.head(k)


# --------------------------------------------- aggregate_metric_double

METRICS = ("min", "max", "sum", "value_count")


@dataclass
class AggregateMetricSpec:
    """Mapper parameters with the Builder's validation (:192-207)."""

    metrics: tuple
    default_metric: str | None = None

    def __post_init__(self):
        if not self.metrics:
            raise ValueError(
                "Property [metrics] is required for aggregate_metric_double")
        bad = [m for m in self.metrics if m not in METRICS]
        if bad:
            raise ValueError(f"unknown metrics {bad}; supported {METRICS}")
        if self.default_metric is None:
            if len(self.metrics) == 1:
                self.default_metric = self.metrics[0]
            else:
                raise ValueError("Property [default_metric] is required")
        if self.default_metric not in self.metrics:
            raise ValueError(
                f"Default metric [{self.default_metric}] is not defined "
                "in the metrics of field")

    def subfield(self, metric: str, name: str = "m") -> str:
        """``subfieldName``: ``<field>.<metric>``."""
        return f"{name}.{metric}"


def build_aggregate_metric_docs(ds: Dataset, key_cols: list[str],
                                value_col: str,
                                spec: AggregateMetricSpec,
                                name: str = "m") -> Dataset:
    """The ingest shape under a validated spec: delegates to
    :func:`field_types.build_aggregate_metric` (map-side-combined
    groupby) and keeps only the CONFIGURED subfield columns."""
    docs = build_aggregate_metric(ds, key_cols, value_col, name)
    drop = [spec.subfield(m, name) for m in METRICS
            if m not in spec.metrics]
    if not drop:
        return docs
    return docs.map_batches(lambda b: b.drop_columns(drop),
                            batch_format="pyarrow")


def aggregate_metric_agg(docs: Dataset, spec: AggregateMetricSpec,
                         agg: str, name: str = "m") -> float | int:
    """AggregateMetricBacked{Min,Max,Sum,ValueCount,Avg}Aggregator:
    each agg reads ONLY its backing subfield; avg recomposes from
    sum + value_count partials (never a stored average). Raises when
    the backing metric is not configured on the field (the reference
    rejects such an agg at parse time)."""
    def _need(metric):
        if metric not in spec.metrics:
            raise ValueError(
                f"agg [{agg}] needs metric [{metric}] which is not "
                "configured on this field")
        return spec.subfield(metric, name)

    if agg == "avg":
        s_col, c_col = _need("sum"), _need("value_count")

        def _p(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"s": [df[s_col].sum()],
                                 "c": [int(df[c_col].sum())]})

        parts = docs.map_batches(_p, batch_format="pandas").to_pandas()
        c = int(parts["c"].sum())
        return float(parts["s"].sum()) / c if c else float("nan")

    col = {"min": "min", "max": "max", "sum": "sum",
           "value_count": "value_count"}.get(agg)
    if col is None:
        raise ValueError(f"unsupported aggregate_metric agg [{agg}]")
    col = _need(col)

    def _p(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"v": []})
        if agg == "min":
            return pd.DataFrame({"v": [df[col].min()]})
        if agg == "max":
            return pd.DataFrame({"v": [df[col].max()]})
        return pd.DataFrame({"v": [df[col].sum()]})

    parts = docs.map_batches(_p, batch_format="pandas").to_pandas()
    if parts.empty:
        return 0 if agg == "value_count" else float("nan")
    if agg == "min":
        return float(parts["v"].min())
    if agg == "max":
        return float(parts["v"].max())
    if agg == "value_count":
        return int(parts["v"].sum())
    return float(parts["v"].sum())


def aggregate_metric_range_filter(docs: Dataset,
                                  spec: AggregateMetricSpec,
                                  gte=None, lte=None,
                                  name: str = "m") -> Dataset:
    """term/range queries delegate to the DEFAULT metric subfield
    (:346-366)."""
    col = spec.subfield(spec.default_metric, name)

    def _f(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        m = np.ones(len(v), dtype=bool)
        if gte is not None:
            m &= v >= gte
        if lte is not None:
            m &= v <= lte
        return batch.filter(pa.array(m))

    return docs.map_batches(_f, batch_format="pyarrow")
