"""x-pack mapper-plugin field types: ``aggregate_metric_double``,
``unsigned_long``, ``constant_keyword``.

Reference surfaces (all public):

- ``x-pack/plugin/mapper-aggregate-metric/.../AggregateDoubleMetricFieldMapper.java``
  — a field backed by sub-fields ``<f>.min/.max/.sum/.value_count``;
  queries/sorts read the configured ``default_metric``; metric aggs read
  the matching sub-metric (avg recomposed as sum / value_count — the
  same rule the rollup module uses). Aggregating the pre-aggregated
  field must equal aggregating the raw data it summarizes.
- ``x-pack/plugin/mapper-unsigned-long/.../UnsignedLongFieldMapper.java``
  — uint64 values stored as ``long`` via ``value ^ 0x8000...`` (the
  MASK_2_63 sortable-signed trick) so signed order == unsigned order;
  term/range/sort operate in shifted space.
- ``x-pack/plugin/mapper-constant-keyword/.../ConstantKeywordFieldMapper.java``
  — one index-wide constant; a term query is decided from the MAPPING
  alone (match-all or match-none), no data touched — the can_match
  shortcut for index-per-tenant layouts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_MASK_2_63 = np.uint64(0x8000000000000000)

AGG_METRICS = ("min", "max", "sum", "value_count")


# ------------------------------------------------- aggregate_metric_double


def build_aggregate_metric(ds: Dataset, group_cols: list[str],
                           value_col: str, field: str) -> Dataset:
    """Produce an aggregate_metric_double column set
    (``<field>.min/.max/.sum/.value_count``) per group — the write-side
    shape a downsampling/rollup process emits. One map-side-combined
    groupby (partial stats per batch, tiny shuffle)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, sort=False)[value_col].agg(
            ["min", "max", "sum", "count"]).reset_index()
        return g.rename(columns={
            "min": f"{field}.min", "max": f"{field}.max",
            "sum": f"{field}.sum", "count": f"{field}.value_count"})

    part = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][group_cols].copy()
        out[f"{field}.min"] = g[f"{field}.min"].min()
        out[f"{field}.max"] = g[f"{field}.max"].max()
        out[f"{field}.sum"] = g[f"{field}.sum"].sum()
        out[f"{field}.value_count"] = int(g[f"{field}.value_count"].sum())
        return out

    return part.groupby(group_cols).map_groups(combine,
                                               batch_format="pandas")


def aggregate_metric_aggs(ds: Dataset, field: str,
                          metrics: tuple = ("min", "max", "sum",
                                            "value_count", "avg"),
                          default_metric: str = "max") -> dict:
    """Metric aggs over an aggregate_metric_double field: each agg reads
    its matching sub-metric; ``avg`` is NEVER stored, recomposed from
    sum / value_count (AggregateMetricBackedAvgAggregator)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "mn": df[f"{field}.min"].min(),
            "mx": df[f"{field}.max"].max(),
            "s": df[f"{field}.sum"].sum(),
            "c": int(df[f"{field}.value_count"].sum()),
        }])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    mn, mx = float(parts["mn"].min()), float(parts["mx"].max())
    s, c = float(parts["s"].sum()), int(parts["c"].sum())
    all_vals = {"min": mn, "max": mx, "sum": s, "value_count": c,
                "avg": (s / c) if c else None}
    out = {m: all_vals[m] for m in metrics}
    out["_default_metric_value"] = all_vals[default_metric]
    return out


# ------------------------------------------------------- unsigned_long


def unsigned_to_sortable(u: np.ndarray) -> np.ndarray:
    """uint64 -> int64 with preserved order (value ^ 2^63)."""
    return (np.asarray(u, np.uint64) ^ _MASK_2_63).view(np.int64)


def sortable_to_unsigned(s: np.ndarray) -> np.ndarray:
    return (np.asarray(s, np.int64).view(np.uint64)) ^ _MASK_2_63


def add_unsigned_long_key(ds: Dataset, col: str,
                          key_col: str | None = None) -> Dataset:
    """Attach the sortable-signed shadow of a uint64 column (stored as
    int64 bit patterns, the parquet-friendly carrier)."""
    key_col = key_col or f"{col}__sortable"

    def key(batch: pa.Table) -> pa.Table:
        u = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(key_col,
                                   pa.array(unsigned_to_sortable(u)))

    return ds.map_batches(key, batch_format="pyarrow")


def unsigned_long_range(ds: Dataset, col: str, gte: int | None = None,
                        lte: int | None = None) -> Dataset:
    """Range in UNSIGNED space over int64-bit-pattern storage."""
    lo = unsigned_to_sortable(np.asarray([gte], np.uint64))[0] \
        if gte is not None else None
    hi = unsigned_to_sortable(np.asarray([lte], np.uint64))[0] \
        if lte is not None else None

    def keep(batch: pa.Table) -> pa.Table:
        u = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = unsigned_to_sortable(u)
        m = np.ones(len(s), bool)
        if lo is not None:
            m &= s >= lo
        if hi is not None:
            m &= s <= hi
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def sort_unsigned_long(ds: Dataset, col: str,
                       descending: bool = False) -> Dataset:
    """Distributed sort in unsigned order via the sortable shadow."""
    key = f"{col}__sortable"
    out = add_unsigned_long_key(ds, col, key).sort(key,
                                                   descending=descending)

    def drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([key])
    return out.map_batches(drop, batch_format="pyarrow")


# ----------------------------------------------------- constant_keyword


def _simple_match(pattern: str, value: str,
                  case_insensitive: bool = False) -> bool:
    """``Regex.simpleMatch``: only ``*`` is special (no ``?`` / char
    classes — fnmatch would be wrong here)."""
    if case_insensitive:
        pattern, value = pattern.lower(), value.lower()
    parts = pattern.split("*")
    if len(parts) == 1:
        return pattern == value
    if not value.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for mid in parts[1:-1]:
        i = value.find(mid, pos)
        if i < 0:
            return False
        pos = i + len(mid)
    last = parts[-1]
    return len(value) - pos >= len(last) and value.endswith(last)


class ConstantKeywordField:
    """Index-level constant (ConstantKeywordFieldMapper): EVERY query is
    answered from the mapping alone and folds to match-all / match-none
    at rewrite time — ``matches`` says whether the whole index matches,
    and :func:`filter_dataset` either passes the dataset through
    untouched or short-circuits to empty WITHOUT a scan (the can_match
    shortcut). The full rewrite family mirrors
    ``ConstantKeywordFieldMapper.ConstantKeywordFieldType``: term/terms,
    exists (:178), lexicographic range with inclusive-flag edges
    (:183-204), wildcard = ``Regex.simpleMatch`` (:170-175), prefix,
    fuzzy = Damerau automaton accept with exact-prefix chars (:208-241),
    regexp = anchored whole-value accept (:244-261)."""

    def __init__(self, field: str, value: str | None):
        self.field = field
        self.value = value

    def matches(self, query_value) -> bool:
        if self.value is None:
            # no value seen yet: the field matches nothing (reference:
            # value gets fixed by the first document that supplies it)
            return False
        if isinstance(query_value, (list, tuple, set)):
            return self.value in query_value
        return self.value == query_value

    def filter_dataset(self, ds: Dataset, query_value) -> Dataset:
        if self.matches(query_value):
            return ds
        return ds.limit(0)

    def exists(self) -> bool:
        return self.value is not None

    # ---- full query-rewrite family (driver-side fold, no data touched)

    def term_query(self, v, case_insensitive: bool = False) -> bool:
        if self.value is None:
            return False
        a, b = str(v), self.value
        return a.lower() == b.lower() if case_insensitive else a == b

    def terms_query(self, vs) -> bool:
        return self.value is not None and any(
            str(v) == self.value for v in vs)

    def exists_query(self) -> bool:
        return self.value is not None

    def range_query(self, lower=None, upper=None,
                    include_lower: bool = True,
                    include_upper: bool = True) -> bool:
        """Lexicographic UTF-8 compare (BytesRef semantics), :183-204."""
        if self.value is None:
            return False
        vb = self.value.encode()
        if lower is not None:
            lb = str(lower).encode()
            if lb > vb or (lb == vb and not include_lower):
                return False
        if upper is not None:
            ub = str(upper).encode()
            if vb > ub or (vb == ub and not include_upper):
                return False
        return True

    def wildcard_query(self, pattern: str,
                       case_insensitive: bool = False) -> bool:
        if self.value is None:
            return False
        return _simple_match(pattern, self.value, case_insensitive)

    def prefix_query(self, prefix: str,
                     case_insensitive: bool = False) -> bool:
        if self.value is None:
            return False
        v, p = self.value, prefix
        if case_insensitive:
            v, p = v.lower(), p.lower()
        return v.startswith(p)

    def fuzzy_query(self, term: str, fuzziness="AUTO",
                    prefix_length: int = 0,
                    transpositions: bool = True) -> bool:
        """:208-241 — accept iff the constant lies within the edit
        automaton of the term (prefix chars must match exactly)."""
        if self.value is None:
            return False
        from elasticsearch_ray.search.engine import (_auto_fuzziness,
                                                     _edit_distance_le)
        maxd = (_auto_fuzziness(term) if fuzziness == "AUTO"
                else int(fuzziness))
        pl = min(prefix_length, len(term))
        if self.value[:pl] != term[:pl]:
            return False
        a, b = term[pl:], self.value[pl:]
        if transpositions:
            return _edit_distance_le(a, b, maxd)
        # plain Levenshtein when transpositions are disabled
        from elasticsearch_ray.ops.text_structure import _levenshtein
        return _levenshtein(a, b) <= maxd

    def regexp_query(self, regexp: str) -> bool:
        """Anchored whole-value regex (python re syntax — the same
        convention as this repo's RegexpQuery term-dict scan)."""
        if self.value is None:
            return False
        import re

        return re.fullmatch(regexp, self.value) is not None


# ------------------------------------------------- token_count mapper


def token_count_column(ds: Dataset, text_col: str,
                       analyzer: str = "standard",
                       out_col: str = "token_count",
                       enable_position_increments: bool = True) -> Dataset:
    """``token_count`` field type (``modules/mapper-extras/.../
    TokenCountFieldMapper.java:167,182`` — countPositions over the
    analyzer stream). With position increments enabled (the default)
    LEADING and INTERIOR stopword holes count (positions[-1]+1 over the
    surviving positions). Documented divergence: the reference also adds
    the end-of-stream increment after ``stream.end()``, so TRAILING
    holes count there but not here — the analyzer protocol returns only
    surviving token positions (review r5 #4).

    Stateless map_batches stage; the analyzer loads once per worker via
    the module-level analyzer cache."""
    from elasticsearch_ray.analysis.analyzers import get_analyzer

    def count(batch: pa.Table) -> pa.Table:
        an = get_analyzer(analyzer)
        texts = batch[text_col].to_pylist()
        counts = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks, positions = an(t or "")[:2]
            if enable_position_increments and positions is not None \
                    and len(positions):
                counts[i] = int(positions[-1]) + 1
            else:
                counts[i] = len(toks)
        return batch.append_column(out_col, pa.array(counts))

    return ds.map_batches(count, batch_format="pyarrow")


# ---------------------------------------------------- murmur3 mapper


def _murmur3_x64_128_h1(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x64 128 h1 (public algorithm, Austin Appleby) — the
    value the ``murmur3`` field type stores
    (``plugins/mapper-murmur3/.../Murmur3FieldMapper.java:128``: hash128
    seed 0, keep h1). Signed int64 like the Java long."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    m = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & m

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & m
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & m
        k ^= k >> 33
        return k

    h1 = h2 = seed & m
    n = len(data)
    nblocks = n // 16
    for b in range(nblocks):
        k1 = int.from_bytes(data[b * 16:b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8:b * 16 + 16], "little")
        k1 = (k1 * c1) & m
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & m
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & m
        h1 = (h1 * 5 + 0x52DCE729) & m
        k2 = (k2 * c2) & m
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & m
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & m
        h2 = (h2 * 5 + 0x38495AB5) & m
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * c2) & m
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & m
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * c1) & m
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & m
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & m
    h2 = (h2 + h1) & m
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & m
    out = h1
    return out - (1 << 64) if out >= (1 << 63) else out


def murmur3_column(ds: Dataset, col: str,
                   out_col: str | None = None) -> Dataset:
    """``murmur3`` field type: store hash128(value).h1 alongside the
    value so cardinality aggs hash once at index time (the mapper's whole
    point). Stable across processes/workers (unlike Python hash())."""
    out_col = out_col or f"{col}.hash"

    def add(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        hs = [None if v is None else
              _murmur3_x64_128_h1(str(v).encode("utf-8"))
              for v in vals]
        return batch.append_column(out_col, pa.array(hs, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


# ----------------------------------------------------------- scaled_float
# mapper-extras ScaledFloatFieldMapper.java — doubles stored as
# ``Math.round(value * scaling_factor)`` longs; range bounds scale with
# ceil (lower) / floor (upper), exclusive bounds step one ulp first
# (nextUp/nextDown); doc values decode as scaled / factor, so aggs and
# sorts see the quantized value (the field's documented precision-loss
# contract).


def scaled_encode(values: np.ndarray, factor: float) -> np.ndarray:
    """Java ``Math.round(v * factor)`` = floor(v*factor + 0.5) as int64
    (half-up for negatives too — unlike numpy's half-even round)."""
    v = np.asarray(values, dtype=np.float64) * float(factor)
    return np.floor(v + 0.5).astype(np.int64)


def scaled_decode(scaled: np.ndarray, factor: float) -> np.ndarray:
    return np.asarray(scaled, dtype=np.float64) / float(factor)


def add_scaled_float(ds: Dataset, col: str, factor: float,
                     out_col: str | None = None) -> Dataset:
    """Index-time encode: append the long carrier column (default
    ``<col>_scaled``)."""
    out_col = out_col or f"{col}_scaled"

    def enc(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col, pa.array(scaled_encode(vals, factor), pa.int64()))

    return ds.map_batches(enc, batch_format="pyarrow")


def scaled_float_range(ds: Dataset, col: str, factor: float,
                       gte: float | None = None, lte: float | None = None,
                       gt: float | None = None, lt: float | None = None,
                       scaled_col: str | None = None) -> Dataset:
    """Range query over the encoded column with the reference's exact
    bound scaling (ScaledFloatFieldMapper#rangeQuery): lower =
    round(ceil(v*f)) (nextUp first when exclusive), upper =
    round(floor(v*f)) (nextDown first when exclusive)."""
    scaled_col = scaled_col or f"{col}_scaled"
    lo_b = hi_b = None
    if gte is not None:
        lo_b = int(np.ceil(gte * float(factor)))
    if gt is not None:
        v = np.nextafter(gt * float(factor), np.inf)
        lo_b = max(lo_b, int(np.ceil(v))) if lo_b is not None else int(np.ceil(v))
    if lte is not None:
        hi_b = int(np.floor(lte * float(factor)))
    if lt is not None:
        v = np.nextafter(lt * float(factor), -np.inf)
        hi_b = min(hi_b, int(np.floor(v))) if hi_b is not None else int(np.floor(v))

    def keep(batch: pa.Table) -> pa.Table:
        s = batch[scaled_col].to_numpy(zero_copy_only=False)
        mask = np.ones(len(s), dtype=bool)
        if lo_b is not None:
            mask &= s >= lo_b
        if hi_b is not None:
            mask &= s <= hi_b
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def scaled_float_stats(ds: Dataset, col: str, factor: float,
                       scaled_col: str | None = None) -> dict:
    """Metric aggs over the DECODED doc values (scaled / factor) — per the
    reference, aggregations see the quantized value, not the original.
    One map-side partial pass (count/sum/min/max of decoded), driver
    combine."""
    scaled_col = scaled_col or f"{col}_scaled"

    def partial(batch: pa.Table) -> pa.Table:
        d = scaled_decode(batch[scaled_col].to_numpy(zero_copy_only=False),
                          factor)
        if len(d) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"n": [int(len(d))], "s": [float(d.sum())],
                         "mn": [float(d.min())], "mx": [float(d.max())]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or parts["n"].sum() == 0:
        return {"count": 0, "sum": 0.0, "min": None, "max": None, "avg": None}
    n = int(parts["n"].sum())
    s = float(parts["s"].sum())
    return {"count": n, "sum": s, "min": float(parts["mn"].min()),
            "max": float(parts["mx"].max()), "avg": s / n}
