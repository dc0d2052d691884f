"""``histogram`` field type — pre-aggregated per-doc histograms.

Reference semantics: ``x-pack/plugin/analytics/src/main/java/org/elasticsearch/
xpack/analytics/mapper/HistogramFieldMapper.java`` — a doc carries parallel
arrays ``values`` (doubles, strictly increasing) and ``counts`` (longs,
>= 0, same length); the mapper rejects anything else. Aggregations read the
sketch instead of raw docs:

- ``HistoBackedSumAggregator.java:86`` — sum = Σ value·count (Kahan);
- ``HistoBackedValueCountAggregator``   — value_count = Σ count;
- ``HistoBackedAvgAggregator``          — avg = sum / value_count;
- ``HistoBackedMinAggregator.java:75-79`` / Max — min/max over the STORED
  values (counts not consulted, matching the reference loop);
- ``AbstractHistoBackedTDigestPercentilesAggregator`` — each (value, count)
  pair feeds the t-digest as a weighted centroid;
- histogram bucketing over a histogram field adds ``count`` to the
  ``floor(value/interval)·interval`` bucket (HistogramValuesSource).

Ray-Data shape: histogram docs are (key, values: list<double>, counts:
list<int64>) rows. Building them from raw rows is ONE groupby().map_groups
(the only shuffle); every aggregation over the pre-agg table is a
map_batches partial (flatten the list columns zero-copy via
``ListArray.flatten`` + numpy) followed by a tiny driver combine — the
whole point of the field type: the 100-TB raw table is aggregated once
into compact sketches, and every later query touches only sketch bytes.
The agg-over-preagg == agg-over-raw contract (exact for sum/value_count/
min/max/avg and for histogram bucketing when the histogram was built
losslessly) is what the oracle pins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from elasticsearch_ray.ops.tdigest import TDigest


def validate_histogram(values: np.ndarray, counts: np.ndarray) -> None:
    """HistogramFieldMapper.parse validations."""
    if len(values) != len(counts):
        raise ValueError(
            "expected same length from [values] and [counts] but got "
            f"[{len(values)} != {len(counts)}]")
    if np.any(np.asarray(counts) < 0):
        raise ValueError("[counts] elements must be >= 0")
    v = np.asarray(values, np.float64)
    if len(v) > 1 and np.any(np.diff(v) <= 0):
        raise ValueError("values must be in increasing order")


def build_histogram_docs(ds, key_col: str, value_col: str,
                         decimals: int | None = None):
    """Pre-aggregate raw rows into one histogram doc per key (the ingest
    shape the mapper expects). ``decimals`` optionally rounds values first
    (a lossy sketch, like rollup ingestion does); None keeps raw doubles.
    One groupby shuffle; per-group work is a vectorized np.unique."""
    def agg(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        if decimals is not None:
            v = np.round(v, decimals)
        vals, cnts = np.unique(v, return_counts=True)
        return pd.DataFrame({
            key_col: [df[key_col].iloc[0]],
            "values": [vals.tolist()],
            "counts": [cnts.astype(np.int64).tolist()],
        })

    return ds.groupby(key_col).map_groups(agg, batch_format="pandas")


def _flat(batch: pa.Table, values_col: str,
          counts_col: str) -> tuple[np.ndarray, np.ndarray]:
    v = batch[values_col].combine_chunks()
    c = batch[counts_col].combine_chunks()
    if isinstance(v, pa.ChunkedArray):
        v = v.chunk(0) if v.num_chunks else pa.array([], pa.list_(pa.float64()))
    if isinstance(c, pa.ChunkedArray):
        c = c.chunk(0) if c.num_chunks else pa.array([], pa.list_(pa.int64()))
    return (v.flatten().to_numpy(zero_copy_only=False).astype(np.float64),
            c.flatten().to_numpy(zero_copy_only=False).astype(np.float64))


def histogram_stats(ds, values_col: str = "values",
                    counts_col: str = "counts") -> dict:
    """min/max/sum/value_count/avg over a histogram column — per-batch
    partials, driver combine."""
    def part(batch: pa.Table) -> pa.Table:
        v, c = _flat(batch, values_col, counts_col)
        if len(v) != len(c):
            raise ValueError("values/counts length mismatch in batch")
        return pa.table({
            "sum": pa.array([float(np.sum(v * c)) if len(v) else 0.0]),
            "count": pa.array([float(np.sum(c)) if len(c) else 0.0]),
            "min": pa.array([float(np.min(v)) if len(v) else np.inf]),
            "max": pa.array([float(np.max(v)) if len(v) else -np.inf]),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    total = float(parts["count"].sum())
    s = float(parts["sum"].sum())
    return {
        "sum": s,
        "value_count": int(total),
        "min": float(parts["min"].min()) if len(parts) else float("inf"),
        "max": float(parts["max"].max()) if len(parts) else float("-inf"),
        "avg": s / total if total else float("nan"),
    }


def histogram_bucket_agg(ds, interval: float, values_col: str = "values",
                         counts_col: str = "counts") -> pd.DataFrame:
    """histogram agg over histogram fields: each centroid adds its count to
    the floor-aligned bucket. Exact (SQL-expressible) — per-batch bucketed
    partials, small driver combine."""
    def part(batch: pa.Table) -> pa.Table:
        v, c = _flat(batch, values_col, counts_col)
        b = np.floor(v / interval) * interval
        ub, inv = np.unique(b, return_inverse=True)
        dc = np.bincount(inv, weights=c, minlength=len(ub))
        return pa.table({"bucket": pa.array(ub),
                         "doc_count": pa.array(dc)})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    out = parts.groupby("bucket", as_index=False)["doc_count"].sum()
    out["doc_count"] = out["doc_count"].astype(np.int64)
    return out.sort_values("bucket", ignore_index=True)


def histogram_percentiles(ds, percents, values_col: str = "values",
                          counts_col: str = "counts",
                          delta: float = 100.0) -> dict:
    """t-digest percentiles over histogram fields: (value, count) pairs are
    weighted centroids (AbstractHistoBackedTDigestPercentilesAggregator) —
    one sketch per batch, driver merge."""
    def part(batch: pa.Table) -> pa.Table:
        v, c = _flat(batch, values_col, counts_col)
        keep = c > 0
        td = TDigest(delta=delta, means=v[keep].copy(),
                     weights=c[keep].copy())
        td._compress()
        return pa.table({"sketch": pa.array([td.to_bytes()],
                                            pa.binary())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    acc = TDigest(delta=delta)
    for b in parts["sketch"]:
        acc.merge(TDigest.from_bytes(b))
    return {f"{float(p):g}": acc.quantile(float(p) / 100.0)
            for p in percents}
