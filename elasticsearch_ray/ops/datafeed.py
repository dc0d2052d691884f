"""x-pack ML datafeeds — the extraction layer between an index and an
anomaly job.

Reference surfaces (all public):

- ``x-pack/plugin/core/.../ml/datafeed/DatafeedConfig.java`` — config:
  ``query`` (default match_all), ``frequency``, ``query_delay``,
  ``aggregations`` (date_histogram-rooted), ``chunking_config``;
  ``defaultChunkingConfig``: aggregated feeds auto-chunk at
  1000 × histogram interval.
- ``DatafeedJobValidator.java`` — when aggregated, the histogram
  interval must be ≤ the job ``bucket_span`` and divide it evenly;
  ``frequency`` likewise must divide the bucket span.
- ``DatafeedTimingStats.java`` — search_count / bucket_count /
  total_search_time_ms reported per datafeed.

Ray shape: the query filter is a vectorized mask inside the SAME
streaming pass that computes the job's sufficient-statistic partials —
no separate extraction materialization. The "aggregated datafeed" path
computes partials at the (finer) histogram interval and re-floors them
onto job buckets before the shared scoring reduce
(:func:`ops.anomaly.score_reduced`); count/sum/min/max/mean partials
are associative, so the result is identical to the direct path — the
interval knob controls only intermediate granularity, exactly the
reference's contract that an aggregated feed must reproduce the raw
feed's buckets. ``distinct_count`` detectors reject aggregation (no
mergeable sketch in the fine rows), mirroring the validator's
constraints on non-composable aggs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from elasticsearch_ray.ops.anomaly import (
    AnomalyJob,
    _base_func,
    _partials,
    score_reduced,
)


class DatafeedConfig:
    """DatafeedConfig.java subset; ``aggregations`` here is
    ``{"date_histogram": {"field": <ts>, "fixed_interval": "30m"}}`` —
    metric sub-aggs are derived from the job's detectors (the reference
    requires them spelled out and validates the shapes match)."""

    def __init__(self, datafeed_id: str, query: dict | None = None,
                 frequency: str | None = None, query_delay: str = "60s",
                 aggregations: dict | None = None,
                 chunking_config: dict | None = None):
        self.datafeed_id = datafeed_id
        self.query = query or {"match_all": {}}
        self.frequency = pd.Timedelta(frequency) if frequency else None
        self.query_delay = pd.Timedelta(query_delay)
        self.aggregations = aggregations
        self.chunking_config = chunking_config or {"mode": "auto"}

    def histogram_interval(self) -> pd.Timedelta | None:
        if not self.aggregations:
            return None
        body = self.aggregations.get("date_histogram")
        if not body or "fixed_interval" not in body:
            raise ValueError(
                "aggregations must be rooted in a fixed_interval "
                "date_histogram (DatafeedConfig.getHistogramIntervalMillis)")
        return pd.Timedelta(body["fixed_interval"])


def validate_datafeed(config: DatafeedConfig, job: AnomalyJob) -> None:
    """DatafeedJobValidator.java checks."""
    span = job.bucket_span
    interval = config.histogram_interval()
    if interval is not None:
        if interval > span:
            raise ValueError(
                f"histogram interval {interval} must not be greater than "
                f"bucket_span {span}")
        if span % interval != pd.Timedelta(0):
            raise ValueError(
                f"bucket_span {span} must be a multiple of the histogram "
                f"interval {interval}")
        for d in job.detectors:
            if _base_func(d["function"])[0] == "distinct_count":
                raise ValueError(
                    "distinct_count detectors cannot run over an "
                    "aggregated datafeed")
    if config.frequency is not None and interval is not None:
        if config.frequency % interval != pd.Timedelta(0):
            raise ValueError(
                "datafeed frequency must be a multiple of the "
                "aggregation interval")


def _query_mask(df: pd.DataFrame, q: dict) -> np.ndarray:
    """Vectorized evaluation of the DSL subset a datafeed query uses:
    match_all / term / terms / range / exists / bool."""
    (kind, body), = q.items()
    n = len(df)
    if kind == "match_all":
        return np.ones(n, bool)
    if kind == "term":
        (f, v), = body.items()
        v = v.get("value") if isinstance(v, dict) else v
        return (df[f] == v).to_numpy(bool)
    if kind == "terms":
        (f, vals), = body.items()
        return df[f].isin(list(vals)).to_numpy(bool)
    if kind == "exists":
        return df[body["field"]].notna().to_numpy(bool)
    if kind == "range":
        (f, conds), = body.items()
        col = df[f]
        if not pd.api.types.is_numeric_dtype(col):
            col = pd.to_datetime(col)
            conds = {op: pd.Timestamp(v) for op, v in conds.items()}
        m = np.ones(n, bool)
        for op, v in conds.items():
            if op == "gte":
                m &= (col >= v).to_numpy(bool)
            elif op == "gt":
                m &= (col > v).to_numpy(bool)
            elif op == "lte":
                m &= (col <= v).to_numpy(bool)
            elif op == "lt":
                m &= (col < v).to_numpy(bool)
            else:
                raise ValueError(f"unsupported range op {op!r}")
        return m
    if kind == "bool":
        m = np.ones(n, bool)
        must = body.get("must", []) + body.get("filter", [])
        for clause in must:
            m &= _query_mask(df, clause)
        for clause in body.get("must_not", []):
            m &= ~_query_mask(df, clause)
        should = body.get("should", [])
        # minimum_should_match defaults to 0 when must/filter clauses
        # exist (BoolQueryBuilder; same rule as search/engine.py) —
        # should is then score-only and never narrows the mask
        if should and not must:
            sm = np.zeros(n, bool)
            for clause in should:
                sm |= _query_mask(df, clause)
            m &= sm
        return m
    raise ValueError(f"unsupported datafeed query {kind!r}")


def run_datafeed(ds, config: DatafeedConfig, job: AnomalyJob) -> dict:
    """Extract + run: one streaming pass computing job partials behind
    the query mask (at the histogram interval when aggregated), then
    the shared scoring reduce. Returns the job result plus
    ``timing_stats`` and the chunked ``search_intervals`` the reference
    extractor would have issued."""
    import time

    validate_datafeed(config, job)
    interval = config.histogram_interval()
    part_job = job if interval is None else AnomalyJob(
        job.job_id, bucket_span=interval, detectors=job.detectors,
        time_field=job.time_field)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        m = _query_mask(df, config.query)
        return _partials(df[m], part_job)

    t0 = time.monotonic()
    reduced = ds.map_batches(extract, batch_format="pandas").to_pandas()
    elapsed_ms = (time.monotonic() - t0) * 1000.0
    if interval is not None and len(reduced):
        # re-floor fine-interval partials onto job buckets; the stats
        # are associative so the downstream groupby-combine is exact
        reduced = reduced.copy()
        reduced["bucket"] = pd.to_datetime(reduced["bucket"]) \
            .dt.floor(job.bucket_span)
    result = score_reduced(reduced, job)

    # chunking plan (DatafeedConfig.defaultChunkingConfig): auto =
    # 1000 × histogram interval for aggregated feeds, 1000 × bucket_span
    # otherwise; manual mode takes time_span verbatim
    mode = config.chunking_config.get("mode", "auto")
    if mode == "off":
        chunk = None
    elif mode == "manual":
        chunk = pd.Timedelta(config.chunking_config["time_span"])
    else:
        chunk = 1000 * (interval if interval is not None
                        else job.bucket_span)
    intervals = []
    if len(reduced):
        lo = pd.to_datetime(reduced["bucket"]).min()
        hi = pd.to_datetime(reduced["bucket"]).max() + job.bucket_span
        if chunk is None:
            intervals = [(lo, hi)]
        else:
            t = lo
            while t < hi:
                intervals.append((t, min(t + chunk, hi)))
                t += chunk
    result["search_intervals"] = intervals
    result["timing_stats"] = {
        "job_id": job.job_id,
        "search_count": max(len(intervals), 1),
        "bucket_count": int(result["buckets"].shape[0]),
        "total_search_time_ms": elapsed_ms,
        "average_search_time_per_bucket_ms": (
            elapsed_ms / max(int(result["buckets"].shape[0]), 1)),
    }
    return result


def preview_datafeed(ds, config: DatafeedConfig, job: AnomalyJob,
                     limit: int = 100) -> pd.DataFrame:
    """``GET _ml/datafeeds/<id>/_preview``
    (TransportPreviewDatafeedAction): the first docs the feed would hand
    the job. Raw feeds return the query-filtered rows restricted to the
    job-relevant fields (time + detector/split fields), time-ascending;
    aggregated feeds return the per-interval aggregated frame the job's
    partials pass would consume — both capped at ``limit`` like the
    API's preview page."""
    validate_datafeed(config, job)
    interval = config.histogram_interval()
    if interval is not None:
        part_job = AnomalyJob(job.job_id, bucket_span=interval,
                              detectors=job.detectors,
                              time_field=job.time_field)

        def extract(df: pd.DataFrame) -> pd.DataFrame:
            m = _query_mask(df, config.query)
            return _partials(df[m], part_job)

        out = ds.map_batches(extract, batch_format="pandas") \
            .to_pandas()
        return out.sort_values("bucket", ignore_index=True).head(limit)

    cols = [job.time_field]
    for d in job.detectors:
        for key in ("field_name", "by_field_name",
                    "partition_field_name"):
            f = d.get(key)
            if f and f not in cols:
                cols.append(f)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = _query_mask(df, config.query)
        present = [c for c in cols if c in df.columns]
        return df.loc[m, present]

    # stream only until the preview page is full (limit() stops the
    # executor early — no full-table extraction for a 100-row preview)
    import ray.data  # noqa: F401  (ds is already a Dataset)

    out = ds.map_batches(keep, batch_format="pandas").limit(
        max(limit * 5, limit)).to_pandas()
    return out.sort_values(job.time_field,
                           ignore_index=True).head(limit)
