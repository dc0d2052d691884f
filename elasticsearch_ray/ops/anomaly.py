"""x-pack ML anomaly detection jobs — distributed bucketing + scoring.

Reference surfaces (config/result schemas are faithful; the probability
model is a documented simplification, see below):

- ``x-pack/plugin/core/.../ml/job/config/Detector.java`` — detector =
  (function, field_name, by_field_name, partition_field_name); supported
  functions here: count, low_count, high_count, mean, low_mean, high_mean,
  min, max, sum, low_sum, high_sum, distinct_count.
- ``AnalysisConfig.java`` — bucket_span slices the time axis; every
  detector runs per (partition_field value × by_field value) series.
- ``ml/job/results/AnomalyRecord.java`` — per-(bucket, series) records
  carry probability, record_score, actual, typical, function and the
  by/partition field names/values; ``Bucket.java`` — per-bucket
  anomaly_score + event_count.

Probability model: the reference's model lives in the native ml-cpp repo
(github.com/elastic/ml-cpp, CAnomalyDetector/CAnomalyScore) as an adaptive
mixture with periodicity decomposition. This implementation fits a GAUSSIAN
baseline per series (mean/σ over its bucket values) and takes the one- or
two-sided tail probability (``low_*`` = left tail, ``high_*`` = right tail,
plain = two-sided — Detector.java's documented low/high semantics);
``record_score = min(100, -10·log10(p))`` is a monotone stand-in for
ml-cpp's CAnomalyScore normalization, and the bucket ``anomaly_score`` is
the max record score in the bucket. Tests pin planted-anomaly behavior, and
the driver oracle checks the SQL-expressible half (bucket aggregates +
z-scores) exactly.

Ray shape: one ``map_batches`` pass emits per-batch PARTIAL sufficient
statistics per (bucket, series) — count/sum/sumsq/min/max (and distinct
pairs for distinct_count) — which are reduced on the driver; the reduced
frame is #buckets × #series rows, tiny relative to the input. No per-row
Python, no all-to-all shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_FUNCS = ("count", "low_count", "high_count", "mean", "low_mean",
          "high_mean", "min", "max", "sum", "low_sum", "high_sum",
          "distinct_count")


def _base_func(fn: str) -> tuple[str, str]:
    """(aggregate, side) — side ∈ {'low','high','both'}."""
    if fn.startswith("low_"):
        return fn[4:], "low"
    if fn.startswith("high_"):
        return fn[5:], "high"
    return fn, "both"


class AnomalyJob:
    """Job config (Job.java / AnalysisConfig.java subset)."""

    def __init__(self, job_id: str, bucket_span: str = "1h",
                 detectors: list[dict] | None = None,
                 time_field: str = "ts"):
        if not detectors:
            raise ValueError("anomaly job needs at least one detector")
        for d in detectors:
            if d.get("function") not in _FUNCS:
                raise ValueError(f"unsupported function {d.get('function')!r}")
            base, _ = _base_func(d["function"])
            if base != "count" and not d.get("field_name"):
                raise ValueError(f"{d['function']} requires field_name")
        self.job_id = job_id
        self.bucket_span = pd.Timedelta(bucket_span)
        self.detectors = [dict(d) for d in detectors]
        self.time_field = time_field


def _series_cols(d: dict) -> list[str]:
    return [c for c in (d.get("partition_field_name"),
                        d.get("by_field_name")) if c]


def _partials(df: pd.DataFrame, job: AnomalyJob) -> pd.DataFrame:
    """Per-batch sufficient statistics for every detector."""
    out = []
    ts = pd.to_datetime(df[job.time_field])
    bucket = ts.dt.floor(job.bucket_span)
    for di, d in enumerate(job.detectors):
        base, _ = _base_func(d["function"])
        keys = _series_cols(d)
        g = pd.DataFrame({"bucket": bucket})
        for k in keys:
            g[k] = df[k].astype(str)
        if base == "count":
            g["v"] = 1.0
            agg = g.groupby(["bucket", *keys], sort=False).agg(
                n=("v", "size"))
        elif base == "distinct_count":
            # distinct (bucket, series, value) rows; final dedupe at reduce
            g["val"] = df[d["field_name"]].astype(str)
            agg = g.drop_duplicates(subset=["bucket", *keys, "val"])[
                ["bucket", *keys, "val"]].copy()
            agg["detector"] = di
            out.append(agg)
            continue
        else:
            g["v"] = pd.to_numeric(df[d["field_name"]], errors="coerce")
            g = g.dropna(subset=["v"])
            agg = g.groupby(["bucket", *keys], sort=False).agg(
                n=("v", "size"), s=("v", "sum"),
                mn=("v", "min"), mx=("v", "max"))
        agg = agg.reset_index()
        agg["detector"] = di
        out.append(agg)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _reduce_detector(parts: pd.DataFrame, d: dict, di: int) -> pd.DataFrame:
    """Combine partials of one detector → (bucket, series, actual)."""
    base, _ = _base_func(d["function"])
    keys = _series_cols(d)
    sub = parts[parts["detector"] == di]
    if base == "count":
        r = sub.groupby(["bucket", *keys], sort=True)["n"].sum() \
            .rename("actual").reset_index()
    elif base == "distinct_count":
        r = (sub.drop_duplicates(subset=["bucket", *keys, "val"])
             .groupby(["bucket", *keys], sort=True)["val"].size()
             .rename("actual").astype(float).reset_index())
    else:
        g = sub.groupby(["bucket", *keys], sort=True).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
            mx=("mx", "max"))
        if base == "mean":
            g["actual"] = g["s"] / g["n"]
        elif base == "sum":
            g["actual"] = g["s"]
        elif base == "min":
            g["actual"] = g["mn"]
        elif base == "max":
            g["actual"] = g["mx"]
        r = g.reset_index()[["bucket", *keys, "actual"]]
    r["actual"] = r["actual"].astype(float)
    return r


def _phi(z: np.ndarray) -> np.ndarray:
    """Standard normal CDF via erf (vectorized)."""
    return 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2.0)))


def run_anomaly_job(ds, job: AnomalyJob) -> dict:
    """Execute the job over a Ray Dataset; returns {"records", "buckets",
    "series"} pandas frames (AnomalyRecord / Bucket result schemas)."""
    # one streaming pass; per-batch partials are tiny relative to input
    reduced = ds.map_batches(
        lambda df: _partials(df, job), batch_format="pandas").to_pandas()
    return score_reduced(reduced, job)


def score_reduced(reduced: pd.DataFrame, job: AnomalyJob) -> dict:
    """Scoring half: combine a partials frame (any granularity whose
    buckets floor onto the job's) and emit records/buckets/series —
    shared by the direct path and the aggregated-datafeed path
    (ops/datafeed.py), whose sufficient statistics are associative."""
    records = []
    series_rows = []
    for di, d in enumerate(job.detectors):
        keys = _series_cols(d)
        r = _reduce_detector(reduced, d, di)
        if r.empty:
            continue
        base, side = _base_func(d["function"])
        # Gaussian baseline per series (see module docstring)
        grp = r.groupby(keys, sort=True) if keys else [((), r)]
        for kv, g in grp:
            vals = g["actual"].to_numpy(float)
            mu = float(vals.mean())
            sd = float(vals.std(ddof=1)) if len(vals) > 1 else 0.0
            kv = kv if isinstance(kv, tuple) else (kv,)
            series_rows.append({**dict(zip(keys, kv)), "detector": di,
                                "typical": mu, "sd": sd,
                                "n_buckets": len(vals)})
            if sd == 0.0:
                p = np.where(vals == mu, 1.0, 1e-300)
            else:
                z = (vals - mu) / sd
                if side == "low":
                    p = _phi(z)
                elif side == "high":
                    p = 1.0 - _phi(z)
                else:
                    p = 2.0 * (1.0 - _phi(np.abs(z)))
                p = np.clip(p, 1e-300, 1.0)
            score = np.minimum(100.0, -10.0 * np.log10(p))
            for i, (_, row) in enumerate(g.iterrows()):
                rec = {
                    "job_id": job.job_id,
                    "timestamp": row["bucket"],
                    "bucket_span": job.bucket_span.total_seconds(),
                    "detector_index": di,
                    "function": d["function"],
                    "field_name": d.get("field_name"),
                    "actual": float(row["actual"]),
                    "typical": mu,
                    "probability": float(p[i]),
                    "record_score": float(score[i]),
                }
                if d.get("partition_field_name"):
                    rec["partition_field_name"] = d["partition_field_name"]
                    rec["partition_field_value"] = row[d["partition_field_name"]]
                if d.get("by_field_name"):
                    rec["by_field_name"] = d["by_field_name"]
                    rec["by_field_value"] = row[d["by_field_name"]]
                records.append(rec)
    rec_df = pd.DataFrame(records)
    if len(rec_df):
        buckets = (rec_df.groupby("timestamp", sort=True)
                   .agg(anomaly_score=("record_score", "max"),
                        record_count=("record_score", "size"))
                   .reset_index())
        buckets["job_id"] = job.job_id
        buckets["bucket_span"] = job.bucket_span.total_seconds()
    else:
        buckets = pd.DataFrame(
            columns=["timestamp", "anomaly_score", "record_count"])
    return {"records": rec_df, "buckets": buckets,
            "series": pd.DataFrame(series_rows)}


def get_records(result: dict, record_score: float = 0.0) -> pd.DataFrame:
    """GET anomaly_detectors/<id>/results/records analog (score floor,
    sorted by record_score desc like the API default)."""
    r = result["records"]
    r = r[r["record_score"] >= record_score]
    return r.sort_values(["record_score", "timestamp"],
                         ascending=[False, True], ignore_index=True)


def forecast(result: dict, job: AnomalyJob, horizon: int,
             confidence: float = 0.95,
             forecast_id: str = "forecast-1") -> dict:
    """_forecast API analog (``x-pack/plugin/core/.../ml/job/results/
    Forecast.java`` result schema: forecast_prediction / forecast_lower /
    forecast_upper per (series, future bucket); ``ForecastRequestStats``
    meta). The reference's projection model lives in native ml-cpp
    (CForecastRunner / CTimeSeriesModel); this analog fits an ordinary
    least-squares level+trend per series over its bucket history and
    widens the bounds with the standard OLS prediction interval
    ``s·z·sqrt(1 + 1/n + (x₀-x̄)²/Sxx)`` — monotone-widening like the
    reference's spread.

    ``result`` is :func:`run_anomaly_job` output (the per-series bucket
    actuals are already reduced — forecasting is driver-side math over a
    tiny frame)."""
    from statistics import NormalDist

    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    if not 0.0 < confidence < 1.0:
        raise ValueError("confidence must be in (0, 1)")
    z = NormalDist().inv_cdf(0.5 + confidence / 2.0)
    rec = result["records"]
    rows = []
    if len(rec):
        keys = ["detector_index"] + [c for c in
                                     ("partition_field_value",
                                      "by_field_value") if c in rec.columns]
        span = pd.to_timedelta(rec["bucket_span"].iloc[0], unit="s")
        for kv, g in rec.groupby(keys, sort=True, dropna=False):
            g = g.sort_values("timestamp")
            y = g["actual"].to_numpy(float)
            n = len(y)
            # time axis in bucket-span units from the REAL timestamps —
            # sparse series (empty buckets emit no record) must not
            # compress the trend or mislabel the projection (review r5 #7)
            ts = pd.to_datetime(g["timestamp"])
            t = ((ts - ts.iloc[0]) / span).to_numpy(float)
            if n >= 3:
                b, a = np.polyfit(t, y, 1)
                resid = y - (a + b * t)
                s = float(np.sqrt((resid ** 2).sum() / (n - 2)))
                tbar = t.mean()
                sxx = float(((t - tbar) ** 2).sum())
            else:
                a, b = float(y.mean()), 0.0
                s, tbar, sxx = float(y.std() or 0.0), 0.0, 1.0
            last_ts = g["timestamp"].iloc[-1]
            kv = kv if isinstance(kv, tuple) else (kv,)
            for h in range(1, horizon + 1):
                x0 = t[-1] + h
                pred = a + b * x0
                se = s * np.sqrt(1.0 + 1.0 / max(n, 1)
                                 + (x0 - tbar) ** 2 / max(sxx, 1e-12))
                rows.append({
                    **dict(zip(keys, kv)),
                    "forecast_id": forecast_id,
                    "timestamp": last_ts + span * h,
                    "forecast_prediction": float(pred),
                    "forecast_lower": float(pred - z * se),
                    "forecast_upper": float(pred + z * se),
                })
    frame = pd.DataFrame(rows)
    stats = {"forecast_id": forecast_id, "status": "finished",
             "processed_record_count": int(len(frame)),
             "forecast_start": str(frame["timestamp"].min())
             if len(frame) else None,
             "forecast_end": str(frame["timestamp"].max())
             if len(frame) else None}
    return {"forecasts": frame, "request_stats": stats}
