"""x-pack ML anomaly detection jobs — distributed bucketing + scoring.

Reference surfaces (config/result schemas are faithful; the probability
model is a documented simplification, see below):

- ``x-pack/plugin/core/.../ml/job/config/Detector.java`` /
  ``DetectorFunction.java`` — detector = (function, field_name,
  by_field_name, partition_field_name). The full function enum is
  supported except LAT_LONG (geo, SURVEY ⛔): count/nzc/dc families with
  low/high sidedness and the nzc/dc shortcut spellings, rare + freq_rare,
  info_content, metric, mean/avg/median/min/max/sum/non_null_sum/varp
  families, time_of_day/time_of_week. Empty buckets emit no record (the
  sparse datafeed contract), so plain count/sum coincide with their
  non_zero/non_null variants here — documented simplification; the config
  distinction is preserved for parity.
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

# the full DetectorFunction.java enum minus LAT_LONG (geo — out of scope
# per SURVEY). avg == mean; shortcut spellings (nzc/dc) normalize on entry.
_FUNCS = (
    "count", "low_count", "high_count",
    "non_zero_count", "low_non_zero_count", "high_non_zero_count",
    "distinct_count", "low_distinct_count", "high_distinct_count",
    "rare", "freq_rare",
    "info_content", "low_info_content", "high_info_content",
    "metric",
    "mean", "low_mean", "high_mean",
    "avg", "low_avg", "high_avg",
    "median", "low_median", "high_median",
    "min", "max",
    "sum", "low_sum", "high_sum",
    "non_null_sum", "low_non_null_sum", "high_non_null_sum",
    "varp", "low_varp", "high_varp",
    "time_of_day", "time_of_week",
)

# DetectorFunction.java shortcut spellings
_SHORTCUTS = {
    "nzc": "non_zero_count", "low_nzc": "low_non_zero_count",
    "high_nzc": "high_non_zero_count",
    "dc": "distinct_count", "low_dc": "low_distinct_count",
    "high_dc": "high_distinct_count",
}

# functions whose partials ship raw (bucket, series, value) rows instead of
# sufficient statistics — exact per-bucket reduction needs the values
# themselves (the reference's autodetect is a single process per job and
# sees every row too; here only these detectors' columns travel)
_RAW_FUNCS = {"distinct_count", "median", "info_content"}
# count-shaped functions (no field aggregation; empty buckets emit no
# record — the datafeed's sparse-bucket contract, so plain count behaves
# like non_zero_count here; documented simplification)
_COUNT_FUNCS = {"count", "non_zero_count", "rare", "freq_rare"}
# no-field functions
_NO_FIELD = {"count", "non_zero_count", "rare", "freq_rare",
             "time_of_day", "time_of_week"}


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
        detectors = [dict(d) for d in detectors]
        for d in detectors:
            d["function"] = _SHORTCUTS.get(d.get("function"), d.get("function"))
            if d["function"] not in _FUNCS:
                raise ValueError(f"unsupported function {d.get('function')!r}")
            base, _ = _base_func(d["function"])
            if base in ("rare", "freq_rare"):
                # Detector.java: rare functions categorize on by_field and
                # take no field_name
                if not d.get("by_field_name"):
                    raise ValueError(f"{d['function']} requires by_field_name")
                if d.get("field_name"):
                    raise ValueError(f"{d['function']} takes no field_name")
            elif base not in _NO_FIELD and not d.get("field_name"):
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
        if base in _COUNT_FUNCS:
            g["v"] = 1.0
            agg = g.groupby(["bucket", *keys], sort=False).agg(
                n=("v", "size"))
        elif base in _RAW_FUNCS:
            # raw (bucket, series, value) rows; exact reduction at combine.
            # distinct_count dedupes per batch already (the only dedup-safe
            # one); median/info_content need every value.
            # medians ride a separate numeric column so a job mixing
            # median with distinct_count/info_content keeps a clean
            # Arrow schema (no object-typed union column)
            if base == "median":
                g["val_num"] = pd.to_numeric(df[d["field_name"]],
                                             errors="coerce")
                g = g.dropna(subset=["val_num"])
                agg = g[["bucket", *keys, "val_num"]]
            else:
                g["val"] = df[d["field_name"]].astype(str)
                agg = g[["bucket", *keys, "val"]]
                if base == "distinct_count":
                    agg = agg.drop_duplicates(
                        subset=["bucket", *keys, "val"])
            agg = agg.copy()
            agg["detector"] = di
            out.append(agg)
            continue
        elif base in ("time_of_day", "time_of_week"):
            # offset of each event inside its day/week (seconds); the
            # bucket actual is the mean offset — (n, s) partials suffice
            off = (ts - ts.dt.normalize()).dt.total_seconds()
            if base == "time_of_week":
                off = off + ts.dt.dayofweek.astype(float) * 86400.0
            g["v"] = off
            agg = g.groupby(["bucket", *keys], sort=False).agg(
                n=("v", "size"), s=("v", "sum"))
        else:
            g["v"] = pd.to_numeric(df[d["field_name"]], errors="coerce")
            g = g.dropna(subset=["v"])
            g["v2"] = g["v"] ** 2
            agg = g.groupby(["bucket", *keys], sort=False).agg(
                n=("v", "size"), s=("v", "sum"), ss=("v2", "sum"),
                mn=("v", "min"), mx=("v", "max"))
        agg = agg.reset_index()
        agg["detector"] = di
        out.append(agg)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _reduce_detector(parts: pd.DataFrame, d: dict, di: int,
                     base_override: str | None = None) -> pd.DataFrame:
    """Combine partials of one detector → (bucket, series, actual).
    ``base_override`` lets the ``metric`` shorthand reduce its own partials
    three ways (mean/min/max)."""
    base = base_override or _base_func(d["function"])[0]
    keys = _series_cols(d)
    sub = parts[parts["detector"] == di]
    if base in _COUNT_FUNCS:
        r = sub.groupby(["bucket", *keys], sort=True)["n"].sum() \
            .rename("actual").reset_index()
    elif base == "distinct_count":
        r = (sub.drop_duplicates(subset=["bucket", *keys, "val"])
             .groupby(["bucket", *keys], sort=True)["val"].size()
             .rename("actual").astype(float).reset_index())
    elif base == "median":
        r = (sub.groupby(["bucket", *keys], sort=True)["val_num"].median()
             .rename("actual").reset_index())
    elif base == "info_content":
        # ml-cpp CInfoContent measures the compressed size of the bucket's
        # field values; analog: zlib length of the newline-joined values in
        # sorted order (sorted for determinism — partial batch order isn't)
        import zlib

        r = (sub.groupby(["bucket", *keys], sort=True)["val"]
             .agg(lambda v: float(len(zlib.compress(
                 "\n".join(sorted(v)).encode("utf-8")))))
             .rename("actual").reset_index())
    elif base in ("time_of_day", "time_of_week"):
        g = sub.groupby(["bucket", *keys], sort=True).agg(
            n=("n", "sum"), s=("s", "sum"))
        g["actual"] = g["s"] / g["n"]
        r = g.reset_index()[["bucket", *keys, "actual"]]
    else:
        g = sub.groupby(["bucket", *keys], sort=True).agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"),
            mn=("mn", "min"), mx=("mx", "max"))
        if base in ("mean", "avg"):
            g["actual"] = g["s"] / g["n"]
        elif base in ("sum", "non_null_sum"):
            g["actual"] = g["s"]
        elif base == "min":
            g["actual"] = g["mn"]
        elif base == "max":
            g["actual"] = g["mx"]
        elif base == "varp":
            # population variance from associative (n, Σv, Σv²)
            g["actual"] = g["ss"] / g["n"] - (g["s"] / g["n"]) ** 2
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
        base, side = _base_func(d["function"])
        if base in ("rare", "freq_rare"):
            _score_rare(reduced, job, d, di, records, series_rows)
            continue
        if base == "metric":
            # DetectorFunction METRIC: models mean, min and max together
            # and reports the most anomalous of the three per bucket
            cand = []
            for sub_base in ("mean", "min", "max"):
                r = _reduce_detector(reduced, d, di, base_override=sub_base)
                sub = []
                _score_gaussian(r, job, d, di, "both", keys, sub, [])
                cand.extend(sub)
            if cand:
                cf = pd.DataFrame(cand)
                gk = ["timestamp"] + [c for c in
                                      ("partition_field_value",
                                       "by_field_value") if c in cf.columns]
                best = cf.loc[cf.groupby(gk, sort=False)["record_score"]
                              .idxmax()]
                records.extend(best.to_dict("records"))
            continue
        r = _reduce_detector(reduced, d, di)
        if r.empty:
            continue
        _score_gaussian(r, job, d, di, side, keys, records, series_rows)
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


def _score_gaussian(r: pd.DataFrame, job: AnomalyJob, d: dict, di: int,
                    side: str, keys: list[str], records: list,
                    series_rows: list) -> None:
    """Gaussian-baseline scoring of one detector's reduced frame (see
    module docstring); appends AnomalyRecord rows / series baselines."""
    if r.empty:
        return
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


def _score_rare(reduced: pd.DataFrame, job: AnomalyJob, d: dict, di: int,
                records: list, series_rows: list) -> None:
    """RARE / FREQ_RARE scoring. The reference models category rarity in
    ml-cpp (CIndividualModel over by-field categories); analog: a by-field
    value's probability is its BUCKET-PRESENCE RATIO within its partition
    (buckets where it appears / buckets the partition has) — a value seen
    in every bucket is unsurprising (p=1, score 0), one seen in a single
    bucket of many is rare. FREQ_RARE additionally divides by the in-bucket
    occurrence count (a rare value arriving MANY times at once is more
    anomalous — the function's documented population emphasis)."""
    base, _ = _base_func(d["function"])
    by = d["by_field_name"]
    part = d.get("partition_field_name")
    pk = [part] if part else []
    r = _reduce_detector(reduced, d, di)  # (bucket, [part], by, actual=count)
    if r.empty:
        return
    if pk:
        total = r.groupby(pk, sort=False)["bucket"].nunique()
        tot = r[part].map(total).to_numpy(float)
    else:
        tot = np.full(len(r), float(r["bucket"].nunique()))
    presence = r.groupby([*pk, by], sort=False)["bucket"].transform("nunique")
    p = presence.to_numpy(float) / tot
    if base == "freq_rare":
        p = p / np.maximum(r["actual"].to_numpy(float), 1.0)
    p = np.clip(p, 1e-300, 1.0)
    score = np.minimum(100.0, -10.0 * np.log10(p))
    seen = set()
    for i, (_, row) in enumerate(r.iterrows()):
        skey = tuple(row[k] for k in (*pk, by))
        if skey not in seen:
            seen.add(skey)
            series_rows.append({
                **{k: row[k] for k in pk}, by: row[by], "detector": di,
                "typical": 0.0, "sd": 0.0,
                "n_buckets": int(presence.iloc[i])})
        rec = {
            "job_id": job.job_id,
            "timestamp": row["bucket"],
            "bucket_span": job.bucket_span.total_seconds(),
            "detector_index": di,
            "function": d["function"],
            "field_name": None,
            "actual": float(row["actual"]),
            "typical": 0.0,
            "probability": float(p[i]),
            "record_score": float(score[i]),
            "by_field_name": by,
            "by_field_value": row[by],
        }
        if part:
            rec["partition_field_name"] = part
            rec["partition_field_value"] = row[part]
        records.append(rec)


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
