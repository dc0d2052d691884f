"""x-pack analytics metric aggregations, Ray-Data-shaped
(`x-pack/plugin/analytics/src/main/java/org/elasticsearch/xpack/analytics/`):

- string_stats (`stringstats/InternalStringStats.java`): count, min/max/
  avg length, Shannon ENTROPY over the character distribution (+ optional
  distribution). Partials are (count, sum_len, min, max, per-char counts)
  per batch — char vocab is tiny, so the reduce is trivial.
- boxplot (`boxplot/InternalBoxplot.java`): min/max/q1/q2/q3 from the
  mergeable t-digest (the reference backs boxplot with TDigestState) plus
  IQR whiskers clamped to observed values.
- t_test (`ttest/TTestAggregationBuilder.java`): paired /
  homoscedastic / heteroscedastic (Welch) two-sample t-test p-value.
  Moment partials (n, Σx, Σx²) merge exactly; the two-sided p-value uses
  the Student-t CDF via the regularized incomplete beta function,
  implemented from the standard continued-fraction expansion (Abramowitz
  & Stegun 26.5.8 / Lentz's algorithm) — no scipy in this environment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def calendar_floor(ts: pd.Series, unit: str) -> pd.Series:
    """Truncate timestamps to a CALENDAR unit (DateHistogramAggregation
    calendar_interval semantics, UTC): fixed-width units floor; week
    starts Monday; month/quarter/year truncate to real calendar
    boundaries — never epoch-anchored 7D/30D blocks (those are what
    fixed_interval means, not calendar_interval)."""
    ts = pd.to_datetime(ts)
    fixed = {"second": "s", "minute": "min", "hour": "h", "day": "D"}
    if unit in fixed:
        return ts.dt.floor(fixed[unit])
    if unit in ("week", "month", "quarter", "year"):
        period = {"week": "W", "month": "M", "quarter": "Q", "year": "Y"}[unit]
        return ts.dt.to_period(period).dt.start_time
    raise ValueError(f"unknown calendar unit {unit!r}; known: "
                     "second minute hour day week month quarter year")


def _pct_label(p) -> str:
    """'p50' for 50 and 50.0, 'p99.9' for 99.9 — int inputs must not be
    mangled by decimal-string stripping."""
    return f"p{float(p):g}"


# ---------------------------------------------------------------- string_stats

def string_stats(ds: Dataset, col: str, show_distribution: bool = False) -> dict:
    """count / min_length / max_length / avg_length / entropy (log2 over
    the char distribution of ALL values concatenated, like the reference)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = [v for v in batch[col].to_pylist() if v is not None]
        lens = np.array([len(v) for v in vals], np.int64)
        text = "".join(vals)
        cps = np.frombuffer(text.encode("utf-32-le"), np.uint32) if text \
            else np.empty(0, np.uint32)
        uniq, cnt = np.unique(cps, return_counts=True)
        return pa.table({
            "n": pa.array([len(vals)], pa.int64()),
            "sum_len": pa.array([int(lens.sum()) if len(lens) else 0], pa.int64()),
            "min_len": pa.array([int(lens.min()) if len(lens) else -1], pa.int64()),
            "max_len": pa.array([int(lens.max()) if len(lens) else -1], pa.int64()),
            "chars": pa.array([uniq.astype(np.int64).tolist()]),
            "counts": pa.array([cnt.astype(np.int64).tolist()]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return {"count": 0, "min_length": None, "max_length": None,
                "avg_length": None, "entropy": 0.0}
    mins = parts["min_len"][parts["min_len"] >= 0]
    freq: dict[int, int] = {}
    for chars, counts in zip(parts["chars"], parts["counts"]):
        for c, k in zip(chars, counts):
            freq[c] = freq.get(c, 0) + k
    total = float(sum(freq.values()))
    p = np.array(list(freq.values()), np.float64) / max(total, 1.0)
    entropy = float(-(p * np.log2(p)).sum()) if len(p) else 0.0
    out = {
        "count": n,
        "min_length": int(mins.min()),
        "max_length": int(parts["max_len"].max()),
        "avg_length": float(parts["sum_len"].sum()) / n,
        "entropy": entropy,
    }
    if show_distribution:
        out["distribution"] = {chr(c): k / total
                               for c, k in sorted(freq.items(),
                                                  key=lambda kv: -kv[1])}
    return out


# ---------------------------------------------------------------- boxplot

def boxplot_agg(ds: Dataset, col: str, delta: float = 200.0) -> dict:
    """min/max/q1/q2/q3 + IQR whiskers (InternalBoxplot semantics: whiskers
    at 1.5·IQR clamped to observed values; quartiles from the t-digest)."""
    from elasticsearch_ray.ops.tdigest import TDigest

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table({
            "sketch": pa.array([TDigest(delta).add(v).to_bytes()], pa.binary()),
            "mn": pa.array([float(v.min()) if len(v) else np.inf]),
            "mx": pa.array([float(v.max()) if len(v) else -np.inf]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    d = TDigest(delta)
    for b in parts["sketch"]:
        d.merge(TDigest.from_bytes(b))
    mn = float(parts["mn"].min())
    mx = float(parts["mx"].max())
    q1, q2, q3 = (d.quantile(x) for x in (0.25, 0.5, 0.75))
    iqr = q3 - q1
    return {"min": mn, "max": mx, "q1": q1, "q2": q2, "q3": q3,
            "lower": max(mn, q1 - 1.5 * iqr), "upper": min(mx, q3 + 1.5 * iqr)}


# ---------------------------------------------------------------- top_metrics

def top_metrics(ds: Dataset, sort_col: str, metrics: list[str], size: int = 1,
                descending: bool = True) -> pd.DataFrame:
    """top_metrics (`topmetrics/TopMetricsAggregationBuilder.java`): the
    metric values of the top-``size`` docs by the sort field. Per-batch
    partial top-k → tiny driver merge (never a full sort). Sort-value
    ties break on the remaining metric columns in order (deterministic;
    with metrics == [sort_col] alone, ties at the size boundary are
    partition-layout-dependent — pass a distinguishing metric)."""
    extra = [m for m in metrics if m != sort_col]
    cols = [sort_col] + extra
    sort_keys = [sort_col] + extra
    order = [not descending] + [True] * len(extra)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(sort_keys, ascending=order).head(size),
            preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(sort_keys, ascending=order).head(size)
    return out[[sort_col] + metrics].reset_index(drop=True)


# ---------------------------------------------------------------- rate

def rate_agg(ds: Dataset, ts_col: str, unit: str = "day",
             rate_unit: str | None = None, value_col: str | None = None) -> pd.DataFrame:
    """rate (`rate/RateAggregationBuilder.java`): per date-histogram
    bucket, doc count (or Σ value_col) divided by (bucket interval /
    rate unit). With rate_unit == the histogram unit the rate equals the
    raw bucket metric; finer rate units scale down proportionally —
    exactly the reference's RateAggregator math. Buckets use true
    CALENDAR truncation (calendar_floor — epoch-anchored 7D/30D blocks
    would be fixed_interval, not calendar_interval); the rate factor
    uses average unit lengths like the reference."""
    _SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
                "week": 7 * 86400, "month": 30 * 86400,
                "quarter": 92 * 86400, "year": 365 * 86400}
    if unit not in _SECONDS or (rate_unit or unit) not in _SECONDS:
        raise ValueError(f"unknown calendar unit; known: {sorted(_SECONDS)}")
    factor = _SECONDS[unit] / _SECONDS[rate_unit or unit]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        bucket = calendar_floor(df[ts_col], unit)
        g = df.groupby(bucket)
        val = (g[value_col].sum() if value_col else g.size()).astype(np.float64)
        return pa.table({"bucket": pa.array(val.index),
                         "v": pa.array(val.to_numpy())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("bucket", as_index=False)["v"].sum()
    out["rate"] = out["v"] / factor
    return (out[["bucket", "rate"]]
            .sort_values("bucket").reset_index(drop=True))


# --------------------------------------------------------------- normalize

def normalize_bucket(bucket_df: pd.DataFrame, col: str, method: str,
                     out_col: str = "normalized") -> pd.DataFrame:
    """normalize pipeline agg (`normalize/NormalizePipelineAggregator`):
    rescale a sibling bucket metric — methods from the reference list."""
    v = bucket_df[col].to_numpy(np.float64)
    if method == "rescale_0_1":
        span = v.max() - v.min()
        out = (v - v.min()) / span if span else np.zeros_like(v)
    elif method == "rescale_0_100":
        span = v.max() - v.min()
        out = 100.0 * (v - v.min()) / span if span else np.zeros_like(v)
    elif method == "percent_of_sum":
        out = v / v.sum() if v.sum() else np.zeros_like(v)
    elif method == "mean":
        span = v.max() - v.min()
        out = (v - v.mean()) / span if span else np.zeros_like(v)
    elif method == "z-score":
        sd = v.std()
        out = (v - v.mean()) / sd if sd else np.zeros_like(v)
    elif method == "softmax":
        e = np.exp(v - v.max())
        out = e / e.sum()
    else:
        raise ValueError(f"unknown normalize method {method!r}")
    res = bucket_df.copy()
    res[out_col] = out
    return res


# ----------------------------------------------------- moving_percentiles

def moving_percentiles(ds: Dataset, ts_col: str, value_col: str,
                       unit: str = "day", window: int = 3,
                       percents=(50.0,), delta: float = 200.0) -> pd.DataFrame:
    """moving_percentiles (`movingPercentiles/MovingPercentilesPipeline
    Aggregator.java`): a sliding window over a date histogram's per-bucket
    t-digest SKETCHES, merged per output bucket — the whole point of the
    reference op is that digests merge, so the window never re-reads
    values. One distributed pass builds (bucket, digest) partials; the
    driver merges window·buckets tiny sketches."""
    from elasticsearch_ray.ops.tdigest import TDigest

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        bucket = calendar_floor(df[ts_col], unit)
        rows_b, rows_s = [], []
        for b, g in df.groupby(bucket):
            rows_b.append(b)
            rows_s.append(TDigest(delta).add(
                g[value_col].to_numpy(np.float64)).to_bytes())
        return pa.table({"bucket": pa.array(rows_b),
                         "sketch": pa.array(rows_s, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    per_bucket: dict = {}
    for b, s in zip(parts["bucket"], parts["sketch"]):
        d = per_bucket.get(b)
        nd = TDigest.from_bytes(s)
        per_bucket[b] = nd if d is None else d.merge(nd)
    buckets = sorted(per_bucket)
    rows = []
    for i, b in enumerate(buckets):
        lo = max(0, i - window + 1)
        acc = TDigest(delta)
        for bb in buckets[lo:i + 1]:
            acc.merge(TDigest.from_bytes(per_bucket[bb].to_bytes()))
        row = {"bucket": b}
        for p in percents:
            row[_pct_label(p)] = acc.quantile(p / 100.0)
        rows.append(row)
    return pd.DataFrame(rows)


# -------------------------------------------- cumulative_cardinality

def cumulative_cardinality(ds: Dataset, ts_col: str, id_col: str,
                           unit: str = "day") -> pd.DataFrame:
    """cumulative_cardinality (`cumulativecardinality/...Aggregator`):
    per date bucket, the number of DISTINCT ids seen in that bucket or
    any earlier one. Shuffle-light exact form: a DISTRIBUTED min-reduce
    computes each id's FIRST bucket (batch-local combine, then one Ray
    groupby whose shuffle is id-distinct-sized), a second tiny groupby
    counts first-appearances per bucket, and only the per-bucket counts
    reach the driver — the cumulative sum of first-sightings equals the
    cumulative cardinality (ids count once, at first sight); no id-sized
    table and no per-bucket set union ever centralizes."""
    from ray.data.aggregate import Count, Min

    def first_seen(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = pd.DataFrame({"id": df[id_col],
                          "bucket": calendar_floor(df[ts_col], unit)})
        first = g.groupby("id", as_index=False)["bucket"].min()
        return pa.Table.from_pandas(first, preserve_index=False)

    per_bucket = (ds.map_batches(first_seen, batch_format="pyarrow")
                  .groupby("id").aggregate(Min("bucket", alias_name="first"))
                  .groupby("first").aggregate(Count(alias_name="n"))
                  .to_pandas().sort_values("first"))

    # the reference pipeline agg emits the RUNNING TOTAL FOR EVERY
    # histogram bucket — including buckets whose events are all
    # previously-seen ids (ADVICE r4: the first-seen shape silently
    # dropped those). The bucket universe comes from a column-pruned
    # pass with per-batch distinct pre-aggregation (bucket-count-sized
    # shuffle, no id-sized state).
    def distinct_buckets(batch: pa.Table) -> pa.Table:
        b = calendar_floor(batch.to_pandas()[ts_col], unit)
        return pa.Table.from_pandas(
            pd.DataFrame({"bucket": pd.unique(b)}), preserve_index=False)

    universe = (ds.select_columns([ts_col])
                .map_batches(distinct_buckets, batch_format="pyarrow")
                .groupby("bucket").aggregate(Count(alias_name="_n"))
                .to_pandas()["bucket"].sort_values())
    firsts = pd.Series(
        per_bucket["n"].to_numpy(),
        index=pd.to_datetime(per_bucket["first"])).cumsum()
    out = pd.DataFrame({
        "bucket": pd.to_datetime(universe.to_numpy()),
        "cumulative_cardinality": firsts.reindex(
            pd.to_datetime(universe.to_numpy())).ffill().fillna(0)
            .astype("int64").to_numpy(),
    })
    return out.reset_index(drop=True)


# ---------------------------------------------------------------- t_test

def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method; the
    standard public algorithm, cf. Numerical Recipes 6.4 shape)."""
    MAXIT, EPS, FPMIN = 200, 3e-12, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def _betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log(1.0 - x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf2(t: float, df: float) -> float:
    """Two-sided Student-t tail probability P(|T| >= t)."""
    x = df / (df + t * t)
    return _betainc_reg(df / 2.0, 0.5, x)


def _moments(ds: Dataset, col: str) -> tuple[float, float, float]:
    """Exact mergeable (n, Σx, Σx²) via one map_batches pass."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table({"n": pa.array([float(len(v))]),
                         "s": pa.array([float(v.sum())]),
                         "s2": pa.array([float((v * v).sum())])})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return float(p["n"].sum()), float(p["s"].sum()), float(p["s2"].sum())


def t_test(ds: Dataset, col_a: str, col_b: str,
           type: str = "heteroscedastic") -> dict:
    """Two-sided t-test p-value between two numeric fields of the SAME
    table (TTestAggregationBuilder form): ``paired`` (on per-row
    differences), ``homoscedastic`` (pooled variance), ``heteroscedastic``
    (Welch, the reference default). Returns {value: p, t_stat, df}."""
    if type not in ("paired", "homoscedastic", "heteroscedastic"):
        raise ValueError(f"unknown t_test type {type!r}")
    if type == "paired":
        import pyarrow.compute as pc

        diff = ds.map_batches(
            lambda b: pa.table({"d": pc.subtract(
                pc.cast(b[col_a], pa.float64()),
                pc.cast(b[col_b], pa.float64()))}),
            batch_format="pyarrow")
        n, s, s2 = _moments(diff, "d")
        if n < 2:
            raise ValueError("paired t_test needs at least 2 rows")
        mean = s / n
        var = (s2 - n * mean * mean) / (n - 1)
        t = mean / np.sqrt(var / n)
        df = n - 1
    else:
        na, sa, sa2 = _moments(ds, col_a)
        nb, sb, sb2 = _moments(ds, col_b)
        if na < 2 or nb < 2:
            raise ValueError("t_test needs at least 2 values per side")
        ma, mb = sa / na, sb / nb
        va = (sa2 - na * ma * ma) / (na - 1)
        vb = (sb2 - nb * mb * mb) / (nb - 1)
        if type == "homoscedastic":
            sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
            t = (ma - mb) / np.sqrt(sp2 * (1 / na + 1 / nb))
            df = na + nb - 2
        else:  # Welch
            se2 = va / na + vb / nb
            t = (ma - mb) / np.sqrt(se2)
            df = se2 * se2 / ((va / na) ** 2 / (na - 1)
                              + (vb / nb) ** 2 / (nb - 1))
    return {"value": float(t_sf2(abs(float(t)), float(df))),
            "t_stat": float(t), "df": float(df)}
