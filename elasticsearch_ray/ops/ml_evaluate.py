"""``POST _ml/data_frame/_evaluate`` — evaluate a results table.

Reference: ``x-pack/plugin/core/.../ml/dataframe/evaluation/`` —
``regression/`` (MeanSquaredError, MeanSquaredLogarithmicError with
``offset`` default 1, Huber pseudo-loss with ``delta`` default 1:
``1/n * Σ δ²(√(1 + a²/δ²) − 1)``, RSquared =
``1 − SSres / (variance·count)``), ``classification/`` (Accuracy with
per-class + overall, Precision per PREDICTED class + avg_precision,
Recall per ACTUAL class + avg_recall, MulticlassConfusionMatrix with a
``size`` cap and ``other_*`` overflow counts), and
``outlierdetection/`` (Precision/Recall/ConfusionMatrix ``at``
probability thresholds, AucRoc).

Everything reduces from per-batch partials:

- regression: running Σerr², Σlog-err², Σhuber, Σy, Σy², n — one
  streaming pass, O(1) driver state;
- classification: per-batch (actual, predicted) pair counts — the
  shuffle carries one row per DISTINCT pair, never per doc;
- outlier detection: per-batch threshold confusion counts plus
  fixed-width score histograms per class; AUC-ROC integrates the ROC
  from those histograms (the reference likewise estimates the curve
  from percentile sketches rather than exact ranks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

_AUC_BINS = 1000


# ------------------------------------------------------------- regression


def evaluate_regression(ds: Dataset, actual_field: str,
                        predicted_field: str,
                        metrics: dict | None = None) -> dict:
    metrics = metrics or {"mse": {}, "msle": {}, "huber": {},
                          "r_squared": {}}
    offset = float(metrics.get("msle", {}).get("offset", 1.0))
    delta = float(metrics.get("huber", {}).get("delta", 1.0))
    d2 = delta * delta

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        y = df[actual_field].to_numpy(np.float64)
        p = df[predicted_field].to_numpy(np.float64)
        err = y - p
        with np.errstate(invalid="ignore"):
            lerr = np.log(y + offset) - np.log(p + offset)
        return pd.DataFrame([{
            "n": len(y), "se": float(err @ err),
            "sle": float(lerr @ lerr),
            "huber": float(np.sum(d2 * (np.sqrt(1.0 + err * err / d2)
                                        - 1.0))),
            "sy": float(y.sum()), "syy": float(y @ y)}])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    out: dict = {}
    if n == 0:
        return {m: {"value": None} for m in metrics}
    se, sle = float(parts["se"].sum()), float(parts["sle"].sum())
    hub = float(parts["huber"].sum())
    sy, syy = float(parts["sy"].sum()), float(parts["syy"].sum())
    if "mse" in metrics:
        out["mse"] = {"value": se / n}
    if "msle" in metrics:
        out["msle"] = {"value": sle / n}
    if "huber" in metrics:
        out["huber"] = {"value": hub / n}
    if "r_squared" in metrics:
        sstot = syy - sy * sy / n  # variance * count
        out["r_squared"] = {"value": (1.0 - se / sstot) if sstot > 0
                            else 0.0}
    return out


# --------------------------------------------------------- classification


def _pair_counts(ds: Dataset, actual_field: str,
                 predicted_field: str) -> pd.DataFrame:
    """(actual, predicted) -> count, combined from per-batch partials."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([actual_field, predicted_field], sort=False)
               .size().reset_index(name="n"))
        return g.rename(columns={actual_field: "actual",
                                 predicted_field: "predicted"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"actual": [], "predicted": [], "n": []})
    return (parts.groupby(["actual", "predicted"], sort=False)["n"]
            .sum().reset_index())


def evaluate_classification(ds: Dataset, actual_field: str,
                            predicted_field: str,
                            metrics: dict | None = None) -> dict:
    metrics = metrics or {"accuracy": {}, "precision": {},
                          "recall": {},
                          "multiclass_confusion_matrix": {}}
    pairs = _pair_counts(ds, actual_field, predicted_field)
    total = int(pairs["n"].sum())
    out: dict = {}
    if total == 0:
        return {m: {} for m in metrics}
    correct = pairs.loc[pairs["actual"] == pairs["predicted"], "n"]
    n_correct = int(correct.sum())
    by_actual = pairs.groupby("actual")["n"].sum()
    by_pred = pairs.groupby("predicted")["n"].sum()
    diag = (pairs[pairs["actual"] == pairs["predicted"]]
            .set_index("actual")["n"])

    if "accuracy" in metrics:
        # per-class accuracy = (TP + TN) / total
        classes = []
        for c in sorted(by_actual.index):
            tp = int(diag.get(c, 0))
            fn = int(by_actual.get(c, 0)) - tp
            fp = int(by_pred.get(c, 0)) - tp
            tn = total - tp - fn - fp
            classes.append({"class_name": c,
                            "value": (tp + tn) / total})
        out["accuracy"] = {"classes": classes,
                           "overall_accuracy": n_correct / total}
    if "precision" in metrics:
        classes = [{"class_name": c,
                    "value": float(diag.get(c, 0)) / float(by_pred[c])}
                   for c in sorted(by_pred.index)]
        out["precision"] = {
            "classes": classes,
            "avg_precision": (float(np.mean([k["value"]
                                             for k in classes]))
                              if classes else 0.0)}
    if "recall" in metrics:
        classes = [{"class_name": c,
                    "value": float(diag.get(c, 0)) / float(by_actual[c])}
                   for c in sorted(by_actual.index)]
        out["recall"] = {
            "classes": classes,
            "avg_recall": (float(np.mean([k["value"] for k in classes]))
                           if classes else 0.0)}
    if "multiclass_confusion_matrix" in metrics:
        size = int(metrics["multiclass_confusion_matrix"]
                   .get("size", 10))
        # top actual classes by doc count (terms-agg order), then name
        top = sorted(by_actual.index,
                     key=lambda c: (-int(by_actual[c]), str(c)))[:size]
        top_set = set(top)
        rows = []
        for c in top:
            sub = pairs[pairs["actual"] == c]
            pred_counts = [
                {"predicted_class": p, "count": int(m)}
                for p, m in sorted(
                    sub.set_index("predicted")["n"].items(),
                    key=lambda kv: str(kv[0])) if p in top_set]
            other = int(sub["n"].sum()) - sum(x["count"]
                                              for x in pred_counts)
            rows.append({"actual_class": c,
                         "actual_class_doc_count": int(by_actual[c]),
                         "predicted_classes": pred_counts,
                         "other_predicted_class_doc_count": other})
        out["multiclass_confusion_matrix"] = {
            "confusion_matrix": rows,
            "other_actual_class_count":
                int(len(by_actual.index) - len(top))}
    return out


# ------------------------------------------------------ outlier detection


def evaluate_outlier_detection(ds: Dataset, actual_field: str,
                               predicted_probability_field: str,
                               metrics: dict | None = None) -> dict:
    metrics = metrics or {"auc_roc": {},
                          "precision": {"at": [0.25, 0.5, 0.75]},
                          "recall": {"at": [0.25, 0.5, 0.75]},
                          "confusion_matrix": {"at": [0.25, 0.5, 0.75]}}
    ats = sorted({t for m in ("precision", "recall", "confusion_matrix")
                  for t in metrics.get(m, {}).get("at", [])})
    for t in ats:
        if not 0.0 <= t <= 1.0:
            raise ValueError(f"threshold must be in [0, 1], got {t}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        y = df[actual_field].to_numpy()
        y = (y.astype(np.float64) != 0)
        p = df[predicted_probability_field].to_numpy(np.float64)
        row: dict = {}
        for i, t in enumerate(ats):
            pred = p >= t
            row[f"tp{i}"] = int(np.sum(pred & y))
            row[f"fp{i}"] = int(np.sum(pred & ~y))
            row[f"fn{i}"] = int(np.sum(~pred & y))
            row[f"tn{i}"] = int(np.sum(~pred & ~y))
        hp, _ = np.histogram(p[y], bins=_AUC_BINS, range=(0.0, 1.0))
        hn, _ = np.histogram(p[~y], bins=_AUC_BINS, range=(0.0, 1.0))
        for j, v in enumerate(hp):
            row[f"hp{j}"] = int(v)
        for j, v in enumerate(hn):
            row[f"hn{j}"] = int(v)
        return pd.DataFrame([row])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out: dict = {}
    sums = parts.sum()

    def conf(i):
        return (int(sums[f"tp{i}"]), int(sums[f"fp{i}"]),
                int(sums[f"fn{i}"]), int(sums[f"tn{i}"]))

    if "precision" in metrics:
        vals = {}
        for t in metrics["precision"].get("at", []):
            tp, fp, _, _ = conf(ats.index(t))
            vals[f"{t}"] = tp / (tp + fp) if tp + fp else 0.0
        out["precision"] = vals
    if "recall" in metrics:
        vals = {}
        for t in metrics["recall"].get("at", []):
            tp, _, fn, _ = conf(ats.index(t))
            vals[f"{t}"] = tp / (tp + fn) if tp + fn else 0.0
        out["recall"] = vals
    if "confusion_matrix" in metrics:
        vals = {}
        for t in metrics["confusion_matrix"].get("at", []):
            tp, fp, fn, tn = conf(ats.index(t))
            vals[f"{t}"] = {"tp": tp, "fp": fp, "fn": fn, "tn": tn}
        out["confusion_matrix"] = vals
    if "auc_roc" in metrics:
        hp = np.array([sums[f"hp{j}"] for j in range(_AUC_BINS)],
                      np.float64)
        hn = np.array([sums[f"hn{j}"] for j in range(_AUC_BINS)],
                      np.float64)
        out["auc_roc"] = {"value": _auc_from_histograms(hp, hn)}
        if metrics["auc_roc"].get("include_curve"):
            out["auc_roc"]["curve"] = _roc_curve(hp, hn)
    return out


def _auc_from_histograms(hp: np.ndarray, hn: np.ndarray) -> float:
    """AUC = P(score+ > score-) + ½P(=), integrated from per-class score
    histograms (ties inside one bin count half — the within-bin
    uniformity assumption the reference's percentile-curve estimate also
    makes)."""
    n_pos, n_neg = hp.sum(), hn.sum()
    if n_pos == 0 or n_neg == 0:
        return 0.0
    neg_below = np.concatenate(([0.0], np.cumsum(hn)[:-1]))
    wins = float(np.sum(hp * neg_below)) + 0.5 * float(np.sum(hp * hn))
    return wins / (n_pos * n_neg)


def _roc_curve(hp: np.ndarray, hn: np.ndarray) -> list[dict]:
    n_pos, n_neg = hp.sum(), hn.sum()
    tpr = 1.0 - np.cumsum(hp) / max(n_pos, 1)
    fpr = 1.0 - np.cumsum(hn) / max(n_neg, 1)
    idx = np.linspace(0, _AUC_BINS - 1, 101).astype(int)
    return [{"threshold": (i + 1) / _AUC_BINS,
             "tpr": float(tpr[i]), "fpr": float(fpr[i])}
            for i in idx]


# ------------------------------------------------------------- dispatcher


def evaluate_data_frame(ds: Dataset, evaluation: dict) -> dict:
    """TransportEvaluateDataFrameAction analog: one evaluation type per
    request."""
    if len(evaluation) != 1:
        raise ValueError("exactly one evaluation type is required")
    (kind, body), = evaluation.items()
    if kind == "regression":
        return {"regression": evaluate_regression(
            ds, body["actual_field"], body["predicted_field"],
            body.get("metrics"))}
    if kind == "classification":
        return {"classification": evaluate_classification(
            ds, body["actual_field"], body["predicted_field"],
            body.get("metrics"))}
    if kind == "outlier_detection":
        return {"outlier_detection": evaluate_outlier_detection(
            ds, body["actual_field"],
            body["predicted_probability_field"], body.get("metrics"))}
    raise ValueError(f"unknown evaluation [{kind}]")
