"""ml.evaluate_data_frame (x-pack ml dataframe evaluation module)."""

import numpy as np
import pandas as pd
import pytest
import ray

from elasticsearch_ray.ops.ml_evaluate import evaluate_data_frame


def _ds(df, parts=3):
    return ray.data.from_pandas(df).repartition(parts)


def test_regression_metrics_exact(ray_session):
    rng = np.random.RandomState(7)
    y = rng.uniform(1, 10, 200)
    p = y + rng.normal(0, 1, 200)
    df = pd.DataFrame({"y": y, "p": p})
    out = evaluate_data_frame(_ds(df), {"regression": {
        "actual_field": "y", "predicted_field": "p"}})["regression"]
    err = y - p
    assert out["mse"]["value"] == pytest.approx(np.mean(err ** 2))
    assert out["msle"]["value"] == pytest.approx(
        np.mean((np.log(y + 1) - np.log(p + 1)) ** 2))
    # huber: 1/n Σ δ²(√(1+a²/δ²)−1), δ=1
    assert out["huber"]["value"] == pytest.approx(
        np.mean(np.sqrt(1 + err ** 2) - 1))
    ssres = np.sum(err ** 2)
    sstot = np.var(y) * len(y)
    assert out["r_squared"]["value"] == pytest.approx(1 - ssres / sstot)


def test_regression_batch_boundary_independence(ray_session):
    rng = np.random.RandomState(3)
    df = pd.DataFrame({"y": rng.uniform(0, 5, 120),
                       "p": rng.uniform(0, 5, 120)})
    spec = {"regression": {"actual_field": "y", "predicted_field": "p"}}
    a = evaluate_data_frame(_ds(df, 1), spec)["regression"]
    b = evaluate_data_frame(_ds(df, 7), spec)["regression"]
    for m in ("mse", "msle", "huber", "r_squared"):
        assert a[m]["value"] == pytest.approx(b[m]["value"], rel=1e-12)


def test_classification_metrics(ray_session):
    actual = ["cat"] * 5 + ["dog"] * 3 + ["fox"] * 2
    pred = ["cat", "cat", "cat", "dog", "dog",
            "dog", "dog", "cat", "fox", "fox"]
    df = pd.DataFrame({"a": actual, "p": pred})
    out = evaluate_data_frame(_ds(df, 2), {"classification": {
        "actual_field": "a", "predicted_field": "p"}})["classification"]
    assert out["accuracy"]["overall_accuracy"] == pytest.approx(0.7)
    acc = {c["class_name"]: c["value"] for c in out["accuracy"]["classes"]}
    # cat: tp=3, fn=2 (cat->dog), fp=1 (dog->cat), tn=4 -> 0.7
    assert acc["cat"] == pytest.approx(0.7)
    prec = {c["class_name"]: c["value"]
            for c in out["precision"]["classes"]}
    # predicted counts: cat=4 (3 tp + 1 dog->cat), dog=4 (2 tp + 2
    # cat->dog), fox=2 (2 tp)
    assert prec["cat"] == pytest.approx(3 / 4)
    assert prec["dog"] == pytest.approx(2 / 4)
    assert prec["fox"] == pytest.approx(1.0)
    assert out["precision"]["avg_precision"] == pytest.approx(
        np.mean([3 / 4, 2 / 4, 1.0]))
    rec = {c["class_name"]: c["value"] for c in out["recall"]["classes"]}
    assert rec["cat"] == pytest.approx(3 / 5)
    assert rec["dog"] == pytest.approx(2 / 3)
    assert rec["fox"] == pytest.approx(1.0)
    cm = out["multiclass_confusion_matrix"]
    assert cm["other_actual_class_count"] == 0
    row_cat = next(r for r in cm["confusion_matrix"]
                   if r["actual_class"] == "cat")
    assert row_cat["actual_class_doc_count"] == 5
    assert {x["predicted_class"]: x["count"]
            for x in row_cat["predicted_classes"]} == {"cat": 3, "dog": 2}


def test_confusion_matrix_size_cap(ray_session):
    # 4 actual classes, size=2 keeps the 2 biggest; cross-counts into
    # dropped classes land in other_predicted_class_doc_count
    actual = ["a"] * 6 + ["b"] * 4 + ["c"] * 2 + ["d"]
    pred = ["a"] * 5 + ["c"] + ["b"] * 3 + ["d"] + ["c"] * 2 + ["d"]
    df = pd.DataFrame({"a": actual, "p": pred})
    out = evaluate_data_frame(_ds(df, 2), {"classification": {
        "actual_field": "a", "predicted_field": "p",
        "metrics": {"multiclass_confusion_matrix": {"size": 2}}}})
    cm = out["classification"]["multiclass_confusion_matrix"]
    assert cm["other_actual_class_count"] == 2
    assert [r["actual_class"] for r in cm["confusion_matrix"]] \
        == ["a", "b"]
    row_a = cm["confusion_matrix"][0]
    assert {x["predicted_class"]: x["count"]
            for x in row_a["predicted_classes"]} == {"a": 5}
    assert row_a["other_predicted_class_doc_count"] == 1
    row_b = cm["confusion_matrix"][1]
    assert row_b["other_predicted_class_doc_count"] == 1


def test_outlier_detection_thresholds_and_auc(ray_session):
    # perfectly separable scores -> AUC 1.0
    df = pd.DataFrame({
        "label": [0] * 50 + [1] * 50,
        "prob": np.concatenate([np.linspace(0.0, 0.4, 50),
                                np.linspace(0.6, 0.99, 50)])})
    out = evaluate_data_frame(_ds(df, 3), {"outlier_detection": {
        "actual_field": "label",
        "predicted_probability_field": "prob"}})["outlier_detection"]
    assert out["auc_roc"]["value"] == pytest.approx(1.0)
    assert out["precision"]["0.5"] == pytest.approx(1.0)
    assert out["recall"]["0.5"] == pytest.approx(1.0)
    cm = out["confusion_matrix"]["0.5"]
    assert cm == {"tp": 50, "fp": 0, "fn": 0, "tn": 50}
    # threshold 0.25 lets some negatives through
    cm25 = out["confusion_matrix"]["0.25"]
    assert cm25["tp"] == 50 and cm25["fp"] > 0
    assert out["precision"]["0.25"] == pytest.approx(
        50 / (50 + cm25["fp"]))


def test_outlier_auc_random_is_half(ray_session):
    rng = np.random.RandomState(11)
    probs = rng.uniform(0, 1, 2000)
    df = pd.DataFrame({"label": rng.randint(0, 2, 2000), "prob": probs})
    out = evaluate_data_frame(_ds(df, 4), {"outlier_detection": {
        "actual_field": "label", "predicted_probability_field": "prob",
        "metrics": {"auc_roc": {}}}})["outlier_detection"]
    assert out["auc_roc"]["value"] == pytest.approx(0.5, abs=0.05)


def test_validation_errors(ray_session):
    df = pd.DataFrame({"a": [1], "p": [1]})
    with pytest.raises(ValueError, match="exactly one"):
        evaluate_data_frame(_ds(df, 1), {})
    with pytest.raises(ValueError, match="unknown evaluation"):
        evaluate_data_frame(_ds(df, 1), {"nope": {}})
    with pytest.raises(ValueError, match="threshold"):
        evaluate_data_frame(_ds(df, 1), {"outlier_detection": {
            "actual_field": "a", "predicted_probability_field": "p",
            "metrics": {"precision": {"at": [1.5]}}}})
