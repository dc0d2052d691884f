"""Data-frame-analytics TRAINING (distributed histogram GBT).

Reference semantics: Regression.java / Classification.java configs,
DataFrameAnalyticsManager dest-write shape (ml.<prediction_field>,
ml.is_training), and the public histogram-GBT formulation (Chen &
Guestrin KDD'16) for the boosted-tree fit itself.  The emitted model
must be served EXACTLY by ops/inference.py (TrainedModelDefinition),
like the reference's trained-model handoff.
"""

import json

import numpy as np
import pandas as pd
import pytest

import ray

from elasticsearch_ray.ops.dfa_train import fit_gbt, start_data_frame_analytics
from elasticsearch_ray.ops.inference import TrainedModelDefinition


def _reg_frame(n=600):
    """Deterministic nonlinear regression target over 2 numeric features."""
    rng = np.random.RandomState(7)
    x1 = rng.uniform(0, 10, n).round(3)
    x2 = rng.uniform(-5, 5, n).round(3)
    y = np.where(x1 > 5, 20.0, 3.0) + np.where(x2 > 0, 7.0, 0.0) + 0.5 * x1
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "x1": x1, "x2": x2, "y": y.round(4),
    })


def _cls_frame(n=600):
    rng = np.random.RandomState(11)
    x1 = rng.uniform(0, 10, n).round(3)
    x2 = rng.uniform(0, 10, n).round(3)
    label = np.where(x1 + x2 > 10, "pos", "neg")
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "x1": x1, "x2": x2, "label": label,
    })


@pytest.fixture(scope="module")
def reg_ds(ray_session):
    return ray.data.from_pandas(_reg_frame()).repartition(4).materialize()


def test_regression_fit_reduces_error_and_serves(reg_ds):
    df = _reg_frame()
    defn, meta = fit_gbt(reg_ds, ["x1", "x2"], "y",
                         objective="mse", max_trees=15, max_depth=3,
                         num_bins=32)
    model = TrainedModelDefinition(defn)
    pred = model.infer(df)["predicted_value"]
    base_mse = float(np.mean((df["y"] - df["y"].mean()) ** 2))
    mse = float(np.mean((df["y"] - pred) ** 2))
    assert mse < 0.05 * base_mse  # piecewise-constant target: big reduction
    assert meta["num_trees"] >= 1
    # feature importances cover both informative features
    assert meta["feature_importance"]["x1"] > 0
    assert meta["feature_importance"]["x2"] > 0


def test_fit_is_block_layout_invariant(ray_session):
    """The emitted definition must be bit-identical across block layouts
    (fixed-point histogram reduce + value-hash sampling)."""
    df = _reg_frame(400)
    d1 = ray.data.from_pandas(df).repartition(1).materialize()
    d7 = ray.data.from_pandas(df.sample(frac=1.0, random_state=3)
                              ).repartition(7).materialize()
    a, _ = fit_gbt(d1, ["x1", "x2"], "y", max_trees=5, max_depth=3,
                   num_bins=16)
    b, _ = fit_gbt(d7, ["x1", "x2"], "y", max_trees=5, max_depth=3,
                   num_bins=16)
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)


def test_classification_fit_accuracy_and_labels(ray_session):
    df = _cls_frame()
    ds = ray.data.from_pandas(df).repartition(3)
    defn, meta = fit_gbt(ds, ["x1", "x2"], "label",
                         objective="binary_logloss", max_trees=12,
                         max_depth=3, num_bins=32)
    ens = defn["trained_model"]["ensemble"]
    assert ens["target_type"] == "classification"
    assert ens["classification_labels"] == ["neg", "pos"]  # sorted
    model = TrainedModelDefinition(defn)
    out = model.infer(df)
    acc = float(np.mean(out["predicted_value"] == df["label"].to_numpy()))
    assert acc > 0.93
    p = out["prediction_probability"]
    assert np.all((p >= 0.5 - 1e-12) & (p <= 1.0))  # prob of PREDICTED class


def test_classification_requires_two_classes(ray_session):
    df = _cls_frame(100)
    df["label"] = "only"
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="exactly 2 classes"):
        fit_gbt(ds, ["x1"], "label", objective="binary_logloss",
                max_trees=2)


def test_frequency_encoded_categorical_feature(ray_session):
    """String feature → frequency encoding; the category fully determines
    the target, so the fit must exploit it."""
    n = 500
    rng = np.random.RandomState(5)
    cat = rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2])
    y = np.select([cat == "a", cat == "b"], [10.0, 20.0], 30.0)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "cat": cat, "y": y})
    ds = ray.data.from_pandas(df).repartition(3)
    defn, _ = fit_gbt(ds, ["cat"], "y", max_trees=10, max_depth=2,
                      num_bins=16)
    pre = defn["preprocessors"]
    assert len(pre) == 1 and "frequency_encoding" in pre[0]
    fmap = pre[0]["frequency_encoding"]["frequency_map"]
    assert set(fmap) == {"a", "b", "c"}
    assert abs(sum(fmap.values()) - 1.0) < 1e-9
    model = TrainedModelDefinition(defn)
    pred = model.infer(df)["predicted_value"]
    assert float(np.mean((pred - y) ** 2)) < 1.0


def test_missing_values_route_default_left(ray_session):
    """NaN features occupy the missing bin in training and default_left
    at serving — train/serve parity on rows WITH NaNs."""
    df = _reg_frame(300)
    df.loc[df.index % 5 == 0, "x1"] = np.nan
    ds = ray.data.from_pandas(df).repartition(2)
    defn, _ = fit_gbt(ds, ["x1", "x2"], "y", max_trees=6, max_depth=3,
                      num_bins=16)
    for m in defn["trained_model"]["ensemble"]["trained_models"]:
        for nd in m["tree"]["tree_structure"]:
            if "split_feature" in nd:
                assert nd["default_left"] is True
    model = TrainedModelDefinition(defn)
    pred = model.infer(df)["predicted_value"]
    assert np.all(np.isfinite(pred))
    # NaN rows still get sensible predictions (within target range)
    nan_pred = pred[df["x1"].isna().to_numpy()]
    assert nan_pred.min() > df["y"].min() - 5
    assert nan_pred.max() < df["y"].max() + 5


def test_job_api_split_and_dest_columns(ray_session):
    df = _reg_frame(500)
    ds = ray.data.from_pandas(df).repartition(3)
    dest, defn, meta = start_data_frame_analytics(
        ds, dependent_variable="y", analysis="regression",
        features=["x1", "x2"], id_column="doc_id",
        training_percent=60.0, randomize_seed=99,
        max_trees=5, max_depth=3, num_bins=16)
    out = dest.to_pandas().sort_values("doc_id", ignore_index=True)
    # every source row present with prediction + is_training
    assert len(out) == len(df)
    assert "ml.y_prediction" in out.columns
    assert out["ml.y_prediction"].notna().all()
    frac = float(out["ml.is_training"].mean())
    assert 0.5 < frac < 0.7  # hash split ≈ training_percent
    # split is deterministic in (id, seed): rerun reproduces it
    dest2, _, _ = start_data_frame_analytics(
        ds, dependent_variable="y", analysis="regression",
        features=["x1", "x2"], id_column="doc_id",
        training_percent=60.0, randomize_seed=99,
        max_trees=5, max_depth=3, num_bins=16)
    out2 = dest2.to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["ml.is_training"].tolist() == out2["ml.is_training"].tolist()


def test_job_api_classification_probability_column(ray_session):
    df = _cls_frame(400)
    ds = ray.data.from_pandas(df).repartition(2)
    dest, defn, meta = start_data_frame_analytics(
        ds, dependent_variable="label", analysis="classification",
        features=["x1", "x2"], id_column="doc_id",
        prediction_field_name="label_pred",
        max_trees=8, max_depth=3, num_bins=16)
    out = dest.to_pandas()
    assert {"ml.label_pred", "ml.prediction_probability",
            "ml.is_training"} <= set(out.columns)
    assert out["ml.is_training"].all()  # training_percent defaults to 100
    assert set(out["ml.label_pred"].unique()) <= {"neg", "pos"}


def test_hyperparameter_validation(ray_session):
    ds = ray.data.from_pandas(_reg_frame(50))
    with pytest.raises(ValueError, match="objective"):
        fit_gbt(ds, ["x1"], "y", objective="poisson")
    with pytest.raises(ValueError, match="num_bins"):
        fit_gbt(ds, ["x1"], "y", num_bins=256)
    with pytest.raises(ValueError, match="analysis"):
        start_data_frame_analytics(
            ds, dependent_variable="y", analysis="outlier",
            features=["x1"], id_column="doc_id")
