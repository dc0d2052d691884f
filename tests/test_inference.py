"""Trained-model inference (x-pack ml tree/ensemble) vs hand oracles.

Reference semantics: TreeInferenceModel.java (compare: NaN → default_left,
operator vs threshold), EnsembleInferenceModel.java + the four
OutputAggregators, InferenceHelpers.topClasses (scores = probs ×
classification_weights), the three encoding preprocessors, and
InferenceProcessor.java (target_field default ml.inference).
"""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.inference import (
    EnsembleModel,
    TrainedModelDefinition,
    TreeModel,
    delete_trained_model,
    get_trained_model,
    infer_dataset,
    put_trained_model,
    sigmoid,
    softmax,
)

# x <= 5 ? (y < 2 ? 10 : 20) : 30, with default_left on the root
STUMP = {
    "feature_names": ["x", "y"],
    "tree_structure": [
        {"node_index": 0, "split_feature": 0, "threshold": 5.0,
         "left_child": 1, "right_child": 2, "default_left": True},
        {"node_index": 1, "split_feature": 1, "threshold": 2.0,
         "decision_type": "lt", "left_child": 3, "right_child": 4},
        {"node_index": 2, "leaf_value": 30.0},
        {"node_index": 3, "leaf_value": 10.0},
        {"node_index": 4, "leaf_value": 20.0},
    ],
}


def _X(rows):
    return np.asarray(rows, dtype=np.float64)


def test_tree_traversal_operators_and_default_left():
    t = TreeModel(STUMP)
    got = t.traverse(_X([[4, 1], [4, 2], [5, 0], [6, 9],
                         [np.nan, 1], [4, np.nan]]))[:, 0]
    # lte on root (5 <= 5 goes left), lt on node 1 (2 < 2 is false)
    assert got.tolist() == [10, 20, 10, 30, 10, 20]
    # NaN y at node 1: default_left absent → False → right (20)


def test_tree_gt_gte_operators():
    spec = {
        "feature_names": ["x"],
        "tree_structure": [
            {"node_index": 0, "split_feature": 0, "threshold": 1.0,
             "decision_type": "gt", "left_child": 1, "right_child": 2},
            {"node_index": 1, "split_feature": 0, "threshold": 3.0,
             "decision_type": "gte", "left_child": 3, "right_child": 4},
            {"node_index": 2, "leaf_value": 0.0},
            {"node_index": 3, "leaf_value": 1.0},
            {"node_index": 4, "leaf_value": 2.0},
        ],
    }
    t = TreeModel(spec)
    assert t.traverse(_X([[1], [1.5], [3], [2.9]]))[:, 0].tolist() == \
        [0, 2, 1, 2]


def test_tree_classification_one_hot_probs():
    spec = dict(STUMP, target_type="classification",
                classification_labels=["a", "b", "c", "d"])
    spec = {**spec, "tree_structure": [
        dict(n, leaf_value=n["leaf_value"] / 10 - 1)
        if "leaf_value" in n else n for n in STUMP["tree_structure"]]}
    m = TrainedModelDefinition({"trained_model": {"tree": spec}})
    out = m.infer(pd.DataFrame({"x": [4, 6], "y": [1, 0]}),
                  num_top_classes=2)
    assert out["predicted_value"].tolist() == ["a", "c"]
    assert out["prediction_probability"].tolist() == [1.0, 1.0]
    assert out["top_classes"][0][0]["class_name"] == "a"


def _tree(val_by_x):
    # x <= 0 ? a : b
    a, b = val_by_x
    return {"tree": {"feature_names": ["x"], "tree_structure": [
        {"node_index": 0, "split_feature": 0, "threshold": 0.0,
         "left_child": 1, "right_child": 2},
        {"node_index": 1, "leaf_value": a},
        {"node_index": 2, "leaf_value": b},
    ]}}


def test_ensemble_weighted_sum_and_exponent():
    ens = {
        "feature_names": ["x"],
        "trained_models": [_tree((1.0, 2.0)), _tree((3.0, 5.0))],
        "aggregate_output": {"weighted_sum": {"weights": [0.5, 2.0]}},
    }
    m = EnsembleModel(ens)
    got = m.regression_values(_X([[-1], [1]]))
    assert got.tolist() == [0.5 * 1 + 2 * 3, 0.5 * 2 + 2 * 5]
    ens2 = dict(ens, aggregate_output={"exponent": {"weights": [1.0, 0.5]}})
    got2 = EnsembleModel(ens2).regression_values(_X([[-1], [1]]))
    np.testing.assert_allclose(got2, np.exp([1 + 1.5, 2 + 2.5]))


def test_ensemble_logistic_regression_binary():
    ens = {
        "feature_names": ["x"],
        "target_type": "classification",
        "classification_labels": ["no", "yes"],
        "trained_models": [_tree((-1.0, 1.0)), _tree((-0.5, 2.0))],
        "aggregate_output": {"logistic_regression": {"weights": [1.0, 1.0]}},
    }
    m = TrainedModelDefinition({"trained_model": {"ensemble": ens}})
    out = m.infer(pd.DataFrame({"x": [-3.0, 3.0]}))
    p_pos = sigmoid(np.array([-1.5, 3.0]))
    assert out["predicted_value"].tolist() == ["no", "yes"]
    np.testing.assert_allclose(out["prediction_probability"],
                               [1 - p_pos[0], p_pos[1]])


def test_ensemble_weighted_mode_votes():
    # members vote class ids; absent class frequency is -inf (softmax → 0)
    ens = {
        "feature_names": ["x"],
        "target_type": "classification",
        "classification_labels": ["a", "b", "c"],
        "trained_models": [_tree((0.0, 1.0)), _tree((0.0, 1.0)),
                           _tree((1.0, 2.0))],
        "aggregate_output": {"weighted_mode": {
            "weights": [1.0, 1.0, 3.0], "num_classes": 3}},
    }
    m = TrainedModelDefinition({"trained_model": {"ensemble": ens}})
    out = m.infer(pd.DataFrame({"x": [-1.0, 1.0]}), num_top_classes=-1)
    # x<=0: votes a,a(w1+1),b(w3) → freq a=2, b=3 → "b"
    # x>0:  votes b,b,c → freq b=2, c=3 → "c"
    assert out["predicted_value"].tolist() == ["b", "c"]
    probs0 = softmax(np.array([2.0, 3.0, -np.inf]))
    np.testing.assert_allclose(out["prediction_probability"][0], probs0[1])
    assert out["top_classes"][0][-1]["class_probability"] == 0.0


def test_weighted_mode_rejects_out_of_range_votes():
    ens = {
        "feature_names": ["x"],
        "target_type": "classification",
        "trained_models": [_tree((0.0, 5.0))],
        "aggregate_output": {"weighted_mode": {"num_classes": 2}},
    }
    with pytest.raises(ValueError, match="larger than expected"):
        EnsembleModel(ens).class_probabilities(_X([[1.0]]))


def test_classification_weights_rerank_scores():
    ens = {
        "feature_names": ["x"],
        "target_type": "classification",
        "classification_labels": ["a", "b"],
        "classification_weights": [4.0, 1.0],
        "trained_models": [_tree((-0.4, 0.4))],
        "aggregate_output": {"logistic_regression": {}},
    }
    m = TrainedModelDefinition({"trained_model": {"ensemble": ens}})
    out = m.infer(pd.DataFrame({"x": [1.0]}), num_top_classes=2)
    p1 = float(sigmoid(0.4))
    # probs = [1-p1, p1] ≈ [.40, .60] but scores = [4·.40, 1·.60] → "a" wins
    assert out["predicted_value"].tolist() == ["a"]
    assert out["prediction_probability"][0] == pytest.approx(1 - p1)
    assert out["prediction_score"][0] == pytest.approx(4 * (1 - p1))
    assert out["top_classes"][0][0]["class_name"] == "a"


def test_preprocessors_encode_before_extraction():
    defn = {
        "preprocessors": [
            {"one_hot_encoding": {"field": "color",
                                  "hot_map": {"red": "is_red",
                                              "blue": "is_blue"}}},
            {"frequency_encoding": {"field": "color",
                                    "feature_name": "color_freq",
                                    "frequency_map": {"red": 0.7,
                                                      "blue": 0.2}}},
            {"target_mean_encoding": {"field": "color",
                                      "feature_name": "color_mean",
                                      "target_map": {"red": 5.0},
                                      "default_value": -1.0}},
        ],
        "trained_model": {"tree": {
            "feature_names": ["is_red", "color_freq", "color_mean"],
            "tree_structure": [
                {"node_index": 0, "split_feature": 0, "threshold": 0.5,
                 "left_child": 1, "right_child": 2},
                {"node_index": 1, "leaf_value": 0.0},
                {"node_index": 2, "leaf_value": 1.0},
            ]}},
    }
    m = TrainedModelDefinition(defn)
    df = pd.DataFrame({"color": ["red", "blue", "green"]})
    X = m._features(df)
    np.testing.assert_allclose(X, [[1, 0.7, 5.0], [0, 0.2, -1.0],
                                   [0, 0.0, -1.0]])
    assert m.infer(df)["predicted_value"].tolist() == [1.0, 0.0, 0.0]


def test_missing_feature_column_is_nan_default_route():
    t = TreeModel(STUMP)
    m = TrainedModelDefinition({"trained_model": {"tree": STUMP}})
    out = m.infer(pd.DataFrame({"y": [1.0]}))  # no x column
    assert out["predicted_value"].tolist() == [10.0]  # default_left → left
    del t


def test_registry_and_ingest_processor(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.processors import Pipeline

    defn = {"trained_model": {"tree": STUMP}}
    put_trained_model("stump", defn)
    assert get_trained_model("stump") is not None
    pipe = Pipeline([{"inference": {"model": "stump"}}])
    df = pipe(pd.DataFrame({"x": [4.0, 6.0], "y": [1.0, 1.0]}))
    assert df["ml.inference.predicted_value"].tolist() == [10.0, 30.0]
    assert set(df["ml.inference.model_id"]) == {"stump"}

    ds = rd.from_pandas(pd.DataFrame({"x": [4.0, 6.0], "y": [1.0, 3.0]}))
    got = infer_dataset(ds, defn).to_pandas()
    assert got["ml.inference.predicted_value"].tolist() == [10.0, 30.0]
    delete_trained_model("stump")
    with pytest.raises(KeyError):
        get_trained_model("stump")


def test_field_map_renames_source_fields():
    defn = {"trained_model": {"tree": STUMP}}
    from elasticsearch_ray.ops.processors import InferenceProcessor

    p = InferenceProcessor(model=defn, field_map={"col_x": "x", "col_y": "y"})
    df = p(pd.DataFrame({"col_x": [4.0], "col_y": [1.0]}))
    assert df["ml.inference.predicted_value"].tolist() == [10.0]
