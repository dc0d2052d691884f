"""x-pack ML trained-model inference — tree / ensemble models, vectorized.

Reference semantics (all public, cited per class):

- ``x-pack/plugin/core/.../ml/inference/trainedmodel/inference/
  TreeInferenceModel.java`` — getLeaf walks ``nodes[node.compare(features)]``;
  ``InnerNode.compare``: a non-finite feature routes to ``default_left``,
  else ``operator.test(feature, threshold)`` picks left/right.
  ``classificationProbability``: multi-value leaves → softMax, single-value
  leaves → one-hot over ``highOrderCategory + 1`` classes.
- ``EnsembleInferenceModel.java`` — member models produce value vectors;
  the ``aggregate_output`` processes + aggregates them.
- ``ensemble/WeightedSum.java`` (regression Σ wᵢ·vᵢ),
  ``LogisticRegression.java`` (Σ wᵢ·vᵢ → sigmoid / softMax),
  ``WeightedMode.java`` (weighted vote frequencies → softMax, absent class
  frequency −∞), ``Exponent.java`` (exp Σ wᵢ·vᵢ over finite terms).
- ``InferenceHelpers.java`` ``topClasses`` — scores = probabilities ×
  classification_weights (when given), sorted by score desc; entries carry
  (class_name, class_probability, class_score).
- ``preprocessing/OneHotEncoding.java`` (hot_map → 1/0 columns, null field
  skipped), ``FrequencyEncoding.java`` (frequency_map, unseen → 0.0),
  ``TargetMeanEncoding.java`` (target_map, unseen → default_value).
- ``ml/inference/ingest/InferenceProcessor.java`` — default target_field
  ``ml.inference``; results flattened under it.

Ray shape: a parsed model is a small immutable object of numpy arrays; the
ingest processor / Dataset stage holds it in the task closure (broadcast
once per worker, never re-shipped per batch) and every batch is inferred
with vectorized level-synchronous tree descent — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_OPS = {"lte": 0, "lt": 1, "gte": 2, "gt": 3}


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def softmax(v: np.ndarray, axis: int = -1) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64)
    m = np.max(v, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)  # all -inf rows stay -inf → 0/0 guard
    e = np.exp(v - m)
    return e / np.sum(e, axis=axis, keepdims=True)


class TreeModel:
    """One decision tree (``tree`` model), arrays-of-nodes layout.

    ``tree_structure`` rows follow TreeNode.java fields: node_index,
    decision_type (default lte), threshold, split_feature, default_left,
    left_child/right_child (absent = leaf), leaf_value (list or scalar).
    """

    def __init__(self, spec: dict):
        self.feature_names = list(spec["feature_names"])
        nodes = sorted(spec["tree_structure"], key=lambda n: n["node_index"])
        for i, nd in enumerate(nodes):
            if nd["node_index"] != i:
                raise ValueError("tree_structure node_index must be dense")
        n = len(nodes)
        self.left = np.full(n, -1, np.int64)
        self.right = np.full(n, -1, np.int64)
        self.feat = np.zeros(n, np.int64)
        self.thr = np.full(n, np.nan, np.float64)
        self.op = np.zeros(n, np.int8)
        self.default_left = np.zeros(n, bool)
        leaf_dim = 1
        for nd in nodes:
            lv = nd.get("leaf_value")
            if isinstance(lv, (list, tuple)):
                leaf_dim = max(leaf_dim, len(lv))
        self.leaf = np.zeros((n, leaf_dim), np.float64)
        self.is_leaf = np.zeros(n, bool)
        for i, nd in enumerate(nodes):
            if nd.get("left_child") is None:
                self.is_leaf[i] = True
                lv = nd.get("leaf_value", 0.0)
                lv = lv if isinstance(lv, (list, tuple)) else [lv]
                self.leaf[i, : len(lv)] = lv
            else:
                self.left[i] = nd["left_child"]
                self.right[i] = nd["right_child"]
                self.feat[i] = nd["split_feature"]
                self.thr[i] = nd["threshold"]
                self.op[i] = _OPS[nd.get("decision_type", "lte")]
                self.default_left[i] = bool(nd.get("default_left", False))
        self.target_type = spec.get("target_type", "regression")
        self.classification_labels = spec.get("classification_labels")
        self.leaf_dim = leaf_dim

    def traverse(self, X: np.ndarray) -> np.ndarray:
        """Level-synchronous vectorized descent: (n, F) → (n, leaf_dim)."""
        node = np.zeros(len(X), np.int64)
        while True:
            idx = np.flatnonzero(~self.is_leaf[node])
            if len(idx) == 0:
                break
            nd = node[idx]
            f = X[idx, self.feat[nd]]
            res = np.empty(len(idx), bool)
            opc = self.op[nd]
            t = self.thr[nd]
            for code, fn in ((0, np.less_equal), (1, np.less),
                             (2, np.greater_equal), (3, np.greater)):
                m = opc == code
                if m.any():
                    res[m] = fn(f[m], t[m])
            go_left = np.where(np.isfinite(f), res, self.default_left[nd])
            node[idx] = np.where(go_left, self.left[nd], self.right[nd])
        return self.leaf[node]

    def class_probabilities(self, values: np.ndarray) -> np.ndarray:
        """TreeInferenceModel.classificationProbability, batched."""
        if self.leaf_dim > 1:
            return softmax(values, axis=1)
        hi = int(np.rint(self.leaf.max()))
        out = np.zeros((len(values), hi + 1), np.float64)
        out[np.arange(len(values)), np.rint(values[:, 0]).astype(int)] = 1.0
        return out


class EnsembleModel:
    """``ensemble`` model: member trees + aggregate_output."""

    def __init__(self, spec: dict):
        self.feature_names = list(spec["feature_names"])
        self.models = []
        for m in spec["trained_models"]:
            if "tree" not in m:
                raise ValueError("ensemble members must be tree models")
            t = TreeModel(m["tree"])
            if t.feature_names != self.feature_names:
                raise ValueError("ensemble member feature_names must match")
            self.models.append(t)
        agg = spec.get("aggregate_output", {"weighted_sum": {}})
        (self.agg_name, agg_body), = agg.items()
        if self.agg_name not in ("weighted_sum", "logistic_regression",
                                 "weighted_mode", "exponent"):
            raise ValueError(f"unknown aggregate_output {self.agg_name!r}")
        w = agg_body.get("weights")
        if w is not None and len(w) != len(self.models):
            raise ValueError("weights must be the same length as models")
        self.weights = None if w is None else np.asarray(w, np.float64)
        self.num_classes = int(agg_body.get("num_classes", 0))
        self.target_type = spec.get("target_type", "regression")
        self.classification_labels = spec.get("classification_labels")
        cw = spec.get("classification_weights")
        self.classification_weights = (
            None if cw is None else np.asarray(cw, np.float64))
        self.leaf_dim = max(t.leaf_dim for t in self.models)

    def member_values(self, X: np.ndarray) -> np.ndarray:
        """(n_models, n_rows, leaf_dim) raw member outputs."""
        out = np.zeros((len(self.models), len(X), self.leaf_dim), np.float64)
        for j, t in enumerate(self.models):
            v = t.traverse(X)
            out[j, :, : v.shape[1]] = v
        return out

    def regression_values(self, X: np.ndarray) -> np.ndarray:
        vals = self.member_values(X)[:, :, 0]  # (m, n)
        w = self.weights if self.weights is not None else \
            np.ones(len(self.models))
        if self.agg_name == "weighted_sum":
            return np.einsum("mn,m->n", vals, w)
        if self.agg_name == "exponent":
            # Exponent.aggregate sums only FINITE processed values
            term = vals * w[:, None]
            term = np.where(np.isfinite(term), term, 0.0)
            return np.exp(term.sum(axis=0))
        raise ValueError(
            f"aggregate_output {self.agg_name} is not a regression aggregator")

    def class_probabilities(self, X: np.ndarray) -> np.ndarray:
        vals = self.member_values(X)  # (m, n, d)
        w = self.weights if self.weights is not None else \
            np.ones(len(self.models))
        if self.agg_name == "logistic_regression":
            s = np.einsum("mnd,m->nd", vals, w)
            if self.leaf_dim > 1:
                return softmax(s, axis=1)
            p1 = sigmoid(s[:, 0])
            return np.stack([1.0 - p1, p1], axis=1)
        if self.agg_name == "weighted_mode":
            if self.leaf_dim > 1:
                return softmax(np.einsum("mnd,m->nd", vals, w), axis=1)
            v = np.rint(vals[:, :, 0]).astype(np.int64)  # (m, n) votes
            k = self.num_classes or int(v.max()) + 1
            if v.max() >= k:
                raise ValueError("values contain entries larger than "
                                 f"expected max of [{k - 1}]")
            freq = np.full((len(X), k), -np.inf)
            for j in range(len(self.models)):
                row = np.arange(len(X))
                cur = freq[row, v[j]]
                freq[row, v[j]] = np.where(np.isfinite(cur), cur + w[j], w[j])
            return softmax(freq, axis=1)
        raise ValueError(
            f"aggregate_output {self.agg_name} is not a classification "
            f"aggregator")


def _apply_preprocessors(df: pd.DataFrame, preprocessors: list) -> pd.DataFrame:
    out = df
    for p in preprocessors or []:
        (kind, body), = p.items()
        field = body["field"]
        if field not in out.columns:
            continue  # reference process(): null field value → skip
        col = out[field].astype(str)
        if kind == "one_hot_encoding":
            cols = {feat: (col == val).astype(np.float64)
                    for val, feat in sorted(body["hot_map"].items())}
        elif kind == "frequency_encoding":
            m = body["frequency_map"]
            cols = {body["feature_name"]:
                    col.map(m).fillna(0.0).astype(np.float64)}
        elif kind == "target_mean_encoding":
            m = body["target_map"]
            cols = {body["feature_name"]:
                    col.map(m).fillna(float(body.get("default_value", 0.0)))
                       .astype(np.float64)}
        else:
            raise ValueError(f"unknown preprocessor {kind!r}")
        out = out.assign(**cols)
    return out


class TrainedModelDefinition:
    """Parsed TrainedModelDefinition: preprocessors + tree|ensemble model."""

    def __init__(self, definition: dict):
        self.preprocessors = list(definition.get("preprocessors") or [])
        tm = definition["trained_model"]
        if "tree" in tm:
            self.model = TreeModel(tm["tree"])
        elif "ensemble" in tm:
            self.model = EnsembleModel(tm["ensemble"])
        else:
            raise ValueError("trained_model must be a tree or an ensemble")
        self.target_type = self.model.target_type

    def _features(self, df: pd.DataFrame) -> np.ndarray:
        df = _apply_preprocessors(df, self.preprocessors)
        cols = []
        for f in self.model.feature_names:
            if f in df.columns:
                cols.append(pd.to_numeric(df[f], errors="coerce")
                            .to_numpy(np.float64, na_value=np.nan))
            else:
                cols.append(np.full(len(df), np.nan))
        return np.column_stack(cols) if cols else np.empty((len(df), 0))

    def infer(self, df: pd.DataFrame, num_top_classes: int = 0) -> dict:
        """Batch inference → column dict (predicted_value [, probability,
        score, top_classes])."""
        X = self._features(df)
        if self.target_type == "regression":
            if isinstance(self.model, TreeModel):
                vals = self.model.traverse(X)[:, 0]
            else:
                vals = self.model.regression_values(X)
            return {"predicted_value": vals}
        # classification
        if isinstance(self.model, TreeModel):
            probs = self.model.class_probabilities(self.model.traverse(X))
        else:
            probs = self.model.class_probabilities(X)
        cw = getattr(self.model, "classification_weights", None)
        scores = probs if cw is None else probs * cw[None, :]
        best = np.argmax(scores, axis=1)
        labels = self.model.classification_labels or [
            str(i) for i in range(probs.shape[1])]
        rows = np.arange(len(best))
        out = {
            "predicted_value": np.asarray(labels, object)[best],
            "prediction_probability": probs[rows, best],
            "prediction_score": scores[rows, best],
        }
        if num_top_classes:
            k = probs.shape[1] if num_top_classes < 0 else \
                min(num_top_classes, probs.shape[1])
            order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
            out["top_classes"] = [
                [{"class_name": labels[j],
                  "class_probability": float(probs[i, j]),
                  "class_score": float(scores[i, j])} for j in order[i]]
                for i in range(len(best))
            ]
        return out


# ---- model registry (PUT/GET/DELETE _ml/trained_models analog) ----

_MODELS: dict[str, TrainedModelDefinition] = {}


def put_trained_model(model_id: str, definition: dict) -> TrainedModelDefinition:
    m = TrainedModelDefinition(definition)
    _MODELS[model_id] = m
    return m


def get_trained_model(model_id: str) -> TrainedModelDefinition:
    if model_id not in _MODELS:
        raise KeyError(f"trained model [{model_id}] not found")
    return _MODELS[model_id]


def delete_trained_model(model_id: str) -> None:
    _MODELS.pop(model_id, None)


def infer_dataset(ds, definition: dict, field_map: dict | None = None,
                  target_field: str = "ml.inference",
                  num_top_classes: int = 0):
    """Dataset stage: append flattened ``{target_field}.*`` inference columns
    (InferenceProcessor writeResult analog). The parsed model lives in the
    task closure — broadcast once per worker, vectorized per batch."""
    model = TrainedModelDefinition(definition)
    fmap = dict(field_map or {})

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        src = df.rename(columns=fmap) if fmap else df
        res = model.infer(src, num_top_classes=num_top_classes)
        out = df.copy()
        for k, v in res.items():
            out[f"{target_field}.{k}"] = (
                pd.Series(list(v), index=out.index) if k == "top_classes"
                else v)
        return out

    return ds.map_batches(fn, batch_format="pandas")
