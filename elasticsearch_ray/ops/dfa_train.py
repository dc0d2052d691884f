"""x-pack ML data frame analytics — regression & classification TRAINING.

Reference surface (all public):

- ``x-pack/plugin/core/.../ml/dataframe/analyses/Regression.java`` /
  ``Classification.java`` — analysis configs named ``dependent_variable``,
  ``eta``, ``gamma``, ``lambda``, ``max_trees``, ``feature_bag_fraction``,
  ``prediction_field_name``, ``training_percent``, ``randomize_seed``.
- ``x-pack/plugin/ml/.../dataframe/DataFrameAnalyticsManager.java`` — job
  orchestration: reindex source → dest, train on the ``training_percent``
  split, write per-row predictions + ``ml.is_training`` back to dest.
- The boosted-tree trainer itself lives in the reference's native ml-cpp
  sibling repo (``CBoostedTree*``); its published semantics are standard
  gradient-boosted trees. This module implements the public
  histogram-GBT formulation (Chen & Guestrin, KDD'16 — split gain eq. 7,
  leaf weight eq. 5) distributed over Ray Data, and emits a model in the
  EXACT ``TrainedModelDefinition`` ensemble format served by
  :mod:`elasticsearch_ray.ops.inference` — so a trained job is immediately
  consumable by the inference processor / ``infer_dataset`` stage, like the
  reference's trained-model handoff.

Ray / scale shape:

- **Binning** — per-feature quantile bin edges from a value-hash row
  sample (rows kept when ``splitmix64(feature-bytes) < p``): bounded
  driver memory, ONE streaming pass, and the sampled multiset depends
  only on row VALUES — never on block layout.
- **The training matrix is binned once** to uint8 codes (+ float target)
  and materialized; the boosting loop re-reads those blocks, never the
  source parquet.
- **Each tree level is one map_batches pass** emitting fixed-point int64
  ``(grad, hess, count)`` histograms per (open node, feature, bin) — an
  associative reduce of ``nodes*F*(B+1)*3`` int64 per batch; split choice
  is a driver-side argmax over that small array.
- **Gradients are quantized to fixed-point int64** before the cross-block
  reduce, so histogram sums are order-independent and the fitted model is
  bit-identical across block layouts (see the repo's fp-sum dev-notes
  lesson; regression targets are standardized internally so quantization
  error is relative, and leaf values are un-scaled on emission).
- Missing values (NaN) occupy a dedicated bin and always route LEFT; the
  emitted trees set ``default_left=true`` so serving reproduces training
  routing exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from elasticsearch_ray.ops.inference import sigmoid

_FP = float(1 << 20)  # fixed-point scale for gradient/hessian quantization
_C1 = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(h: np.ndarray) -> np.ndarray:
    h = h ^ _C1
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _row_value_hash(X: np.ndarray) -> np.ndarray:
    """uint64 per row from the float64 BIT PATTERNS of the feature matrix —
    depends only on values, never on row position or block layout."""
    with np.errstate(all="ignore"):
        h = np.zeros(len(X), np.uint64)
        for j in range(X.shape[1]):
            col = np.ascontiguousarray(X[:, j], np.float64).view(np.uint64)
            h = _splitmix(h * _C1 ^ _splitmix(col + np.uint64(j + 1)))
    return h


def _round_sig(x: float, sig: int = 12) -> float:
    """Round to significant digits: wipes 1e-15-relative fp-order noise in
    driver-side float moments so derived constants are layout-stable."""
    if x == 0 or not np.isfinite(x):
        return float(x)
    from math import floor, log10

    return float(round(x, sig - 1 - floor(log10(abs(x)))))


# ------------------------------------------------------------- features


def _feature_frame(df: pd.DataFrame, features: list[str],
                   preprocessors: list) -> np.ndarray:
    """(n, F) float64 matrix after frequency-encoding categorical columns."""
    cols = []
    freq = {p["frequency_encoding"]["field"]:
            p["frequency_encoding"] for p in preprocessors}
    for f in features:
        if f in freq:
            body = freq[f]
            m = body["frequency_map"]
            cols.append(df[f].astype(str).map(m).fillna(0.0)
                        .to_numpy(np.float64))
        else:
            cols.append(pd.to_numeric(df[f], errors="coerce")
                        .to_numpy(np.float64, na_value=np.nan))
    return np.column_stack(cols) if cols else np.empty((len(df), 0))


def _frequency_preprocessors(ds, features, str_cols, max_card=100):
    """Distributed frequency encoding for categorical features
    (``preprocessing/FrequencyEncoding.java``): per-value counts via one
    map-side-combined groupby; top ``max_card`` kept (count desc, value
    asc — deterministic), the tail maps to 0."""
    out = []
    for f in features:
        if f not in str_cols:
            continue
        from ray.data.aggregate import Count

        vc = ds.groupby(f).aggregate(Count(alias_name="n")).to_pandas()
        total = int(vc["n"].sum())
        vc = vc.sort_values(["n", f], ascending=[False, True],
                            kind="mergesort").head(max_card)
        fmap = {str(k): float(n) / total for k, n in zip(vc[f], vc["n"])}
        out.append({"frequency_encoding": {
            "field": f, "feature_name": f"{f}_frequency",
            "frequency_map": fmap}})
    return out


def _quantile_edges(ds, features, preprocessors, num_bins, sample_cap):
    """Per-feature interior bin edges from a value-hash sample (one pass)."""
    n = ds.count()
    p = min(1.0, float(sample_cap) / max(n, 1))
    thresh = np.uint64(min(int(p * float(2**64 - 1)), 2**64 - 1))

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        X = _feature_frame(df, features, preprocessors)
        keep = _row_value_hash(X) <= thresh
        return pd.DataFrame(X[keep], columns=[f"f{j}" for j
                                              in range(len(features))])

    samp = ds.map_batches(sample, batch_format="pandas").to_pandas()
    edges = []
    for j in range(len(features)):
        v = np.sort(samp[f"f{j}"].to_numpy(np.float64))
        v = v[np.isfinite(v)]
        if len(v) == 0:
            edges.append(np.zeros(0, np.float64))
            continue
        qs = np.quantile(v, np.linspace(0, 1, num_bins + 1)[1:-1])
        edges.append(np.unique(qs))
    return edges


def _bin_matrix(X: np.ndarray, edges: list[np.ndarray]) -> np.ndarray:
    """codes[i, j] = #edges[j] < X[i, j] (so ``x <= edges[b]`` ⇔
    ``code <= b``); NaN → the dedicated missing bin len(edges[j])+... B."""
    n, F = X.shape
    codes = np.zeros((n, F), np.uint8)
    for j in range(F):
        x = X[:, j]
        c = np.searchsorted(edges[j], x, side="left")
        c = np.where(np.isfinite(x), c, len(edges[j]) + 1)
        codes[:, j] = c.astype(np.uint8)
    return codes


# ------------------------------------------------------------- tree repr


class _Tree:
    """A tree under construction, splits in BIN space."""

    def __init__(self):
        self.left = [-1]
        self.right = [-1]
        self.feat = [0]
        self.bin_thr = [0]
        self.value = [0.0]

    def add_split(self, node: int, feat: int, bin_thr: int) -> tuple[int, int]:
        li, ri = len(self.left), len(self.left) + 1
        self.left[node], self.right[node] = li, ri
        self.feat[node], self.bin_thr[node] = feat, bin_thr
        for _ in range(2):
            self.left.append(-1)
            self.right.append(-1)
            self.feat.append(0)
            self.bin_thr.append(0)
            self.value.append(0.0)
        return li, ri

    def assign(self, codes: np.ndarray) -> np.ndarray:
        """Vectorized node assignment over binned rows (missing bin routes
        left because its code is > every split bin? NO — missing code is
        B+? which is > thr, so explicitly: missing bin == max code routes
        LEFT by rule)."""
        left = np.asarray(self.left)
        right = np.asarray(self.right)
        feat = np.asarray(self.feat)
        thr = np.asarray(self.bin_thr)
        node = np.zeros(len(codes), np.int64)
        while True:
            idx = np.flatnonzero(left[node] >= 0)
            if len(idx) == 0:
                return node
            nd = node[idx]
            c = codes[idx, feat[nd]]
            miss = c == np.uint8(255)
            go_left = (c <= thr[nd]) | miss
            node[idx] = np.where(go_left, left[nd], right[nd])

    def to_spec(self, features: list[str], edges: list[np.ndarray],
                scale: float) -> dict:
        """Emit the reference TreeNode.java array layout with REAL-valued
        thresholds (x <= edges[j][b] ⇔ code <= b, exact for all reals)."""
        nodes = []
        for i in range(len(self.left)):
            if self.left[i] < 0:
                nodes.append({"node_index": i,
                              "leaf_value": self.value[i] * scale})
            else:
                j, b = self.feat[i], self.bin_thr[i]
                nodes.append({
                    "node_index": i, "split_feature": j,
                    "threshold": float(edges[j][b]),
                    "decision_type": "lte", "default_left": True,
                    "left_child": self.left[i],
                    "right_child": self.right[i]})
        return {"feature_names": list(features), "tree_structure": nodes,
                "target_type": "regression"}


def _leaf_tree(features: list[str], value: float) -> dict:
    return {"feature_names": list(features),
            "tree_structure": [{"node_index": 0, "leaf_value": value}],
            "target_type": "regression"}


# ------------------------------------------------------------- training


def _hist_pass(binned, tree, open_nodes, F, B, objective):
    """One distributed pass: fixed-point (g, h, count) histograms per
    (open node, feature, bin) — the only cross-block reduce per level.
    The boosting margin rides a persisted per-row column ("m", folded
    in once per FINISHED tree), so each pass evaluates only the tree
    under construction — linear, not quadratic, in tree count."""
    n_open = len(open_nodes)
    size = n_open * F * (B + 1) * 3
    pos_arr = np.full(len(tree.left), -1, np.int64)
    pos_arr[np.asarray(open_nodes)] = np.arange(n_open)

    def fn(batch: dict) -> dict:
        codes = batch["codes"].reshape(len(batch["y"]), F)
        y = batch["y"]
        m = batch["m"]
        if objective == "mse":
            g, h = m - y, np.ones_like(y)
        else:
            p = sigmoid(m)
            g, h = p - y, p * (1.0 - p)
        gq = np.rint(g * _FP).astype(np.int64)
        hq = np.rint(h * _FP).astype(np.int64)
        nl = pos_arr[tree.assign(codes)]
        sel = nl >= 0
        hist = np.zeros(size, np.int64)
        if sel.any():
            codes, gq, hq, nl = codes[sel], gq[sel], hq[sel], nl[sel]
            cc = np.minimum(codes.astype(np.int64), B)  # missing bin → B
            for j in range(F):
                base_idx = (nl * F + j) * (B + 1) + cc[:, j]
                np.add.at(hist, base_idx * 3 + 0, gq)
                np.add.at(hist, base_idx * 3 + 1, hq)
                np.add.at(hist, base_idx * 3 + 2, 1)
        return {"hist": hist.reshape(1, size)}

    parts = binned.map_batches(fn, batch_format="numpy",
                               batch_size=None).take_all()
    total = np.zeros(size, np.int64)
    for r in parts:
        total += np.asarray(r["hist"], np.int64)
    return total.reshape(n_open, F, B + 1, 3)


def _best_split(hist_node, lam, gamma, min_child):
    """XGBoost eq. 7 gain over cumulative bins; missing bin rides LEFT."""
    F, Bp1, _ = hist_node.shape
    B = Bp1 - 1
    G = hist_node[:, :, 0].astype(np.float64) / _FP
    H = hist_node[:, :, 1].astype(np.float64) / _FP
    C = hist_node[:, :, 2]
    Gt, Ht, Ct = G.sum(1), H.sum(1), C.sum(1)
    if B < 2:
        return None
    GL = np.cumsum(G[:, :B], axis=1)[:, :-1] + G[:, B:B + 1]
    HL = np.cumsum(H[:, :B], axis=1)[:, :-1] + H[:, B:B + 1]
    CL = np.cumsum(C[:, :B], axis=1)[:, :-1] + C[:, B:B + 1]
    GR, HR, CR = Gt[:, None] - GL, Ht[:, None] - HL, Ct[:, None] - CL
    parent = (Gt ** 2) / (Ht + lam)
    gain = 0.5 * (GL ** 2 / (HL + lam) + GR ** 2 / (HR + lam)
                  - parent[:, None]) - gamma
    gain = np.where((CL >= min_child) & (CR >= min_child), gain, -np.inf)
    j, b = np.unravel_index(np.argmax(gain), gain.shape)
    if not np.isfinite(gain[j, b]) or gain[j, b] <= 0:
        return None
    return int(j), int(b), float(gain[j, b])


def fit_gbt(ds, features: list[str], dependent_variable: str, *,
            objective: str = "mse", eta: float = 0.3, max_trees: int = 20,
            max_depth: int = 4, lam: float = 1.0, gamma: float = 0.0,
            num_bins: int = 64, min_child: int = 1,
            sample_cap: int = 50_000) -> tuple[dict, dict]:
    """Distributed histogram GBT. Returns ``(definition, meta)`` where
    ``definition`` is a TrainedModelDefinition dict (preprocessors +
    ensemble) and ``meta`` carries feature importances and loop stats."""
    if objective not in ("mse", "binary_logloss"):
        raise ValueError(f"unsupported objective {objective!r}")
    if not 2 <= num_bins <= 250:
        raise ValueError("num_bins must be in [2, 250] (255 is the "
                         "missing-bin sentinel)")
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    import pyarrow as pa

    def _is_str(t) -> bool:
        if isinstance(t, pa.DataType):
            return pa.types.is_string(t) or pa.types.is_large_string(t)
        return t in (str, object, np.object_)  # pandas-backed schema

    str_cols = {f for f in features if f in types and _is_str(types[f])}
    pre = _frequency_preprocessors(ds, features, str_cols)
    feat_names = [f"{f}_frequency" if f in str_cols else f
                  for f in features]

    labels = None
    if objective == "binary_logloss":
        uniq = ds.unique(dependent_variable)
        labels = sorted(str(v) for v in uniq)
        if len(labels) != 2:
            raise ValueError(
                f"binary classification needs exactly 2 classes, got "
                f"{labels}")

    edges = _quantile_edges(ds, features, pre, num_bins, sample_cap)
    B = max((len(e) for e in edges), default=1) + 1  # interior bins + tail
    F = len(features)

    pos_label = labels[1] if labels else None

    def to_binned(df: pd.DataFrame) -> dict:
        X = _feature_frame(df, features, pre)
        codes = _bin_matrix(X, edges)
        if objective == "mse":
            y = pd.to_numeric(df[dependent_variable], errors="coerce") \
                .to_numpy(np.float64, na_value=np.nan)
        else:
            y = (df[dependent_variable].astype(str) == pos_label) \
                .to_numpy(np.float64)
        # missing bin is per-feature len(edges)+1; normalize to sentinel 255
        for j in range(F):
            codes[:, j] = np.where(codes[:, j] == len(edges[j]) + 1,
                                   np.uint8(255), codes[:, j])
        return {"codes": codes.reshape(len(df), F),
                "y": y}

    binned = ds.map_batches(to_binned, batch_format="pandas",
                            zero_copy_batch=True).materialize()

    # base score + (for mse) internal target standardization
    n = binned.count()
    if objective == "mse":
        stats = binned.map_batches(
            lambda b: {"s": np.asarray([[np.nansum(b["y"]),
                                         np.nansum(b["y"] ** 2),
                                         float(np.isfinite(b["y"]).sum())]])},
            batch_format="numpy", batch_size=None).take_all()
        tot = np.zeros(3)
        for r in stats:
            tot += np.asarray(r["s"], np.float64).reshape(3)
        mu = _round_sig(tot[0] / max(tot[2], 1.0))
        var = max(tot[1] / max(tot[2], 1.0) - mu * mu, 1e-24)
        sd = _round_sig(float(np.sqrt(var)))
        base_internal, base_out, scale = 0.0, mu, sd

        def std(b):
            return {"codes": b["codes"],
                    "y": (b["y"] - mu) / sd,
                    "m": np.zeros(len(b["y"]), np.float64)}
        binned = binned.map_batches(std, batch_format="numpy",
                                    batch_size=None).materialize()
    else:
        pos = binned.map_batches(
            lambda b: {"s": np.asarray([[float(b["y"].sum())]])},
            batch_format="numpy", batch_size=None).take_all()
        npos = sum(float(np.asarray(r["s"]).reshape(1)[0]) for r in pos)
        pbar = min(max(npos / max(n, 1), 1e-6), 1 - 1e-6)
        base_internal = _round_sig(float(np.log(pbar / (1 - pbar))))
        base_out, scale = base_internal, 1.0

        def init_m(b, base=base_internal):
            return {"codes": b["codes"], "y": b["y"],
                    "m": np.full(len(b["y"]), base, np.float64)}
        binned = binned.map_batches(init_m, batch_format="numpy",
                                    batch_size=None).materialize()

    trees: list[_Tree] = []
    importance = np.zeros(F, np.float64)
    for _ in range(max_trees):
        tree = _Tree()
        open_nodes = [0]
        any_split = False
        for _depth in range(max_depth):
            if not open_nodes:
                break
            hist = _hist_pass(binned, tree, open_nodes, F, B, objective)
            nxt = []
            for i, node in enumerate(open_nodes):
                pick = _best_split(hist[i], lam, gamma, min_child)
                Gt = hist[i, :, :, 0].sum() / (F * _FP)
                Ht = hist[i, :, :, 1].sum() / (F * _FP)
                if pick is None:
                    tree.value[node] = -eta * Gt / (Ht + lam)
                    continue
                j, b, g = pick
                li, ri = tree.add_split(node, j, b)
                importance[j] += g
                any_split = True
                nxt.extend([li, ri])
            open_nodes = nxt
        if open_nodes:  # max_depth reached: finalize leaves in one pass
            hist = _hist_pass(binned, tree, open_nodes, F, B, objective)
            for i, node in enumerate(open_nodes):
                Gt = hist[i, :, :, 0].sum() / (F * _FP)
                Ht = hist[i, :, :, 1].sum() / (F * _FP)
                tree.value[node] = -eta * Gt / (Ht + lam)
        trees.append(tree)
        # fold the finished tree into the persisted margin column ONCE
        # (same per-row float64 add order as recomputation: tree order)
        vals = np.asarray(tree.value, np.float64)

        def fold(b, tree=tree, vals=vals):
            codes = b["codes"].reshape(len(b["y"]), F)
            return {"codes": b["codes"], "y": b["y"],
                    "m": b["m"] + vals[tree.assign(codes)]}
        binned = binned.map_batches(fold, batch_format="numpy",
                                    batch_size=None).materialize()
        if not any_split:
            break

    members = [{"tree": _leaf_tree(feat_names, base_out)}]
    members += [{"tree": t.to_spec(feat_names, edges, scale)}
                for t in trees]
    if objective == "mse":
        ens = {"feature_names": feat_names, "trained_models": members,
               "aggregate_output": {"weighted_sum": {}},
               "target_type": "regression"}
    else:
        ens = {"feature_names": feat_names, "trained_models": members,
               "aggregate_output": {"logistic_regression": {}},
               "target_type": "classification",
               "classification_labels": labels}
    definition = {"preprocessors": pre, "trained_model": {"ensemble": ens}}
    meta = {
        "num_trees": len(trees), "base_score": base_out,
        "objective": objective,
        "feature_importance": {features[j]: float(importance[j])
                               for j in range(F)},
    }
    return definition, meta


# ------------------------------------------------------------- job API


def start_data_frame_analytics(ds, *, dependent_variable: str,
                               analysis: str = "regression",
                               features: list[str],
                               id_column: str,
                               training_percent: float = 100.0,
                               prediction_field_name: str | None = None,
                               randomize_seed: int = 42,
                               **hyperparams):
    """DataFrameAnalyticsManager analog: split → train on the training
    rows → write predictions + ``ml.is_training`` over the FULL dataset.
    Returns ``(dest_ds, definition, meta)``."""
    if analysis not in ("regression", "classification"):
        raise ValueError(f"unsupported analysis {analysis!r}")
    frac = np.uint64(min(int(min(max(training_percent, 0.0), 100.0)
                             / 100.0 * float(2**64 - 1)), 2**64 - 1))
    seed = np.uint64(randomize_seed)

    def is_training(ids: np.ndarray) -> np.ndarray:
        return _splitmix(ids.astype(np.uint64) * _C1 ^ seed) <= frac

    if training_percent >= 100.0:
        train = ds
    else:
        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[is_training(df[id_column].to_numpy(np.uint64))]
        train = ds.map_batches(keep, batch_format="pandas")

    objective = "mse" if analysis == "regression" else "binary_logloss"
    definition, meta = fit_gbt(train, features, dependent_variable,
                               objective=objective, **hyperparams)

    pred_name = prediction_field_name or f"{dependent_variable}_prediction"
    from elasticsearch_ray.ops.inference import TrainedModelDefinition

    model = TrainedModelDefinition(definition)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        res = model.infer(df)
        out = df.copy()
        out[f"ml.{pred_name}"] = res["predicted_value"]
        if analysis == "classification":
            out["ml.prediction_probability"] = res["prediction_probability"]
        out["ml.is_training"] = is_training(
            df[id_column].to_numpy(np.uint64))
        return out

    return ds.map_batches(apply, batch_format="pandas"), definition, meta
