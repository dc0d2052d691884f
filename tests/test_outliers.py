"""Outlier detection (dataframe analytics, OutlierDetection.java methods)
vs brute-force oracles on planted outliers."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.outliers import outlier_detection


def _frame(n=120, d=4, outliers=(100.0, -80.0)):
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (n, d))
    for i, off in enumerate(outliers):
        X[i] = off  # rows 0,1 are far-away outliers
    return pd.DataFrame({"vec_id": np.arange(n),
                         "embedding": list(X.astype(np.float32))})


def _brute_knn(X, k):
    d = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k]
    nd = np.take_along_axis(d, idx, axis=1)
    return idx, nd


@pytest.mark.parametrize("method", ["distance_kth_nn", "distance_knn",
                                    "ldof", "lof"])
def test_planted_outliers_rank_top(ray_session, method):
    import ray.data as rd

    df = _frame()
    out = outlier_detection(rd.from_pandas(df), n_neighbors=5, method=method)
    top2 = set(out.nlargest(2, "outlier_score")["vec_id"])
    assert top2 == {0, 1}
    assert out["outlier_score"].max() == 1.0
    assert (out["outlier_score"] > 0).all()


def test_kth_nn_and_knn_scores_exact(ray_session):
    import ray.data as rd

    df = _frame(n=60)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mu, sd = X.mean(0), X.std(0)
    Xs = (X - mu) / np.where(sd == 0, 1, sd)
    _, nd = _brute_knn(Xs, 5)
    got = outlier_detection(rd.from_pandas(df), n_neighbors=5,
                            method="distance_kth_nn", chunk=17)
    np.testing.assert_allclose(got["score"], nd[:, -1], rtol=1e-9)
    got2 = outlier_detection(rd.from_pandas(df), n_neighbors=5,
                             method="distance_knn", chunk=17)
    np.testing.assert_allclose(got2["score"], nd.mean(1), rtol=1e-9)


def test_lof_matches_textbook_definition(ray_session):
    import ray.data as rd

    df = _frame(n=50, d=3)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mu, sd = X.mean(0), X.std(0)
    Xs = (X - mu) / np.where(sd == 0, 1, sd)
    k = 4
    idx, nd = _brute_knn(Xs, k)
    kdist = nd[:, -1]
    reach = np.maximum(nd, kdist[idx])
    lrd = 1.0 / reach.mean(axis=1)
    lof = lrd[idx].mean(axis=1) / lrd
    got = outlier_detection(rd.from_pandas(df), n_neighbors=k, method="lof",
                            chunk=13)
    np.testing.assert_allclose(got["score"], lof, rtol=1e-9)


def test_ldof_matches_definition(ray_session):
    import ray.data as rd

    df = _frame(n=40, d=3)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mu, sd = X.mean(0), X.std(0)
    Xs = (X - mu) / np.where(sd == 0, 1, sd)
    k = 5
    idx, nd = _brute_knn(Xs, k)
    want = np.empty(len(Xs))
    for i in range(len(Xs)):
        nb = Xs[idx[i]]
        pd_ = np.sqrt(((nb[:, None, :] - nb[None, :, :]) ** 2).sum(-1))
        want[i] = nd[i].mean() / pd_[np.triu_indices(k, 1)].mean()
    got = outlier_detection(rd.from_pandas(df), n_neighbors=k,
                            method="ldof", chunk=11)
    np.testing.assert_allclose(got["score"], want, rtol=1e-9)


def test_standardization_toggle_and_validation(ray_session):
    import ray.data as rd

    df = _frame(n=30)
    raw = outlier_detection(rd.from_pandas(df), method="distance_knn",
                            standardization_enabled=False)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    _, nd = _brute_knn(X, 5)
    np.testing.assert_allclose(raw["score"], nd.mean(1), rtol=1e-9)
    with pytest.raises(ValueError, match="unknown outlier method"):
        outlier_detection(rd.from_pandas(df), method="zscore")
