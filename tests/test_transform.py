"""x-pack transform module analog (pipelines/transform.py): pivot and
latest with checkpoint/resume manifests."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _events():
    rng = np.random.default_rng(6)
    n = 500
    return pd.DataFrame({
        "uid": rng.integers(0, 40, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.permutation(n) * 977, unit="s"),
        "kind": rng.choice(["a", "b", "c"], n),
        "v": rng.normal(10, 3, n),
    })


def test_pivot_transform(ray_session, tmp_path):
    from elasticsearch_ray.pipelines.transform import pivot_transform

    df = _events()
    dest = str(tmp_path / "pivot")
    out = pivot_transform(rd.from_pandas(df).repartition(4), dest,
                          group_by=["kind"],
                          aggs={"n": ("count", ""), "total": ("sum", "v"),
                                "mean_v": ("avg", "v"), "mx": ("max", "v")})
    want = df.groupby("kind").agg(n=("v", "size"), total=("v", "sum"),
                                  mean_v=("v", "mean"), mx=("v", "max"))
    for k in want.index:
        row = out[out["kind"] == k].iloc[0]
        assert row["n"] == want.loc[k, "n"]
        np.testing.assert_allclose(row["total"], want.loc[k, "total"])
        np.testing.assert_allclose(row["mean_v"], want.loc[k, "mean_v"])
    assert os.path.exists(os.path.join(dest, "transform_manifest.json"))

    # resume: same spec + fingerprint reads the destination, no recompute
    data = [f for f in os.listdir(dest) if f.startswith("dest-")][0]
    mt = os.path.getmtime(os.path.join(dest, data))
    out2 = pivot_transform(rd.from_pandas(df), dest, group_by=["kind"],
                           aggs={"n": ("count", ""), "total": ("sum", "v"),
                                 "mean_v": ("avg", "v"), "mx": ("max", "v")})
    assert os.path.getmtime(os.path.join(dest, data)) == mt
    pd.testing.assert_frame_equal(out, out2)

    with pytest.raises(ValueError, match="unknown pivot aggregation"):
        pivot_transform(rd.from_pandas(df), str(tmp_path / "bad"),
                        group_by=["kind"], aggs={"x": ("median", "v")})


def test_pivot_date_histogram_group(ray_session, tmp_path):
    from elasticsearch_ray.pipelines.transform import pivot_transform

    df = _events()
    out = pivot_transform(rd.from_pandas(df), str(tmp_path / "pivot2"),
                          group_by=["ts"], date_floor={"ts": "day"},
                          aggs={"n": ("count", "")})
    want = df.groupby(df["ts"].dt.floor("D")).size()
    assert out["n"].tolist() == want.tolist()


def test_transform_stale_manifest_cannot_serve_wrong_data(ray_session, tmp_path):
    """Crash-safety (review finding): the manifest points at a data file
    whose NAME embeds the spec key, so new data written without a manifest
    update can never be served as the old spec's result."""
    import json

    from elasticsearch_ray.pipelines.transform import pivot_transform

    df = _events()
    dest = str(tmp_path / "crash")
    a = pivot_transform(rd.from_pandas(df), dest, group_by=["kind"],
                        aggs={"n": ("count", "")})
    # simulate: a NEW spec's data file landed but the manifest write died
    files = [f for f in os.listdir(dest) if f.startswith("dest-")]
    assert len(files) == 1
    pd.DataFrame({"kind": ["x"], "n": [1]}).to_parquet(
        os.path.join(dest, "dest-deadbeef0000.parquet"))
    # resume of spec A still returns A's rows (reads A's file by name)
    a2 = pivot_transform(rd.from_pandas(df), dest, group_by=["kind"],
                         aggs={"n": ("count", "")})
    pd.testing.assert_frame_equal(a, a2)
    # fingerprint change → recompute, not stale cache
    b = pivot_transform(rd.from_pandas(df), dest, group_by=["kind"],
                        aggs={"n": ("count", "")},
                        input_fingerprint="new-input")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))
    with open(os.path.join(dest, "transform_manifest.json")) as f:
        assert json.load(f)["input_fingerprint"] == "new-input"


def test_latest_transform(ray_session, tmp_path):
    from elasticsearch_ray.pipelines.transform import latest_transform

    df = _events()
    dest = str(tmp_path / "latest")
    out = latest_transform(rd.from_pandas(df).repartition(5), dest,
                           unique_key="uid", sort_col="ts")
    want = df.sort_values(["uid", "ts"]).groupby("uid").tail(1)
    assert len(out) == df["uid"].nunique()
    merged = out.merge(want, on="uid", suffixes=("", "_w"))
    assert (merged["ts"] == merged["ts_w"]).all()
    assert (merged["v"] == merged["v_w"]).all()
    # resume path
    data = [f for f in os.listdir(dest) if f.startswith("dest-")][0]
    mt = os.path.getmtime(os.path.join(dest, data))
    latest_transform(rd.from_pandas(df), dest, unique_key="uid",
                     sort_col="ts")
    assert os.path.getmtime(os.path.join(dest, data)) == mt
