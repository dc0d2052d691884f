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


def test_continuous_pivot_checkpoints(ray_session, tmp_path):
    """TransformIndexer continuous mode: two checkpoints over a growing
    source == one batch pivot over the union; untouched keys carry over;
    an idle checkpoint rewrites nothing; reprocessed bounds are no-ops."""
    from elasticsearch_ray.pipelines.transform import (
        continuous_pivot,
        pivot_transform,
    )

    df = _events().sort_values("ts", ignore_index=True)
    cut = df["ts"].iloc[300]
    dest = str(tmp_path / "cont")

    # checkpoint 1: first 301 rows
    out1 = continuous_pivot(rd.from_pandas(df).repartition(4), dest,
                            ["kind"], {"total": ("sum", "v"),
                                       "n": ("count", "v")},
                            "ts", cut)
    want1 = pivot_transform(
        rd.from_pandas(df[df["ts"] <= cut]), str(tmp_path / "b1"),
        ["kind"], {"total": ("sum", "v"), "n": ("count", "v")})
    assert out1["n"].tolist() == want1["n"].tolist()
    assert np.allclose(out1["total"], want1["total"])

    # checkpoint 2: the rest — final dest == batch pivot over everything
    out2 = continuous_pivot(rd.from_pandas(df).repartition(4), dest,
                            ["kind"], {"total": ("sum", "v"),
                                       "n": ("count", "v")},
                            "ts", df["ts"].max())
    want2 = pivot_transform(
        rd.from_pandas(df), str(tmp_path / "b2"),
        ["kind"], {"total": ("sum", "v"), "n": ("count", "v")})
    assert out2["kind"].tolist() == want2["kind"].tolist()
    assert out2["n"].tolist() == want2["n"].tolist()
    assert np.allclose(out2["total"], want2["total"])

    # re-running the same bound serves the manifest (no-op)
    again = continuous_pivot(rd.from_pandas(df).repartition(4), dest,
                             ["kind"], {"total": ("sum", "v"),
                                        "n": ("count", "v")},
                             "ts", df["ts"].max())
    assert again["n"].tolist() == out2["n"].tolist()

    # idle checkpoint (no new rows): output unchanged, checkpoint bumps
    import json

    idle = continuous_pivot(rd.from_pandas(df).repartition(4), dest,
                            ["kind"], {"total": ("sum", "v"),
                                       "n": ("count", "v")},
                            "ts", df["ts"].max() + pd.Timedelta("1h"))
    assert idle["n"].tolist() == out2["n"].tolist()
    with open(os.path.join(dest, "transform_manifest.json")) as f:
        man = json.load(f)
    assert man["checkpoint"] == 3


def test_continuous_pivot_only_changed_keys_recomputed(ray_session,
                                                       tmp_path):
    """The change collector limits recomputation: a second slice touching
    only kind='b' leaves the other keys' rows byte-identical and the
    recompute sub-destination sees only the changed key."""
    from elasticsearch_ray.pipelines.transform import continuous_pivot

    df = pd.DataFrame({
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.arange(10), unit="h"),
        "kind": ["a"] * 4 + ["b"] * 4 + ["c"] * 2,
        "v": np.arange(10, dtype=np.float64),
    })
    # first 8 rows in checkpoint 1; the last two are 'c'... make slice 2
    # touch ONLY 'b': reorder so rows 8,9 are kind 'b'
    df.loc[8:, "kind"] = "b"
    dest = str(tmp_path / "cont2")
    args = (["kind"], {"total": ("sum", "v"), "n": ("count", "v")}, "ts")
    out1 = continuous_pivot(rd.from_pandas(df), dest, *args,
                            df["ts"].iloc[7])
    out2 = continuous_pivot(rd.from_pandas(df), dest, *args,
                            df["ts"].max())
    a1 = out1[out1["kind"] == "a"].reset_index(drop=True)
    a2 = out2[out2["kind"] == "a"].reset_index(drop=True)
    pd.testing.assert_frame_equal(a1, a2)
    assert int(out2[out2["kind"] == "b"]["n"].iloc[0]) == 6
    assert np.isclose(out2[out2["kind"] == "b"]["total"].iloc[0],
                      df[df["kind"] == "b"]["v"].sum())
    # recompute sub-destination only saw the changed key (its manifest
    # points at the LAST checkpoint's recompute file)
    import json

    with open(os.path.join(dest, "_recompute",
                           "transform_manifest.json")) as f:
        sub_man = json.load(f)
    sub = pd.read_parquet(os.path.join(dest, "_recompute",
                                       sub_man["data_file"]))
    assert set(sub["kind"]) == {"b"}


def test_continuous_pivot_window_bounds_raw_sync_with_date_floor(
        ray_session, tmp_path):
    """review r5 #3: when group_by IS a date_histogram of the sync field,
    the recompute pass must bound the window on the RAW sync value — a
    row past checkpoint_upper must not leak into its floored bucket."""
    from elasticsearch_ray.pipelines.transform import continuous_pivot

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:45",
                              "2024-01-01 11:10"]),
        "v": [1.0, 10.0, 100.0],
    })
    dest = str(tmp_path / "contw")
    args = (["ts"], {"n": ("count", "v"), "total": ("sum", "v")}, "ts")
    out1 = continuous_pivot(rd.from_pandas(df), dest, *args,
                            pd.Timestamp("2024-01-01 10:30"),
                            date_floor={"ts": "hour"})
    # the 10:00 bucket sees ONLY the 10:05 row at this checkpoint
    assert out1["n"].tolist() == [1]
    assert out1["total"].tolist() == [1.0]
    out2 = continuous_pivot(rd.from_pandas(df), dest, *args,
                            df["ts"].max(), date_floor={"ts": "hour"})
    assert out2["n"].tolist() == [2, 1]
    assert out2["total"].tolist() == [11.0, 100.0]
