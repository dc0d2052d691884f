"""Range field types (RangeFieldMapper/RangeType): relation queries
intersects/within/contains, exclusive-bound folding, open stored sides,
date_range and ip_range variants."""

import numpy as np
import pandas as pd
import ray

from elasticsearch_ray.ops.range_field import (
    ip_range_field_filter,
    range_field_filter,
    range_field_term,
    relation_mask,
)


def _df():
    return pd.DataFrame({
        "id": [0, 1, 2, 3, 4, 5],
        "lo": [10, 50, None, 90, 200, None],
        "hi": [20, 70, 60, None, 210, None],
    })


def _ids(ds):
    return sorted(r["id"] for r in ds.take_all())


def _brute(df, frm, to, relation):
    out = []
    for _, r in df.iterrows():
        lo = -np.inf if pd.isna(r["lo"]) else r["lo"]
        hi = np.inf if pd.isna(r["hi"]) else r["hi"]
        if pd.isna(r["lo"]) and pd.isna(r["hi"]):
            continue
        if relation == "intersects":
            ok = (to is None or lo <= to) and (frm is None or hi >= frm)
        elif relation == "within":
            ok = (frm is None or lo >= frm) and (to is None or hi <= to)
        else:
            ok = (frm is None or lo <= frm) and (to is None or hi >= to)
        if ok:
            out.append(r["id"])
    return sorted(out)


def test_relations_match_brute_force():
    df = _df()
    ds = ray.data.from_pandas(df).repartition(2)
    for relation in ("intersects", "within", "contains"):
        for frm, to in [(15, 65), (None, 55), (55, None), (0, 1000),
                        (95, 100)]:
            got = _ids(range_field_filter(ds, "lo", "hi", frm, to,
                                          relation=relation))
            assert got == _brute(df, frm, to, relation), \
                (relation, frm, to)


def test_open_stored_sides_follow_mapper_defaults():
    ds = ray.data.from_pandas(_df())
    # doc 2 (gte open) is WITHIN any query with open from-side and to>=60
    assert 2 in _ids(range_field_filter(ds, "lo", "hi", None, 60,
                                        relation="within"))
    # doc 3 (lte open) CONTAINS any query bound above its gte
    assert 3 in _ids(range_field_filter(ds, "lo", "hi", 95, 10**9,
                                        relation="contains"))
    # both-null row 5 never matches even match-everything windows
    assert 5 not in _ids(range_field_filter(ds, "lo", "hi", None, None))


def test_exclusive_bounds_fold_with_next_up_down():
    ds = ray.data.from_pandas(_df())
    # (20, ...] excludes the doc whose hi == 20 from intersects
    incl = _ids(range_field_filter(ds, "lo", "hi", 20, 30))
    excl = _ids(range_field_filter(ds, "lo", "hi", 20, 30,
                                   include_lower=False))
    assert 0 in incl and 0 not in excl
    # float kind folds with IEEE nextafter, not +1
    fds = ray.data.from_pandas(pd.DataFrame(
        {"id": [0], "lo": [1.0], "hi": [2.0]}))
    assert _ids(range_field_filter(fds, "lo", "hi", 2.0, 3.0,
                                   include_lower=False, kind="float")) == []
    assert _ids(range_field_filter(
        fds, "lo", "hi", float(np.nextafter(2.0, 0.0)), 3.0,
        include_lower=False, kind="float")) == [0]


def test_term_query_is_point_intersects():
    ds = ray.data.from_pandas(_df())
    assert _ids(range_field_term(ds, "lo", "hi", 60)) == [1, 2]
    assert _ids(range_field_term(ds, "lo", "hi", 205)) == [3, 4]
    assert _ids(range_field_term(ds, "lo", "hi", 95)) == [3]


def test_date_range_kind():
    df = pd.DataFrame({
        "id": [0, 1, 2],
        "lo": pd.to_datetime(["2024-01-01", "2024-03-01", None]),
        "hi": pd.to_datetime(["2024-02-01", "2024-04-01", "2024-01-15"]),
    })
    ds = ray.data.from_pandas(df)
    got = _ids(range_field_filter(ds, "lo", "hi", "2024-01-10",
                                  "2024-01-20", kind="date"))
    assert got == [0, 2]
    got = _ids(range_field_filter(ds, "lo", "hi", "2023-12-01",
                                  "2024-05-01", relation="within",
                                  kind="date"))
    assert got == [0, 1]  # doc 2's open gte reaches below the window


def test_ip_range_field_relations():
    df = pd.DataFrame({
        "id": [0, 1, 2, 3],
        "lo": ["10.0.0.0", "10.1.0.0", None, "2001:db8::"],
        "hi": ["10.0.255.255", "10.1.0.10", "10.0.0.5", "2001:db8::ff"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    inter = _ids(ip_range_field_filter(ds, "lo", "hi",
                                       "10.0.0.3", "10.0.0.9"))
    assert inter == [0, 2]
    within = _ids(ip_range_field_filter(ds, "lo", "hi",
                                        "10.0.0.0", "10.2.0.0",
                                        relation="within"))
    assert within == [0, 1]  # doc 2's open gte (::) escapes the window
    contains = _ids(ip_range_field_filter(ds, "lo", "hi",
                                          "2001:db8::1", "2001:db8::2",
                                          relation="contains"))
    assert contains == [3]


def test_relation_mask_rejects_unknown():
    import pytest

    with pytest.raises(ValueError):
        relation_mask(np.zeros(1), np.zeros(1), np.ones(1, bool),
                      0, 1, "overlaps")
