"""terms agg min_doc_count + missing (TermsAggregationBuilder options)."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.aggs import terms_agg


def test_terms_missing_and_min_doc_count(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b", None, None, "c"],
                       "v": np.arange(8, dtype=float)})
    out = terms_agg(rd.from_pandas(df), "k", missing="(missing)")
    got = dict(zip(out["k"], out["doc_count"]))
    assert got == {"a": 3, "b": 2, "(missing)": 2, "c": 1}
    out2 = terms_agg(rd.from_pandas(df), "k", missing="(missing)",
                     min_doc_count=2)
    assert set(out2["k"]) == {"a", "b", "(missing)"}
    # ordering preserved: count desc, key asc
    assert out2["k"].tolist() == ["a", "(missing)", "b"]
    with pytest.raises(ValueError):
        terms_agg(rd.from_pandas(df), "k", min_doc_count=0)


def test_review_r5d_terms_missing_all_null_block(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": pd.Series([None, None], dtype=object)})
    out = terms_agg(rd.from_pandas(df), "k", missing="(missing)")
    assert out["k"].tolist() == ["(missing)"]
    assert int(out["doc_count"].iloc[0]) == 2
