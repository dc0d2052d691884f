"""Substring-span dedup (Lee et al. 2021 analog): window fingerprints,
span assembly, keep-first policy, removal rewrite."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.substring_dedup import (duplicated_spans,
                                                   remove_duplicated_spans,
                                                   window_fingerprints)


def _words(seed, n):
    rng = np.random.default_rng(seed)
    return [f"w{int(x)}" for x in rng.integers(0, 50_000, n)]


SHARED = _words(99, 60)  # the planted duplicated run (60 tokens)
DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "text": [
        " ".join(_words(0, 100) + SHARED + _words(1, 80)),   # dup at 100
        " ".join(SHARED + _words(2, 120)),                   # dup at 0
        " ".join(_words(3, 150)),                            # clean
        " ".join(_words(4, 30)),                             # too short
    ],
})


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(DOCS).repartition(2)


def test_fingerprints_shift_and_content_sensitive():
    toks = ["a", "b", "c", "d", "e"]
    f = window_fingerprints(toks, 3)
    assert len(f) == 3
    assert len(set(f.tolist())) == 3
    # identical windows fingerprint identically across lists
    g = window_fingerprints(["x", "a", "b", "c"], 3)
    assert g[1] == f[0]
    assert len(window_fingerprints(["a"], 3)) == 0


def test_duplicated_spans_localized(doc_ds):
    spans = duplicated_spans(doc_ds, window=50, min_count=2)
    got = {(r.doc_id, r.start_tok, r.end_tok)
           for r in spans.itertuples(index=False)}
    # 60 shared tokens -> 11 overlapping 50-windows merging into one
    # maximal span of exactly the shared run
    assert got == {(0, 100, 160), (1, 0, 60)}
    assert (spans["n_windows"] == 11).all()


def test_keep_first_exempts_earliest(doc_ds):
    spans = duplicated_spans(doc_ds, window=50, min_count=2,
                             keep_first=True)
    # doc 0 at pos 100 vs doc 1 at pos 0: (doc_id, pos) order keeps
    # doc 0's copy, flags doc 1's
    assert spans["doc_id"].tolist() == [1]
    assert spans.iloc[0]["start_tok"] == 0
    assert spans.iloc[0]["end_tok"] == 60


def test_remove_rewrite_keeps_one_copy(doc_ds):
    out = remove_duplicated_spans(doc_ds, window=50, min_count=2) \
        .to_pandas().set_index("doc_id")
    shared = " ".join(SHARED)
    assert shared in out.loc[0, "text"]      # kept copy intact
    assert shared not in out.loc[1, "text"]  # later copy stripped
    assert len(out.loc[1, "text"].split()) == 120
    assert out.loc[2, "text"] == DOCS.set_index("doc_id").loc[2, "text"]


def test_no_duplicates_no_spans(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": [" ".join(_words(7, 80)),
                                   " ".join(_words(8, 80))]}))
    assert duplicated_spans(ds, window=50).empty