"""Cross-corpus (incremental) near-dedup: new crawl vs existing
training set — planted near-dups found, fresh docs kept, disjoint-id
guard."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.dedup import (
    cross_corpus_dedup,
    cross_corpus_near_dups,
)


def _mk(rng, n, vocab, start_id):
    rows = []
    for i in range(n):
        rows.append({"doc_id": start_id + i,
                     "text": " ".join(rng.choice(vocab, 60))})
    return pd.DataFrame(rows)


def test_cross_corpus_finds_planted_dups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(12)
    vocab = [f"w{i}" for i in range(300)]
    ref = _mk(rng, 40, vocab, 0)
    new = _mk(rng, 30, vocab, 1000)
    # plant: new 1005/1011 are light edits of ref 3/17
    for new_id, ref_id in ((1005, 3), (1011, 17)):
        base = ref.loc[ref.doc_id == ref_id, "text"].iloc[0].split()
        base[5] = "edited"
        new.loc[new.doc_id == new_id, "text"] = " ".join(base)
    got = cross_corpus_near_dups(rd.from_pandas(new), rd.from_pandas(ref),
                                 threshold=0.7)
    pairs = set(zip(got["new_id"], got["ref_id"]))
    assert (1005, 3) in pairs and (1011, 17) in pairs
    assert (got["jaccard"] >= 0.7).all()
    # only planted dups match (random 60-grams don't collide)
    assert set(got["new_id"]) == {1005, 1011}
    kept = cross_corpus_dedup(rd.from_pandas(new), rd.from_pandas(ref),
                              threshold=0.7).to_pandas()
    assert set(kept["doc_id"]) == set(new["doc_id"]) - {1005, 1011}


def test_cross_corpus_requires_disjoint_ids(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(20)]
    # same ids AND identical text -> they land in one bucket together
    df = _mk(rng, 5, vocab, 0)
    with pytest.raises(Exception, match="disjoint"):
        cross_corpus_near_dups(rd.from_pandas(df), rd.from_pandas(df))


def test_cross_corpus_no_matches_empty_frame(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    ref = _mk(rng, 10, [f"a{i}" for i in range(100)], 0)
    new = _mk(rng, 10, [f"b{i}" for i in range(100)], 500)
    got = cross_corpus_near_dups(rd.from_pandas(new), rd.from_pandas(ref))
    assert len(got) == 0
    kept = cross_corpus_dedup(rd.from_pandas(new), rd.from_pandas(ref))
    assert len(kept.to_pandas()) == 10
