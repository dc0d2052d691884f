"""jusText-style boilerplate removal (ops/boilerplate.py) + BM25
hard-negative mining (ops/llm_prep.mine_hard_negatives)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.ops.boilerplate import (
    extract_content,
    paragraph_labels,
    remove_boilerplate,
)

GOOD = ("the cat sat on the mat and the dog ran to the house with a ball "
        "and then the cat and the dog sat by the door and all of them "
        "were very happy to be in the house for the rest of the day and "
        "the night was long")
SHORT_NEAR = "the end of the story was good for all of them"


def _page(extra=""):
    return (
        '<html><head><title>t</title></head><body>'
        '<nav><a href="/">home</a> <a href="/about">about</a> '
        '<a href="/contact">contact us now</a></nav>'
        '<script>var x = 1;</script>'
        f'<p>{GOOD}</p>'
        f'<p>{SHORT_NEAR}</p>'
        f'{extra}'
        '<div><a href="/l1">link one</a> <a href="/l2">link two</a> '
        'mostly links here</div>'
        '<footer>copyright 2024 example corp all rights reserved</footer>'
        '</body></html>')


def test_extracts_good_and_context_promotes_neighbor():
    out = extract_content(_page())
    assert GOOD in out
    # short stopword-dense paragraph adjacent to a good one is promoted
    assert SHORT_NEAR in out
    assert "home" not in out            # nav boilerplate
    assert "copyright" not in out       # footer boilerplate
    assert "link one" not in out        # link-dense block
    assert "var x" not in out           # script content


def test_labels():
    labs = dict(paragraph_labels(_page()))
    assert labs[GOOD] == "good"
    assert labs[SHORT_NEAR] == "good"   # promoted by context
    nav = [v for k, v in paragraph_labels(_page()) if "home" in k]
    assert nav == ["bad"]


def test_isolated_short_paragraph_is_bad():
    html = f"<html><body><p>{SHORT_NEAR}</p></body></html>"
    assert extract_content(html) == ""


def test_low_stopword_long_paragraph_is_bad():
    words = "spark join merge sort scan filter shuffle reduce " * 8
    html = f"<html><body><p>{words.strip()}</p></body></html>"
    assert extract_content(html) == ""


def test_dataset_stage(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [0, 1],
                       "html": [_page(), _page("<p>" + GOOD + "</p>")]})
    out = remove_boilerplate(rd.from_pandas(df)).to_pandas()
    assert all(GOOD in c for c in out["content"])


def test_mine_hard_negatives(ray_session, tmp_path_factory):
    import os

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.ops.llm_prep import mine_hard_negatives
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import MatchQuery

    root = tmp_path_factory.mktemp("hn")
    corpus = str(root / "c")
    os.makedirs(corpus)
    rng = np.random.RandomState(3)
    words = ["spark", "join", "merge", "sort", "scan"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(50, dtype=np.int64)),
        "text": pa.array([" ".join(rng.choice(words, 10))
                          for _ in range(50)]),
    }), f"{corpus}/d.parquet")
    idx = str(root / "i")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text"),
                concurrency=2, file_pattern="d.parquet")
    eng = QueryEngine(idx, dtype="float64")

    top = eng.search(MatchQuery("spark join"), k=10,
                     fetch=("doc_id",)).to_pandas()
    pos = int(top.doc_id.iloc[0])
    out = mine_hard_negatives(eng, [("q1", "spark join", pos)], k=5)
    assert len(out) == 5
    assert pos not in set(out.doc_id)
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]
    # scores non-increasing, doc_id tiebreak ascending within equal scores
    s = out["score"].to_numpy()
    assert (np.diff(s) <= 0).all()
    for i in range(4):
        if s[i] == s[i + 1]:
            assert out.doc_id.iloc[i] < out.doc_id.iloc[i + 1]
