"""Paragraph/line-level corpus dedup (CCNet / RefinedWeb duplicated-line
rule): two-phase sorted counting with block-boundary discipline, every
copy of a ≥min_count paragraph removed, order-preserving reassembly."""

import numpy as np
import pandas as pd
import ray

from elasticsearch_ray.ops.dedup import (
    duplicated_paragraph_hashes,
    paragraph_dedup,
)


def _corpus():
    boiler = "accept all cookies"
    docs = []
    for i in range(30):
        paras = [f"unique paragraph {i} alpha", f"unique paragraph {i} beta"]
        if i % 3 == 0:
            paras.insert(0, boiler)  # 10 copies of the banner
        if i % 15 == 0:
            paras.append("rare repeated line")  # exactly 2 copies
        docs.append("\n".join(paras))
    return pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                         "text": docs})


def test_duplicated_hashes_find_planted_boilerplate():
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(4)
    dup = duplicated_paragraph_hashes(ds, "text", "doc_id", min_count=2)
    assert len(dup) == 2  # banner + the rare repeated line
    dup3 = duplicated_paragraph_hashes(ds, "text", "doc_id", min_count=3)
    assert len(dup3) == 1  # only the banner reaches 3 copies


def test_paragraph_dedup_removes_all_copies_in_order():
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(4)
    out = (paragraph_dedup(ds, "text", "doc_id", min_count=2)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert len(out) == 30
    # banner docs lose 1 (or 2 with the rare line) paragraphs
    r0 = out[out.doc_id == 0].iloc[0]
    assert r0["n_removed"] == 2 and r0["n_kept"] == 2
    assert r0["text"] == "unique paragraph 0 alpha\nunique paragraph 0 beta"
    r3 = out[out.doc_id == 3].iloc[0]
    assert r3["n_removed"] == 1
    assert not r3["text"].startswith("accept")
    # untouched docs keep their text verbatim
    r1 = out[out.doc_id == 1].iloc[0]
    assert r1["text"] == df.loc[1, "text"] and r1["n_removed"] == 0


def test_paragraph_dedup_fully_boilerplate_doc_empties():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["same line", "same line", "same line\nkept one", ""],
    })
    out = (paragraph_dedup(ray.data.from_pandas(df).repartition(2),
                           "text", "doc_id")
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out.loc[0, "text"] == "" and out.loc[0, "n_kept"] == 0
    assert out.loc[2, "text"] == "kept one"
    assert out.loc[3, "n_kept"] == 0 and out.loc[3, "n_removed"] == 0


def test_boundary_straddling_runs_counted_once():
    """Many copies of one paragraph forced across several sort blocks:
    the per-block edge discipline must still count the run exactly."""
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["straddle me"] * (n // 2)
                + [f"solo {i}" for i in range(n // 2)],
    })
    ds = ray.data.from_pandas(df).repartition(8)
    dup = duplicated_paragraph_hashes(ds, "text", "doc_id",
                                      min_count=n // 2)
    assert len(dup) == 1
    assert len(duplicated_paragraph_hashes(ds, "text", "doc_id",
                                           min_count=n // 2 + 1)) == 0


def test_clean_corpus_without_duplicates_passes_through():
    """Review r5 #1: a corpus with NO duplicated paragraph (the normal
    clean-input case) must pass through unchanged, not crash on the
    empty duplicated-hash set."""
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["alpha one\nbeta two", "gamma three", "delta four"],
    })
    out = (paragraph_dedup(ray.data.from_pandas(df).repartition(2),
                           "text", "doc_id")
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["n_removed"].tolist() == [0, 0, 0]
    assert out["text"].tolist() == df["text"].tolist()
