"""Stored scripts (_scripts/{id}: PutStoredScript compiles before
storing, Get/Delete, {"script": {"id"}} resolution in DSL bodies)."""

import numpy as np
import pytest

from elasticsearch_ray.search.scripts import (
    ScriptRegistry,
    bind_stored_scripts,
)


def test_put_compiles_get_delete():
    reg = ScriptRegistry()
    reg.put("boost", "_score * 2 + n_chars / 100")
    assert reg.get("boost")["lang"] == "expression"
    # PUT rejects a broken script at STORE time (ScriptService compile)
    with pytest.raises(ValueError, match="failed to compile"):
        reg.put("bad", "1 + ")
    with pytest.raises(ValueError, match="unsupported script lang"):
        reg.put("x", "y", lang="painless")
    reg.delete("boost")
    with pytest.raises(KeyError, match="does not exist"):
        reg.get("boost")
    with pytest.raises(KeyError, match="does not exist"):
        reg.delete("boost")


def test_bind_and_run_equals_inline(ray_session):
    """A script_score referencing a stored id scores identically to the
    same script inline."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.dsl import parse_dsl
    from elasticsearch_ray.search.engine import QueryEngine

    import tempfile

    root = tempfile.mkdtemp(prefix="storedscripts")
    corpus = os.path.join(root, "corpus")
    os.makedirs(corpus, exist_ok=True)
    rng = np.random.RandomState(4)
    words = ["spark", "join", "merge", "scan"]
    n = 30
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([" ".join(rng.choice(words, 8))
                          for _ in range(n)]),
        "lang": pa.array(["en"] * n),
        "n_chars": pa.array(rng.randint(50, 500, n).astype(np.int64)),
    })
    pq.write_table(t, f"{corpus}/docs.parquet")
    idx = os.path.join(root, "index")
    build_index(corpus, idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang", "n_chars")),
                concurrency=2, file_pattern="docs.parquet")
    eng = QueryEngine(idx, dtype="float64")

    reg = ScriptRegistry()
    reg.put("chars-boost", "_score + n_chars / 100")
    body = {"script_score": {
        "query": {"match": {"text": "spark"}},
        "script": {"id": "chars-boost"},
    }}
    bound = bind_stored_scripts(body, reg)
    assert bound["script_score"]["script"] == {
        "source": "_score + n_chars / 100"}
    got = eng.search(parse_dsl(bound), k=10, fetch=("doc_id",)).to_pandas()
    inline = {"script_score": {
        "query": {"match": {"text": "spark"}},
        "script": {"source": "_score + n_chars / 100"},
    }}
    want = eng.search(parse_dsl(inline), k=10,
                      fetch=("doc_id",)).to_pandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"], want["score"])
    # unknown id fails resolution with the reference's message
    with pytest.raises(KeyError, match="does not exist"):
        bind_stored_scripts(
            {"script_score": {"script": {"id": "nope"}}}, reg)


def test_mustache_stored_script_renders_params():
    reg = ScriptRegistry()
    reg.put("tmpl", '{"match": {"text": "{{q}}"}}', lang="mustache")
    out = reg.resolve({"id": "tmpl", "params": {"q": "spark"}})
    assert out == {"source": {"match": {"text": "spark"}}}
