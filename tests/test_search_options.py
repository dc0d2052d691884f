"""SURVEY §2.8 options: field sort, search_after, collapse, rescore,
min_score, source fetch, highlight."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchPhraseQuery, MatchQuery, TermQuery

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def web_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf(SF_DIR, multiplier=1, num_files=3)
    idx = str(tmp_path_factory.mktemp("webidx") / "index")
    build_index(corpus, idx, IndexSpec(files_per_partition=1), concurrency=2)
    return QueryEngine(idx, dtype="float64")


def test_sort_by_field(web_engine):
    t = web_engine.search(MatchQuery("spark"), k=15, sort=[("warc_ts", "desc")],
                          fetch=("url", "warc_ts"))
    ts = t["warc_ts"].to_pylist()
    assert len(ts) == 15
    assert ts == sorted(ts, reverse=True)
    t2 = web_engine.search(MatchQuery("spark"), k=15, sort=[("warc_ts", "asc")],
                           fetch=("warc_ts",))
    assert t2["warc_ts"].to_pylist() == sorted(t2["warc_ts"].to_pylist())


def test_search_after_pagination(web_engine):
    q = MatchQuery("spark")
    full = web_engine.search(q, k=20, sort=[("warc_ts", "desc")], fetch=("url", "warc_ts"))
    page1 = web_engine.search(q, k=10, sort=[("warc_ts", "desc")], fetch=("url", "warc_ts"))
    last = page1.to_pylist()[-1]
    # cursor with the implicit (part, doc) tiebreak (the reference's
    # _shard_doc): exact pagination even if warc_ts ties at the boundary
    cursor = (last["warc_ts"], last["part"], last["local"])
    page2 = web_engine.search(q, k=10, sort=[("warc_ts", "desc")], search_after=cursor,
                              fetch=("url", "warc_ts"))
    assert full["url"].to_pylist() == page1["url"].to_pylist() + page2["url"].to_pylist()


def test_search_after_score_mode(web_engine):
    q = MatchQuery("spark join")
    full = web_engine.search(q, k=20, fetch=("url",))
    page1 = web_engine.search(q, k=10, fetch=("url",))
    r = page1.to_pylist()[-1]
    page2 = web_engine.search(q, k=10, fetch=("url",),
                              search_after=(r["score"], r["part"], r["local"]))
    assert full["url"].to_pylist() == page1["url"].to_pylist() + page2["url"].to_pylist()


def test_collapse_one_per_lang(web_engine):
    t = web_engine.search(MatchQuery("spark"), k=10, collapse="lang", fetch=("url", "lang"))
    langs = t["lang"].to_pylist()
    assert len(langs) == len(set(langs))
    # collapsed winner per lang = that lang's best-scoring hit
    allhits = web_engine.search(MatchQuery("spark"), k=1000, fetch=("url", "lang"))
    best = {}
    for r in allhits.to_pylist():
        best.setdefault(r["lang"], r["url"])
    assert {r["lang"]: r["url"] for r in t.to_pylist()} == {
        lg: best[lg] for lg in langs
    }


def test_rescore_window(web_engine):
    base = web_engine.search(MatchQuery("spark"), k=10, fetch=("url",))
    res = web_engine.search(MatchQuery("spark"), k=10, fetch=("url",),
                            rescore=(TermQuery("join"), 10, 1.0, 2.0))
    assert len(res) == 10
    # rescored docs that also contain 'join' must not score lower than base
    joiners = {r["url"] for r in web_engine.search(TermQuery("join"), k=1000, fetch=("url",)).to_pylist()}
    base_scores = {r["url"]: r["score"] for r in base.to_pylist()}
    for r in res.to_pylist():
        if r["url"] in base_scores:
            if r["url"] in joiners:
                assert r["score"] > base_scores[r["url"]]
            else:
                assert abs(r["score"] - base_scores[r["url"]]) < 1e-9


def test_min_score(web_engine):
    allhits = web_engine.search(MatchQuery("spark join"), k=1000, fetch=())
    cut = float(np.median([r["score"] for r in allhits.to_pylist()]))
    t = web_engine.search(MatchQuery("spark join"), k=1000, min_score=cut, fetch=())
    assert 0 < len(t) < len(allhits)
    assert all(r["score"] >= cut for r in t.to_pylist())


def test_fetch_source_and_highlight(web_engine):
    t = web_engine.search(MatchQuery("spark"), k=1, fetch=("url",))
    r = t.to_pylist()[0]
    src = web_engine.fetch_source(r["part"], [r["local"]], columns=["url", "text"])
    assert src["url"][0].as_py() == r["url"]
    hl = web_engine.highlight(MatchQuery("spark"), r["part"], r["local"])
    assert "<em>spark</em>" in hl
    assert hl.replace("<em>", "").replace("</em>", "") == src["text"][0].as_py()


def test_scan_iterates_all_hits(web_engine):
    total = web_engine.search(MatchQuery("spark"), k=10**9, mode="exhaustive", fetch=())
    seen = 0
    import pyarrow as pa

    for tbl in web_engine.scan(MatchQuery("spark"), batch_size=37, fetch=("url",)):
        assert isinstance(tbl, pa.Table) and tbl.num_rows <= 37
        seen += tbl.num_rows
    assert seen == total.num_rows


def test_phrase_slop(web_engine):
    from elasticsearch_ray.search.query import MatchPhraseQuery

    # pick two terms that co-occur within small windows from a known doc
    src = web_engine.fetch_source(0, [0], columns=["text"])
    toks = [t.lower() for t in src["text"][0].as_py().split()]
    a, b = toks[2], toks[5]  # 3 apart as a phrase "a b" needs slop >= 2
    exact = web_engine.search(MatchPhraseQuery(f"{a} {b}"), k=10**9,
                              mode="exhaustive", fetch=())
    sloppy = web_engine.search(MatchPhraseQuery(f"{a} {b}", slop=4), k=10**9,
                               mode="exhaustive", fetch=())
    # slop widens (or keeps) the result set, and slop result includes doc 0
    assert set((r["part"], r["local"]) for r in exact.to_pylist()) <= set(
        (r["part"], r["local"]) for r in sloppy.to_pylist()
    )
    assert (0, 0) in {(r["part"], r["local"]) for r in sloppy.to_pylist()}


def test_match_phrase_prefix(web_engine):
    from elasticsearch_ray.search.query import MatchPhrasePrefixQuery, MatchPhraseQuery

    # "batch ba" prefix-expands 'ba' → {batch, ...}; must cover "batch batch"
    exact = web_engine.search(MatchPhraseQuery("batch batch"), k=10**9,
                              mode="exhaustive", fetch=())
    pre = web_engine.search(MatchPhrasePrefixQuery("batch ba"), k=10**9,
                            mode="exhaustive", fetch=())
    exact_set = {(r["part"], r["local"]) for r in exact.to_pylist()}
    pre_set = {(r["part"], r["local"]) for r in pre.to_pylist()}
    assert exact_set <= pre_set and exact_set


def test_search_after_score_deep_pagination(web_engine):
    """ADVICE: score-mode search_after must reach hits beyond each
    partition's local top-k — chain small pages and compare to one big page."""
    from elasticsearch_ray.search.query import MatchQuery as MQ

    q = MQ("spark join")
    full = web_engine.search(q, k=60, fetch=("url",))
    urls, cursor = [], None
    for _ in range(12):
        t = web_engine.search(q, k=5, fetch=("url",), search_after=cursor)
        if len(t) == 0:
            break
        urls.extend(t["url"].to_pylist())
        r = t.to_pylist()[-1]
        cursor = (r["score"], r["part"], r["local"])
    assert len(urls) >= 20
    assert urls == full["url"].to_pylist()[: len(urls)]


def test_extended_ray_backend_matches_local(web_engine, ray_session):
    """sort/collapse/rescore served by the warm-actor backend must equal the
    local backend row-for-row."""
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import MatchQuery as MQ, TermQuery as TQ

    ray_eng = QueryEngine(web_engine.index_dir, dtype="float64", parallel="ray",
                          num_actors=2)
    try:
        cases = [
            dict(q=MQ("spark"), k=12, sort=[("warc_ts", "desc")], fetch=("url", "warc_ts")),
            dict(q=MQ("spark"), k=10, collapse="lang", fetch=("url", "lang")),
            dict(q=MQ("spark"), k=10, rescore=(TQ("join"), 10, 1.0, 2.0), fetch=("url",)),
            dict(q=MQ("spark join"), k=8, sort=[("warc_ts", "asc")], min_score=0.1,
                 fetch=("url",)),
        ]
        for kw in cases:
            a = web_engine.search(**kw).to_pylist()
            b = ray_eng.search(**kw).to_pylist()
            assert a == b, kw
        # search_after paging on field sort through the ray backend
        p1 = ray_eng.search(MQ("spark"), k=10, sort=[("warc_ts", "desc")],
                            fetch=("url", "warc_ts"))
        cur = (p1["warc_ts"][-1].as_py(),)
        p2 = ray_eng.search(MQ("spark"), k=10, sort=[("warc_ts", "desc")],
                            search_after=cur, fetch=("url", "warc_ts"))
        full = web_engine.search(MQ("spark"), k=20, sort=[("warc_ts", "desc")],
                                 fetch=("url", "warc_ts"))
        assert full["url"].to_pylist() == p1["url"].to_pylist() + p2["url"].to_pylist()
    finally:
        ray_eng.close()


def test_completion_suggester(web_engine):
    """Prefix completion ranked by (df desc, term asc)."""
    out = web_engine.complete("sp", size=5)
    assert out and all(o["text"].startswith("sp") for o in out)
    freqs = [o["freq"] for o in out]
    assert freqs == sorted(freqs, reverse=True)
    assert any(o["text"] == "spark" for o in out)


def test_fuzzy_completion_suggester(web_engine):
    """FuzzyCompletionSuggestion: typo'd prefixes still complete; exact
    prefix matches rank before fuzzy ones regardless of frequency."""
    # 'sparl' (typo for 'spark') is no term's exact prefix
    assert not web_engine.complete("sparl", size=5)
    out = web_engine.complete_fuzzy("sparl", size=5, fuzziness=1)
    assert any(o["text"] == "spark" for o in out)
    assert all(o["edits"] <= 1 for o in out)
    # exact-first: edits ascending, then freq descending
    keys = [(o["edits"], -o["freq"], o["text"]) for o in out]
    assert keys == sorted(keys)
    # exact prefix with fuzz: edits-0 completions come first and match
    # the exact completion suggester's ranking
    fz = web_engine.complete_fuzzy("spa", size=5, fuzziness=1)
    exact = web_engine.complete("spa", size=5)
    n0 = sum(1 for o in fz if o["edits"] == 0)
    assert [o["text"] for o in fz[:n0]] == [o["text"] for o in exact][:n0]
    # below min_length no fuzz applies (reference default min_length=3)
    short = web_engine.complete_fuzzy("sp", size=5, fuzziness=1)
    assert all(o["edits"] == 0 and o["text"].startswith("sp") for o in short)
    # transposition counts as ONE edit (Damerau)
    tr = web_engine.complete_fuzzy("sprak", size=5, fuzziness=1)
    assert any(o["text"] == "spark" for o in tr)
    # ...but not within the non-fuzzy prefix (prefix_length=1 default):
    # a first-char transposition only matches with prefix_length=0
    assert not any(o["text"] == "spark"
                   for o in web_engine.complete_fuzzy("psark", size=5))
    tr0 = web_engine.complete_fuzzy("psark", size=5, fuzziness=1,
                                    prefix_length=0)
    assert any(o["text"] == "spark" for o in tr0)


def test_phrase_suggester_corrects_typos(web_engine):
    out = web_engine.suggest_phrase("spark joim", size=3)
    assert out
    texts = [o["text"] for o in out]
    assert "spark join" in texts
    scores = [o["score"] for o in out]
    assert scores == sorted(scores, reverse=True)


def test_fuzzy_completion_ray_actor_path(web_engine):
    """complete_fuzzy through the warm-actor backend must equal the local
    backend (the actor passthrough is a separate code path)."""
    from elasticsearch_ray.search.engine import QueryEngine

    ray_eng = QueryEngine(web_engine.index_dir, dtype="float64",
                          parallel="ray", num_actors=2)
    try:
        for prefix in ("sparl", "spa", "sprak"):
            assert (ray_eng.complete_fuzzy(prefix, size=5)
                    == web_engine.complete_fuzzy(prefix, size=5)), prefix
    finally:
        ray_eng.close()


def test_phrase_suggester_smoothing_family(web_engine):
    """The reference's full WordScorer family: stupid_backoff (its
    default) and linear_interpolation rank the planted correction top,
    like laplace; scores stay sorted; unknown names reject."""
    import pytest as _pytest

    for smoothing in ("stupid_backoff", "linear_interpolation"):
        out = web_engine.suggest_phrase("spark joim", size=3,
                                        smoothing=smoothing)
        assert out, smoothing
        assert "spark join" in [o["text"] for o in out], smoothing
        scores = [o["score"] for o in out]
        assert scores == sorted(scores, reverse=True)
    # seen-bigram stupid_backoff scores pure MLE: a common phrase scores
    # strictly higher than under add-alpha laplace (no smoothing mass)
    sb = web_engine.suggest_phrase("spark join", size=1,
                                   smoothing="stupid_backoff")[0]
    lp = web_engine.suggest_phrase("spark join", size=1)[0]
    assert sb["text"] == lp["text"]
    assert sb["score"] > lp["score"]
    with _pytest.raises(ValueError, match="unknown smoothing"):
        web_engine.suggest_phrase("spark", smoothing="kneser_ney")


def test_highlight_hits_batched(web_engine):
    from elasticsearch_ray.search.query import MatchQuery as MQ

    hits = web_engine.search(MQ("spark join"), k=8)
    hl = web_engine.highlight_hits(MQ("spark join"), hits)
    assert len(hl) == len(hits)
    assert any("<em>spark</em>" in h or "<em>join</em>" in h for h in hl)
    # per-hit highlight agrees with the batched path
    r = hits.to_pylist()[0]
    single = web_engine.highlight(MQ("spark join"), r["part"], r["local"])
    assert single == hl[0]


def test_highlight_scan_distributed(web_engine):
    """highlight_scan covers ALL hits and agrees per-doc with the
    driver-side highlight path (same wrap semantics, same hit set)."""
    import pandas as pd

    from elasticsearch_ray.search.query import MatchQuery as MQ

    q = MQ("spark join")
    ds = web_engine.highlight_scan(q, fetch=("doc_id",))
    df = pd.DataFrame(ds.take_all()).sort_values(["part", "local"]).reset_index(drop=True)
    # hit set == exhaustive scan hit set
    import pyarrow as pa

    scan_tbls = list(web_engine.scan(q, fetch=("doc_id",)))
    scan = pa.concat_tables(scan_tbls).to_pandas().sort_values(
        ["part", "local"]).reset_index(drop=True)
    assert df["doc_id"].tolist() == scan["doc_id"].tolist()
    np.testing.assert_allclose(df["score"].to_numpy(), scan["score"].to_numpy(), rtol=1e-12)
    # wrap agrees with the single-doc highlighter on a few rows
    for _, r in df.head(3).iterrows():
        assert r["hl"] == web_engine.highlight(q, int(r["part"]), int(r["local"]))
    assert (df["hl"].str.contains("<em>")).all() or len(df) == 0


def test_post_filter_scores_unchanged(web_engine):
    """post_filter removes hits but never changes scores (scores computed
    against the UNfiltered corpus)."""
    from elasticsearch_ray.search.query import TermFilter

    q = MatchQuery("spark")
    plain = web_engine.search(q, k=50, fetch=("doc_id", "lang"))
    filt = web_engine.search(q, k=50, fetch=("doc_id", "lang"),
                             post_filter=TermFilter(column="lang", value="en"))
    assert set(filt["lang"].to_pylist()) == {"en"}
    by_doc = dict(zip(plain["doc_id"].to_pylist(), plain["score"].to_pylist()))
    for r in filt.to_pylist():
        if r["doc_id"] in by_doc:
            assert r["score"] == by_doc[r["doc_id"]]
    # filtered hits are exactly the en-subset of the full ranking
    want = [r["doc_id"] for r in plain.to_pylist() if r["lang"] == "en"]
    got = filt["doc_id"].to_pylist()
    assert got[: len(want)] == want[: len(got)]


def test_terminate_after_per_shard_cut(web_engine):
    q = MatchQuery("spark")
    full = web_engine.search(q, k=10**9, fetch=("doc_id",), terminate_after=None)
    cut = web_engine.search(q, k=10**9, fetch=("doc_id",), terminate_after=3)
    # ≤ 3 hits per partition, and each partition's hits are its first 3 in doc order
    import collections

    per_part = collections.defaultdict(list)
    for r in cut.to_pylist():
        per_part[r["part"]].append(r["local"])
    full_per_part = collections.defaultdict(list)
    for r in full.to_pylist():
        full_per_part[r["part"]].append(r["local"])
    for p, locs in per_part.items():
        assert len(locs) <= 3
        assert sorted(locs) == sorted(full_per_part[p])[:len(locs)]


def test_scan_dataset_matches_scan(web_engine):
    """Distributed sliced-scroll == driver-side scan (same hits, fields,
    source columns)."""
    import pandas as pd
    import pyarrow as pa

    q = MatchQuery("spark join")
    ds = web_engine.scan_dataset(q, fetch=("doc_id",), source_columns=("url",))
    got = pd.DataFrame(ds.take_all()).sort_values(["part", "local"]).reset_index(drop=True)
    ser = pa.concat_tables(list(web_engine.scan(q, fetch=("doc_id", "url")))).to_pandas()
    ser = ser.sort_values(["part", "local"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == ser["doc_id"].tolist()
    assert got["url"].tolist() == ser["url"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(), ser["score"].to_numpy(), rtol=1e-12)


def test_post_filter_accepts_scoring_queries(web_engine):
    """post_filter may be ANY query (ES postFilter surface): analyzed match
    and phrase filters need their own scorers, not the main query's."""
    q = MatchQuery("spark")
    filt = web_engine.search(q, k=50, fetch=("doc_id",),
                             post_filter=MatchQuery("join"))
    plain = web_engine.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
    plain_scores = {r["doc_id"]: r["score"] for r in plain.to_pylist()}
    join_docs = {r["doc_id"] for r in web_engine.search(
        MatchQuery("join"), k=10**9, mode="exhaustive", fetch=("doc_id",)).to_pylist()}
    assert len(filt) > 0
    for r in filt.to_pylist():
        assert r["doc_id"] in join_docs
        # subset of the main query's hits, scores untouched by the filter
        assert r["score"] == plain_scores[r["doc_id"]]
    # phrase post_filter: containment in the phrase hit set
    ph = web_engine.search(q, k=10, fetch=("doc_id",),
                           post_filter=MatchPhraseQuery("spark join"))
    phrase_docs = {r["doc_id"] for r in web_engine.search(
        MatchPhraseQuery("spark join"), k=10**9, mode="exhaustive",
        fetch=("doc_id",)).to_pylist()}
    assert all(r["doc_id"] in phrase_docs for r in ph.to_pylist())


def test_post_filter_min_score_combo_and_rejections(web_engine):
    import pytest as _pt

    q = MatchQuery("spark")
    hi = web_engine.search(q, k=10, fetch=("doc_id",), terminate_after=10**9,
                           min_score=1e9)
    assert len(hi) == 0  # min_score honored alongside terminate_after
    with _pt.raises(ValueError):
        web_engine.search(q, k=10, post_filter=MatchQuery("join"),
                          sort=[("warc_ts", "desc")])


def test_script_fields_empty_hits(web_engine):
    import pyarrow as pa

    empty = web_engine.search(MatchQuery("zzzneverthere"), k=5, fetch=("doc_id",))
    out = web_engine.script_fields(
        empty, {"n": lambda src: pa.array([len(t or "") for t in
                                           src["html"].to_pylist()], pa.int64())},
        source_columns=("html",))
    assert len(out) == 0 and "n" in out.column_names


def test_rescore_rejects_explicit_sort(web_engine):
    # QueryRescorer: 'Cannot use [sort] option in conjunction with [rescore]'
    with pytest.raises(ValueError, match=r"\[sort\].*\[rescore\]"):
        web_engine.search(MatchQuery("spark"), k=5, sort=[("warc_ts", "asc")],
                          rescore=(TermQuery("join"), 10, 1.0, 2.0))
    # default _score sort still works with rescore
    out = web_engine.search(MatchQuery("spark"), k=5,
                            rescore=(TermQuery("join"), 10, 1.0, 2.0))
    assert len(out) > 0


def test_phrase_suggester_bigram_context(ray_session, tmp_path_factory):
    """LaplaceScorer bigram model: context picks the correction. 'bean' has
    the higher unigram frequency, but 'drum beat' is the only bigram that
    occurs, so 'drum beaf' must correct to 'drum beat' — a unigram LM would
    rank 'drum bean' first."""
    import os

    import pyarrow as pa

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    texts = ["drum beat solo"] * 3 + ["green bean soup"] * 10
    corpus = str(tmp_path_factory.mktemp("bigram_corpus"))
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts), "lang": pa.array(["en"] * len(texts))}),
        os.path.join(corpus, "d.parquet"))
    idx = str(tmp_path_factory.mktemp("bigram_idx") / "index")
    build_index(corpus, idx,
                IndexSpec(use_html=False, text_column="text", doc_columns=("lang",)),
                concurrency=2, file_pattern="d.parquet")
    eng = QueryEngine(idx, dtype="float64")
    # sanity: the wrong candidate really does dominate on unigram counts
    ttf = eng._global_ttf(["bean", "beat"])
    assert ttf["bean"] > ttf["beat"]
    out = eng.suggest_phrase("drum beaf", size=3, max_edits=1)
    assert out and out[0]["text"] == "drum beat"
    texts_out = [o["text"] for o in out]
    assert texts_out.index("drum beat") < texts_out.index("drum bean")


def test_replica_pools_identical_results(web_engine, tmp_path_factory):
    """num_replicas>1 (replica-shard pools): every replica answers with the
    same results as the local backend; round-robin covers multiple pools."""
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import MatchQuery as MQ

    eng = QueryEngine(web_engine.index_dir, dtype="float64", parallel="ray",
                      num_replicas=2, num_actors=4)
    try:
        want = web_engine.search(MQ("spark join"), k=10).to_pylist()
        for _ in range(4):  # round-robin hits both pools
            got = eng.search(MQ("spark join"), k=10).to_pylist()
            assert got == want
        assert len(eng._actor_pools) == 2
        s1 = eng.search(MQ("spark"), k=8, sort=[("warc_ts", "desc")],
                        fetch=("warc_ts",))
        s2 = web_engine.search(MQ("spark"), k=8, sort=[("warc_ts", "desc")],
                               fetch=("warc_ts",))
        assert s1["warc_ts"].to_pylist() == s2["warc_ts"].to_pylist()
    finally:
        eng.close()


def test_knn_filter_dsl_and_prefilter(ray_session):
    """knn.filter is a PRE-filter: only matching vectors compete, so k
    survivors return whenever they exist; non-term filters are rejected."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from elasticsearch_ray.ops.hnsw import knn_search
    from elasticsearch_ray.search.dsl import DslError, parse_dsl

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(60, 8))
    df = pd.DataFrame({"vec_id": range(60),
                       "embedding": [v.tolist() for v in vecs],
                       "label": [i % 3 for i in range(60)]})
    q = parse_dsl({"query": {"knn": {
        "field": "embedding", "query_vector": vecs[0].tolist(),
        "k": 5, "num_candidates": 10_000,
        "filter": {"term": {"label": 2}}}}})
    out = knn_search(rd.from_pandas(df), q)
    assert len(out) == 5
    assert all(int(v) % 3 == 2 for v in out["vec_id"])
    with pytest.raises(DslError):
        parse_dsl({"query": {"knn": {"field": "embedding",
                                     "query_vector": [1.0],
                                     "filter": {"range": {"label": {"gte": 1}}}}}})


def test_knn_filter_roundtrip_and_validation():
    from elasticsearch_ray.search.dsl import DslError, parse_dsl, to_dsl
    import pytest

    body = {"query": {"knn": {"field": "embedding", "query_vector": [1.0, 2.0],
                              "k": 3, "num_candidates": 50,
                              "filter": [{"term": {"label": 2}}]}}}
    q = parse_dsl(body)
    assert q.filter == (("label", 2),)
    assert parse_dsl(to_dsl(q)) == q  # filter survives the round-trip
    with pytest.raises(DslError):  # term object without 'value'
        parse_dsl({"query": {"knn": {"field": "e", "query_vector": [1.0],
                                     "filter": {"term": {"label": {"boost": 2}}}}}})


def test_phrase_suggester_collate(web_engine):
    """PhraseSuggester collate (PhraseSuggester.java:120-151): the rendered
    {{suggestion}} query existence-checks each correction; prune=False
    drops non-matching corrections, prune=True keeps them annotated."""
    collate = {"query": {"match_phrase": {"text": "{{suggestion}}"}}}
    plain = web_engine.suggest_phrase("spark joim", size=5)
    pruned = web_engine.suggest_phrase("spark joim", size=5,
                                       collate=collate)
    assert pruned
    texts = [o["text"] for o in pruned]
    assert "spark join" in texts
    # every survivor really matches as a phrase
    for o in pruned:
        assert web_engine.count(
            __import__("elasticsearch_ray.search.dsl",
                       fromlist=["parse_dsl"]).parse_dsl(
                {"match_phrase": {"text": o["text"]}})) > 0
    # prune=True: the full candidate list survives, flagged
    kept = web_engine.suggest_phrase("spark joim", size=5,
                                     collate=dict(collate, prune=True))
    assert [o["text"] for o in kept] == [o["text"] for o in plain]
    flags = {o["text"]: o["collate_match"] for o in kept}
    assert flags["spark join"] is True
    assert set(texts) == {t for t, m in flags.items() if m}


def test_search_shards_and_can_match(web_engine):
    """_search_shards analog: manifest-only shard listing; with a query
    the Bloom can_match decision marks skippable shards."""
    from elasticsearch_ray.search.engine import filter_source_columns

    plain = web_engine.search_shards()
    assert plain["total"] == len(web_engine.parts)
    assert plain["skipped"] == 0
    assert all(s["state"] == "STARTED" and s["can_match"]
               for s in plain["shards"])
    assert sum(s["n_docs"] for s in plain["shards"]) == web_engine.n_docs
    # a token present nowhere: every shard skippable
    none = web_engine.search_shards("zzzzunseen")
    assert none["skipped"] == none["total"]
    assert not any(s["can_match"] for s in none["shards"])
    # a common token: no shard skipped, and the response is consistent
    some = web_engine.search_shards("spark")
    assert some["skipped"] == some["total"] - sum(
        s["can_match"] for s in some["shards"])
    assert any(s["can_match"] for s in some["shards"])

    # _source filtering (FetchSourceContext): include/exclude globs on
    # fetched columns, hit metadata always kept
    res = web_engine.search("spark", k=3, fetch=("url", "doc_id"))
    inc = filter_source_columns(res, includes=("ur*",))
    assert "url" in inc.column_names and "doc_id" not in inc.column_names
    assert {"rank", "score"} <= set(inc.column_names)
    exc = filter_source_columns(res, excludes=("url",))
    assert "url" not in exc.column_names and "doc_id" in exc.column_names
