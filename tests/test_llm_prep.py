"""LLM data-prep ops: stratified sampling, sequence packing, PII
redaction — determinism, packing invariants, and DuckDB twin parity.
"""

import numpy as np
import pandas as pd
import pytest

import ray

from elasticsearch_ray.ops.llm_prep import (
    DEFAULT_PII_RULES,
    pack_bins,
    pack_windows,
    pii_sql_expr,
    redact_pii,
    stratified_sample,
)


def _docs(n=400):
    rng = np.random.RandomState(3)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], n, p=[0.6, 0.25, 0.15]),
        "n_tokens": rng.randint(5, 900, n).astype(np.int64),
    })


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.from_pandas(_docs()).repartition(4).materialize()


def test_stratified_sample_matches_hash_rule(docs_ds):
    rates = {"en": 0.5, "de": 1.0}
    out = stratified_sample(docs_ds, "lang", rates, "doc_id").to_pandas()
    df = _docs()
    h = (df["doc_id"].to_numpy(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2**32)
    thr = df["lang"].map({"en": 0.5 * 2**32, "de": 2**32}).fillna(0.0)
    expect = df[h < thr.to_numpy(np.float64).astype(np.uint64)]
    assert sorted(out["doc_id"]) == sorted(expect["doc_id"])
    # fr rows (default_rate=0) all dropped; de rows all kept
    assert not set(out.loc[out["lang"] == "fr", "doc_id"])
    assert (out["lang"] == "de").sum() == (df["lang"] == "de").sum()


def test_stratified_sample_layout_invariant(ray_session):
    df = _docs(300)
    a = stratified_sample(ray.data.from_pandas(df).repartition(1),
                          "lang", {"en": 0.3}, "doc_id").to_pandas()
    b = stratified_sample(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=1))
        .repartition(7), "lang", {"en": 0.3}, "doc_id").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_stratified_sample_rate_validation(docs_ds):
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(docs_ds, "lang", {"en": 1.5}, "doc_id")


def test_pack_windows_matches_prefix_sum(docs_ds):
    W = 512
    out = pack_windows(docs_ds, "doc_id", "n_tokens", W,
                       group_size=64).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    df = _docs().sort_values("doc_id", ignore_index=True)
    off = np.concatenate(([0], np.cumsum(df["n_tokens"].to_numpy())[:-1]))
    assert out["offset"].tolist() == off.tolist()
    assert out["first_window"].tolist() == (off // W).tolist()
    last = (off + df["n_tokens"].to_numpy() - 1) // W
    assert out["last_window"].tolist() == last.tolist()
    # stream property: windows tile the corpus with no gaps
    total = int(df["n_tokens"].sum())
    assert out["last_window"].max() == (total - 1) // W


def test_pack_windows_layout_invariant(ray_session):
    df = _docs(200)
    a = pack_windows(ray.data.from_pandas(df).repartition(1),
                     "doc_id", "n_tokens", 256, group_size=32).to_pandas()
    b = pack_windows(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=5))
        .repartition(5), "doc_id", "n_tokens", 256, group_size=32
    ).to_pandas()
    a = a.sort_values("doc_id", ignore_index=True)
    b = b.sort_values("doc_id", ignore_index=True)
    assert a[["offset", "first_window"]].equals(b[["offset",
                                                   "first_window"]])


def test_pack_bins_capacity_and_order(docs_ds):
    C = 1024
    out = pack_bins(docs_ds, "doc_id", "n_tokens", C,
                    group_size=64).to_pandas()
    g = out.groupby("bin_id")
    sizes = g["n_tokens"].sum()
    n_docs = g.size()
    # a bin exceeds capacity only when it is a single oversized doc
    over = sizes[sizes > C]
    for b in over.index:
        rows = out[out["bin_id"] == b]
        assert len(rows) == 1 and bool(rows["oversize"].iloc[0])
    # next-fit in id order: bin ids are nondecreasing with doc id
    s = out.sort_values("doc_id")
    assert (s["bin_id"].diff().dropna() >= 0).all()
    # bins never cross group boundaries
    assert ((s["doc_id"] // 64) == (s["bin_id"] // 64)).all()
    assert n_docs.sum() == 400


def test_pack_bins_next_fit_exact_small(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                       "n": np.array([400, 500, 200, 900, 1200, 100],
                                     np.int64)})
    out = pack_bins(ray.data.from_pandas(df), "doc_id", "n", 1000,
                    group_size=100).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    # next-fit: [400+500], [200], [900], [1200 oversize], [100]
    assert out["bin_id"].tolist() == [0, 0, 1, 2, 3, 4]
    assert out["oversize"].tolist() == [False] * 4 + [True, False]


def test_redact_pii_and_sql_twin(ray_session):
    import duckdb

    texts = [
        "mail me at alice.smith+x@ex-ample.co.uk today",
        "server 192.168.0.1 and 10.0.0.255 are up",
        "ssn 123-45-6789 phone 555-867-5309",
        "no pii here, just 1.2 and v1.2.3.4.5 leftovers",
        "two emails a@b.io c@d.org",
    ]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": texts})
    out = redact_pii(ray.data.from_pandas(df), "text").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["text"][0] == "mail me at <EMAIL> today"
    assert out["text"][1] == "server <IP> and <IP> are up"
    assert out["text"][2] == "ssn <SSN> phone <PHONE>"
    assert out["text"][4] == "two emails <EMAIL> <EMAIL>"
    # DuckDB twin is exact on every row
    con = duckdb.connect()
    con.register("t", df)
    twin = con.execute(
        f"SELECT {pii_sql_expr('text')} AS r FROM t ORDER BY doc_id"
    ).df()["r"].tolist()
    assert twin == out["text"].tolist()


def test_redact_custom_rules_order(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["id 12-34 and 12-34-56"]})
    rules = [("LONG", r"\b\d{2}-\d{2}-\d{2}\b"),
             ("SHORT", r"\b\d{2}-\d{2}\b")]
    out = redact_pii(ray.data.from_pandas(df), "text",
                     rules=rules).to_pandas()
    assert out["text"][0] == "id <SHORT> and <LONG>"
    rev = redact_pii(ray.data.from_pandas(df), "text",
                     rules=rules[::-1]).to_pandas()
    # reversed order: SHORT fires first inside the long span
    assert rev["text"][0] == "id <SHORT> and <SHORT>-56"


def test_redact_out_col_preserves_source(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["a@b.io"]})
    out = redact_pii(ray.data.from_pandas(df), "text",
                     out_col="clean").to_pandas()
    assert out["text"][0] == "a@b.io" and out["clean"][0] == "<EMAIL>"


def test_bpe_token_count_matches_duckdb(ray_session):
    import duckdb

    from elasticsearch_ray.ops.textstats import (
        BPE_SPLIT_PATTERN,
        bpe_token_count,
    )

    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["Hello world, it's 2024!", "don't stop-me now (v1.2.3)",
                 "  spaces\tand\ttabs ", "東京 123abc façade", ""],
    })
    out = bpe_token_count(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register("t", df)
    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    want = con.execute(
        f"SELECT len(regexp_extract_all(text, '{pat}'))::BIGINT AS n "
        f"FROM t ORDER BY doc_id").df()["n"].tolist()
    assert out["n_bpe_tokens"].tolist() == want
    assert out["n_bpe_tokens"].iloc[4] == 0  # empty text


def test_global_shuffle_deterministic_and_layout_invariant(ray_session):
    from elasticsearch_ray.ops.llm_prep import global_shuffle

    df = _docs(300)
    a = global_shuffle(ray.data.from_pandas(df).repartition(1),
                       "doc_id", seed=7).to_pandas()["doc_id"].tolist()
    b = global_shuffle(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=2))
        .repartition(6), "doc_id", seed=7).to_pandas()["doc_id"].tolist()
    assert a == b                       # layout/ordering independent
    assert a != sorted(a)               # actually permuted
    c = global_shuffle(ray.data.from_pandas(df), "doc_id",
                       seed=8).to_pandas()["doc_id"].tolist()
    assert c != a                       # seed changes the permutation
    assert sorted(a) == sorted(c) == df["doc_id"].tolist()
    # matches the SQL-expressible key exactly
    import duckdb
    want = duckdb.sql("""
        SELECT doc_id FROM df
        ORDER BY ((doc_id + 7) * 2654435761) % 4294967296, doc_id
    """).df()["doc_id"].tolist()
    assert a == want


def test_temperature_mixture_rates_and_sample(ray_session):
    import duckdb

    from elasticsearch_ray.ops.llm_prep import (
        temperature_mixture_rates,
        temperature_sample,
    )

    df = _docs(600)
    # skewed strata: 'a' huge, 'c' tiny
    df["dom"] = np.where(df["doc_id"] % 10 < 7, "a",
                         np.where(df["doc_id"] % 10 < 9, "b", "c"))
    ds = ray.data.from_pandas(df).repartition(4)
    rates = temperature_mixture_rates(ds, "dom", alpha=0.7,
                                      target_fraction=0.5)
    # smoothing up-weights the small domain
    assert rates["c"] > rates["b"] > rates["a"]
    # alpha=1 -> every domain sampled at target_fraction exactly
    flat = temperature_mixture_rates(ds, "dom", alpha=1.0,
                                     target_fraction=0.5)
    assert all(abs(r - 0.5) < 1e-6 for r in flat.values())
    got = temperature_sample(ds, "dom", "doc_id", alpha=0.7,
                             target_fraction=0.5).to_pandas()
    got = got.sort_values("doc_id")["doc_id"].tolist()
    want = duckdb.sql("""
        WITH c AS (SELECT dom, count(*)::DOUBLE AS n FROM df GROUP BY dom),
             w AS (SELECT dom, n,
                          pow(n, 0.7) / sum(pow(n, 0.7)) OVER () AS p,
                          sum(n) OVER () AS total FROM c),
             r AS (SELECT dom, round(least(1.0, 0.5 * total * p / n), 6)
                     AS rate FROM w)
        SELECT d.doc_id FROM df d JOIN r USING (dom)
        WHERE (d.doc_id * 2654435761) % 4294967296
              < floor(r.rate * 4294967296)
        ORDER BY d.doc_id
    """).df()["doc_id"].tolist()
    assert got == want


def _quality_corpus(n=500):
    rng = np.random.RandomState(13)
    texts, labels = [], []
    words = ["data", "model", "train", "sample", "value", "batch"]
    for i in range(n):
        if i % 2 == 0:  # "high": varied words, stopwords present
            k = rng.randint(30, 80)
            toks = ["the" if j % 4 == 0 else
                    words[rng.randint(len(words))] + str(rng.randint(50))
                    for j in range(k)]
            labels.append("high")
        else:  # "low": tiny, repetitive, no stopwords
            toks = ["zz"] * rng.randint(3, 8)
            labels.append("low")
        texts.append(" ".join(toks))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts, "label": labels})


def test_quality_classifier_train_score_filter(ray_session):
    from elasticsearch_ray.ops.llm_prep import (
        quality_filter,
        score_quality,
        train_quality_classifier,
    )

    df = _quality_corpus()
    seed = df.iloc[:200][["doc_id", "label"]]  # labeled seed only
    ds = ray.data.from_pandas(df.drop(columns=["label"])).repartition(4)
    defn, meta = train_quality_classifier(ds, seed)
    assert meta["objective"] == "binary_logloss"
    scored = score_quality(ds, defn, positive_label="high").to_pandas()
    scored = scored.merge(df[["doc_id", "label"]], on="doc_id")
    # held-out rows (not in the seed) classified correctly
    held = scored[scored["doc_id"] >= 200]
    acc = ((held["quality_prob"] >= 0.5) == (held["label"] == "high")
           ).mean()
    assert acc > 0.95
    kept = quality_filter(ds, defn, threshold=0.5,
                          positive_label="high").to_pandas()
    assert set(kept.columns) >= {"doc_id", "text", "quality_prob"}
    frac = len(kept) / len(df)
    assert 0.4 < frac < 0.6  # ~half the corpus is high quality


def test_c4_clean_rules_and_duckdb_twin(ray_session):
    """C4 §2.2 rules (Raffel et al. 2020) — each rule pinned, and the
    whole pass equals the DuckDB list_filter twin used by the oracle."""
    import duckdb

    from elasticsearch_ray.ops.llm_prep import c4_clean

    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            # kept: 3 good sentences
            "this is a perfectly fine sentence.\n"
            "here is another good long line!\n"
            "and a third one to pass the sentence floor?",
            # line without terminal punctuation dropped -> < 3 sentences
            "this line has no terminal punctuation at all\n"
            "only one good line survives here today.",
            # short lines dropped (under 5 words)
            "too short.\ntiny line!\nnope?",
            # javascript line dropped, rest kept
            "please enable javascript to view this.\n"
            "a first real line of content here.\n"
            "a second real line of content here.\n"
            "a third real line of content here.",
            # lorem ipsum page dropped entirely
            "lorem ipsum dolor sit amet sentence one.\n"
            "more filler that would otherwise pass fine.\n"
            "and even a third acceptable line here.",
            # curly brace page dropped entirely
            "function() { return 1; }\n"
            "a first real line of content here.\n"
            "a second real line of content here.\n"
            "a third real line of content here.",
            # quoted-terminal line counts as terminal punctuation
            'he said this would be "quoted."\n'
            "another fine line with enough words.\n"
            "a third fine line with enough words.",
            "",
        ],
    })
    got = c4_clean(ray.data.from_pandas(df).repartition(3)).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == [0, 3, 6]
    assert "javascript" not in got.loc[1, "clean"].lower()
    assert got.loc[1, "clean"].count("\n") == 2  # 3 surviving lines
    want = duckdb.sql(r"""
        WITH c AS (
          SELECT doc_id,
                 array_to_string(list_filter(string_split(text, chr(10)),
                   l -> regexp_matches(trim(l), '[.!?"]$')
                        AND len(string_split(l, ' ')) >= 5
                        AND NOT contains(lower(l), 'javascript')),
                   chr(10)) AS clean
          FROM df
          WHERE NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{'))
        SELECT doc_id, clean FROM c
        WHERE len(regexp_extract_all(clean, '[.!?]')) >= 3
        ORDER BY doc_id
    """).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["clean"].tolist() == want["clean"].tolist()


def test_c4_clean_space_only_trim_matches_duckdb(ray_session):
    """review r5 #5: tab/CR-terminated lines must be judged identically
    by the engine and the DuckDB twin (trim strips SPACES only)."""
    import duckdb

    from elasticsearch_ray.ops.llm_prep import c4_clean

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": [
            "a tab terminated line with words.\t\n"
            "a good line with enough words here.\n"
            "another good line with enough words.\n"
            "a third good line with enough words.",
            "a cr terminated line with word.\r\n"
            "three good lines follow this one now.\n"
            "second good line with enough words.\n"
            "third good line with enough words.",
        ],
    })
    got = c4_clean(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    want = duckdb.sql(r"""
        WITH c AS (
          SELECT doc_id,
                 array_to_string(list_filter(string_split(text, chr(10)),
                   l -> regexp_matches(trim(l), '[.!?"]$')
                        AND len(string_split(l, ' ')) >= 5
                        AND NOT contains(lower(l), 'javascript')),
                   chr(10)) AS clean
          FROM df
          WHERE NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{'))
        SELECT doc_id, clean FROM c
        WHERE len(regexp_extract_all(clean, '[.!?]')) >= 3
        ORDER BY doc_id
    """).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["clean"].tolist() == want["clean"].tolist()
    # the tab/cr lines were dropped on BOTH sides
    assert all("\t" not in c and "\r" not in c for c in got["clean"])


def test_hash_split_deterministic_and_stable(ray_session):
    import hashlib

    import ray.data as rd

    from elasticsearch_ray.ops.llm_prep import (
        hash_split,
        hash_split_sql_expr,
    )

    ids = list(range(2000))
    ds = rd.from_items([{"doc_id": i} for i in ids])
    out = hash_split(ds, "doc_id", salt="s1").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # pure function of the id: repartitioning never moves a doc
    out2 = hash_split(ds.repartition(7), "doc_id", salt="s1") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["split"]) == list(out2["split"])
    # appending new docs never reassigns old ones
    ds3 = rd.from_items([{"doc_id": i} for i in ids + [9999, 10001]])
    out3 = hash_split(ds3, "doc_id", salt="s1").to_pandas() \
        .set_index("doc_id")["split"]
    assert all(out3[i] == s for i, s in zip(out["doc_id"], out["split"]))
    # fractions land near the targets
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac.get("valid", 0) - 0.05) < 0.02
    # salt changes produce an independent split
    alt = hash_split(ds, "doc_id", salt="s2").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(alt["split"]) != list(out["split"])
    # python band == SQL twin band (md5 parity)
    import duckdb

    expr = hash_split_sql_expr("doc_id", salt="s1")
    sql = duckdb.sql(
        f"SELECT doc_id, {expr} AS split FROM (SELECT unnest(range(2000))"
        " AS doc_id) ORDER BY doc_id").df()
    assert list(sql["split"]) == list(out["split"])
    # every id's band matches a direct hashlib computation
    for i in (0, 7, 123, 1999):
        band = int(hashlib.md5(f"s1{i}".encode()).hexdigest()[:8],
                   16) % 10000
        expect = ("train" if band < 9000
                  else "valid" if band < 9500 else "test")
        assert out.loc[i, "split"] == expect
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(ds, "doc_id", splits={"train": 0.5})


# ------------------------------------------- CCNet head/middle/tail split

def test_ccnet_buckets_equal_thirds(ray_session):
    import ray.data as rd
    from elasticsearch_ray.ops.textstats import (
        ccnet_perplexity_buckets, fit_unigram_lm)

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "lang": ["en", "de"] * 150,
        "text": [" ".join(rng.choice(vocab,
                                     size=rng.integers(5, 30)))
                 for _ in range(300)],
    })
    ds = rd.from_pandas(docs)
    lm = fit_unigram_lm(ds)
    bucketed, th = ccnet_perplexity_buckets(ds, lm)
    out = bucketed.to_pandas()
    assert set(th) == {"en", "de"}
    for lang, g in out.groupby("lang"):
        sizes = g["ppl_bucket"].value_counts()
        n = len(g)
        # value-threshold split: every doc lands in exactly one bucket
        assert sizes.get("head", 0) + sizes.get("middle", 0) + \
            sizes.get("tail", 0) == n
        # the bucket rule is the threshold rule, row by row
        t1, t2 = th[lang]
        want = np.where(g["_nll_r"] <= t1, "head",
                        np.where(g["_nll_r"] <= t2, "middle", "tail"))
        assert list(want) == list(g["ppl_bucket"])
        # head is never smaller than the exact third minus nothing and
        # never larger than third + tie mass at the cutoff
        ties = int((g["_nll_r"] == t1).sum())
        assert (n - 1) // 3 + 1 <= sizes.get("head", 0) <= \
            (n - 1) // 3 + ties
    # buckets are ordered by quality: max(head) <= min(tail) per lang
    for lang, g in out.groupby("lang"):
        h = g[g["ppl_bucket"] == "head"]["_nll_r"]
        t = g[g["ppl_bucket"] == "tail"]["_nll_r"]
        if len(h) and len(t):
            assert h.max() <= t.min()


def test_ccnet_buckets_drops_empty_docs_and_is_per_lang(ray_session):
    import ray.data as rd
    from elasticsearch_ray.ops.textstats import (
        ccnet_perplexity_buckets, fit_unigram_lm)

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "lang": ["en"] * 4 + ["fr"] * 4,
        "text": ["a a a", "a b", "b c d", "",           # en; one empty
                 "x x x x", "x y", "y z", "z z q"],     # fr
    })
    ds = rd.from_pandas(docs)
    lm = fit_unigram_lm(ds)
    bucketed, th = ccnet_perplexity_buckets(ds, lm)
    out = bucketed.to_pandas()
    assert 3 not in set(out["doc_id"])  # empty doc dropped
    assert len(out) == 7
    # thresholds computed independently per language
    assert th["en"] != th["fr"]


def test_rtd_transform_labels_align_and_deterministic(ray_session):
    """ELECTRA RTD: labels mark exactly the changed tokens; identical
    replacements labeled 0; pure function of (id, seed)."""
    import ray.data as rd

    from elasticsearch_ray.ops.llm_prep import rtd_transform

    rng = np.random.default_rng(4)
    vocab = [f"v{i}" for i in range(50)]
    docs = pd.DataFrame({
        "doc_id": np.arange(30),
        "text": [" ".join(rng.choice(vocab, rng.integers(5, 60)))
                 for _ in range(30)] + [],
    })
    out = (rtd_transform(rd.from_pandas(docs), "text", "doc_id",
                         vocab=vocab, replace_rate=0.2)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    for _, row in out.iterrows():
        orig = row["text"].split()
        corr = row["corrupted"].split()
        lab = list(row["labels"])
        assert len(orig) == len(corr) == len(lab)
        for o, c, l in zip(orig, corr, lab):
            # label 1 <-> token actually changed (the ELECTRA rule)
            assert (o != c) == bool(l)
    # a healthy fraction of docs carry at least one replacement
    assert (out["labels"].map(sum) > 0).mean() > 0.8
    # deterministic under re-run and repartition
    out2 = (rtd_transform(rd.from_pandas(docs).repartition(7), "text",
                          "doc_id", vocab=vocab, replace_rate=0.2)
            .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["corrupted"].tolist() == out2["corrupted"].tolist()
    # a different seed corrupts different positions
    out3 = (rtd_transform(rd.from_pandas(docs), "text", "doc_id",
                          vocab=vocab, replace_rate=0.2, seed=9)
            .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["corrupted"].tolist() != out3["corrupted"].tolist()
    # empty doc passes through
    e = (rtd_transform(rd.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": [""]})), "text", "doc_id", vocab=vocab)
        .to_pandas())
    assert e["labels"].iloc[0] == []
    import pytest as _pt

    with _pt.raises(ValueError):
        rtd_transform(rd.from_pandas(docs), "text", "doc_id", vocab=[])


def test_review_r5d_rtd_nan_text(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.llm_prep import rtd_transform

    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": [np.nan, "a b c d e f"]})
    out = (rtd_transform(rd.from_pandas(df), "text", "doc_id",
                         vocab=["x", "y"])
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["labels"].iloc[0] == [] and out["corrupted"].iloc[0] == ""
    assert len(out["labels"].iloc[1]) == 6
