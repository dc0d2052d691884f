"""ops/: aggregations vs duckdb, HLL accuracy, dedup, ANN recall, multimodal
plumbing, processors, reindex resume."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rds(ray_session):
    import ray.data as rd

    return {
        "documents": rd.read_parquet(f"{SF}/documents.parquet"),
        "events": rd.read_parquet(f"{SF}/events.parquet"),
        "embeddings": rd.read_parquet(f"{SF}/embeddings.parquet"),
    }


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events", "embeddings", "lineitem", "orders"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_hll_accuracy(ray_session):
    from elasticsearch_ray.ops.hll import HLL

    for true_n in (100, 10_000, 200_000):
        h = HLL(p=14)
        h.add(np.arange(true_n))
        est = h.cardinality()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
    # mergeability: union of halves == whole
    a = HLL(p=12).add(np.arange(0, 50_000))
    b = HLL(p=12).add(np.arange(25_000, 75_000))
    merged = a.merge(b)
    whole = HLL(p=12).add(np.arange(75_000))
    assert merged.cardinality() == whole.cardinality()
    # serialization roundtrip
    assert HLL.from_bytes(whole.to_bytes()).cardinality() == whole.cardinality()


def test_cardinality_hll_close_to_exact(rds):
    from elasticsearch_ray.ops.aggs import cardinality_exact, cardinality_hll

    exact = cardinality_exact(rds["events"], "event_type", "user_id")
    approx = cardinality_hll(rds["events"], "event_type", "user_id")
    m = exact.merge(approx, on="event_type", suffixes=("_e", "_a"))
    assert np.all(
        np.abs(m["cardinality_e"] - m["cardinality_a"]) / m["cardinality_e"].clip(lower=1) < 0.06
    )


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.dedup import minhash_near_dups

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(vocab, 60)))
    # plant near-dups: doc 40/41 = copies of 0/1 with 3 words changed
    for src in (0, 1):
        words = docs[src].split()
        for _ in range(3):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        docs.append(" ".join(words))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(docs)), "text": docs}))
    out = minhash_near_dups(ds, "text", "doc_id", threshold=0.6)
    found = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    assert (0, 40) in found and (1, 41) in found
    # no random pair should be near-dup at 0.6 jaccard
    assert all(b >= 40 for a, b in found)


def test_minhash_hot_bucket_capped(ray_session):
    """Round-3 verdict #2: a degenerate band bucket (here 220 identical
    docs) must NOT emit C(n,2) pairs. Oversized buckets emit an n-1
    sorted chain — linear emission, full coverage, and the mega cluster
    stays CONNECTED for the components stage."""
    import ray.data as rd

    from elasticsearch_ray.ops.components import connected_components
    from elasticsearch_ray.ops.dedup import minhash_candidate_pairs

    n_hot = 220
    docs = ["alpha beta gamma delta epsilon zeta eta theta"] * n_hot
    docs += [f"unique{i} filler{i} words{i} here{i} now{i}" for i in range(10)]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(docs)), "text": docs}))
    cap = 16
    pairs = minhash_candidate_pairs(ds, "text", "doc_id", bucket_cap=cap)
    # uncapped would be C(220,2) = 24090 pairs; the chain is n-1 (all
    # 16 bands emit the SAME chain, deduped away)
    assert len(pairs) <= n_hot + 16, len(pairs)
    comp = connected_components(pairs)
    hot = comp[comp["id"] < n_hot]
    # every hot doc is covered and the cluster is ONE component
    assert len(hot) == n_hot
    assert hot["component"].nunique() == 1


def test_ngram_jaccard_finds_planted_near_dups(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.dedup import ngram_jaccard_dups

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    docs = [" ".join(rng.choice(vocab, 80)) for _ in range(40)]
    for src in (0, 1):  # near-dups: 2 words changed
        words = docs[src].split()
        for _ in range(2):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        docs.append(" ".join(words))
    docs.append(docs[2])  # exact dup of doc 2
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(docs)), "text": docs}))
    out = ngram_jaccard_dups(ds, "text", "doc_id", threshold=0.5, shingle_k=4)
    found = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    assert (0, 40) in found and (1, 41) in found and (2, 42) in found
    assert all(b >= 40 for _a, b in found)  # no false positives among randoms
    jac = dict(zip(zip(out["id_a"], out["id_b"]), out["jaccard"]))
    assert jac[(2, 42)] == 1.0


def test_simhash_hamming_zero_for_identical(rds, ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.dedup import simhash_near_dups

    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c d", "a b c d", "x y z w"]})
    out = simhash_near_dups(rd.from_pandas(df), "text", "doc_id", max_hamming=0)
    assert [(r["id_a"], r["id_b"]) for _, r in out.iterrows()] == [(0, 1)]


def test_ivf_recall_vs_brute(rds):
    from elasticsearch_ray.ops.ann import brute_topk, ivf_topk

    t = pq.read_table(f"{SF}/embeddings.parquet")
    qids = t["vec_id"].to_numpy()[:5].tolist()
    qm = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()[:5]])
    exact = brute_topk(rds["embeddings"], qids, qm, k=10)
    approx = ivf_topk(rds["embeddings"], qids, qm, k=10, ncells=8, nprobe=4)
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 cells


def test_embedding_near_dups(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.dedup import embedding_near_dups

    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    vecs = np.concatenate([base, base[:3] + rng.normal(scale=1e-3, size=(3, 16)).astype(np.float32)])
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]})
    out = embedding_near_dups(rd.from_pandas(df), threshold=0.999, ncells=2, sample_n=33)
    found = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    assert {(0, 30), (1, 31), (2, 32)} <= found


def test_multimodal_pipeline(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.multimodal import (
        DecodeStats,
        EmbedStage,
        FrameSampleStage,
        ResizeStage,
        decode_image_stub,
        media_pipeline,
        synthesize_media,
    )

    tbl = synthesize_media(20, n_frames=4)
    ds = rd.from_arrow(tbl)
    stats = ds.map_batches(DecodeStats, batch_format="pyarrow", batch_size=8,
                           concurrency=2).to_pandas()
    assert len(stats) == 20 and (stats["n_frames"] == 4).all()
    assert stats["pix_mean"].between(100, 155).all()  # uniform [0,256)

    resized = ds.map_batches(ResizeStage, fn_constructor_args=(8, 8),
                             batch_format="pyarrow", batch_size=8, concurrency=2)
    r0 = resized.take(1)[0]
    arr = decode_image_stub(r0["payload"])
    assert arr.shape == (4, 8, 8) and r0["width"] == 8 and r0["height"] == 8

    emb = media_pipeline(ds, out_h=8, out_w=8, dim=16).to_pandas()
    assert len(emb) == 20 and all(len(v) == 16 for v in emb["embedding"])
    norms = [np.linalg.norm(v) for v in emb["embedding"]]
    assert np.allclose(norms, 1.0, atol=1e-5)

    sampled = ds.map_batches(FrameSampleStage, fn_constructor_args=(2,),
                             batch_format="pyarrow", batch_size=8, concurrency=2).take(1)[0]
    assert sampled["n_frames"] == 2

    # the decode stub refuses foreign bytes like a real codec import would
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_multimodal_real_codecs():
    """BMP / PPM / WAV are REAL from-scratch codecs: byte round-trips are
    exact, including BMP's bottom-up BGR rows and 4-byte row padding
    (non-multiple-of-4 width exercises the pad path)."""
    from elasticsearch_ray.ops.multimodal import (
        decode_audio,
        decode_bmp,
        decode_image,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (11, 7, 3), np.uint8)  # w=7: padded rows
    assert (decode_bmp(encode_bmp(img))[0] == img).all()
    assert (decode_ppm(encode_ppm(img))[0] == img).all()
    assert (decode_image(encode_bmp(img))[0] == img).all()

    s = rng.integers(-30000, 30000, (500, 2), np.int16)
    out, rate = decode_audio(encode_wav(s, 8000))
    assert rate == 8000 and (out == s).all()

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG not decodable here")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 not decodable here")


def test_multimodal_bmp_pipeline_and_audio(ray_session):
    """The actor-pool stages run over REAL BMP/WAV bytes end to end; the
    spectral centroid of a pure tone lands near its known frequency."""
    import ray.data as rd

    from elasticsearch_ray.ops.multimodal import (
        AudioFeatures,
        decode_bmp,
        ResizeStage,
        media_pipeline,
        synthesize_bmp_media,
        synthesize_wav_media,
    )

    bmp = rd.from_arrow(synthesize_bmp_media(12))
    r0 = bmp.map_batches(ResizeStage, fn_constructor_args=(6, 6),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=2).take(1)[0]
    arr = decode_bmp(bytes(r0["payload"]))  # stays a real BMP after resize
    assert arr.shape == (1, 6, 6, 3)
    emb = media_pipeline(bmp, out_h=8, out_w=8, dim=12).to_pandas()
    assert len(emb) == 12 and all(len(v) == 12 for v in emb["embedding"])

    wav = synthesize_wav_media(8, rate=8000)
    feats = (rd.from_arrow(wav)
             .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=4,
                          concurrency=2).to_pandas()
             .sort_values("media_id").reset_index(drop=True))
    tones = wav["tone_hz"].to_numpy()
    assert len(feats) == 8
    assert np.allclose(feats["spectral_centroid_hz"], tones, rtol=0.25)
    assert (feats["rms"].between(0.3, 0.4)).all()  # 0.5 amplitude sine ≈ 0.354
    # zero-cross rate of a tone ≈ 2·f0/rate
    assert np.allclose(feats["zero_cross_rate"], 2 * tones / 8000, rtol=0.2)


def test_processors_pipeline(ray_session):
    from elasticsearch_ray.ops.processors import Pipeline

    df = pd.DataFrame(
        {
            "msg": ["  Hello World  ", "FOO bar  "],
            "kv": ["a=1;b=2", "a=3;b=4"],
            "url": ["https://a.b.example.com/x?q=1", "https://example.co.uk/y"],
            "size": ["1kb", "2mb"],
            "j": ['{"k": 5}', '{"k": 6}'],
        }
    )
    pipe = Pipeline(
        [
            {"trim": {"field": "msg"}},
            {"lowercase": {"field": "msg"}},
            {"gsub": {"field": "msg", "pattern": "o", "replacement": "0"}},
            {"split": {"field": "msg", "separator": " "}},
            {"join": {"field": "msg", "separator": "-"}},
            {"kv": {"field": "kv", "field_split": ";", "value_split": "=", "target_field": "kvp"}},
            {"uri_parts": {"field": "url"}},
            {"registered_domain": {"field": "url.domain"}},
            {"bytes": {"field": "size"}},
            {"json": {"field": "j", "add_to_root": True}},
            {"fingerprint": {"fields": ["msg"], "target_field": "fp"}},
            {"rename": {"field": "msg", "target_field": "message"}},
        ]
    )
    out = pipe(df.copy())
    assert out["message"].tolist() == ["hell0-w0rld", "f00-bar"]
    assert out["kvp"].iloc[0] == {"a": "1", "b": "2"}
    assert out["url.domain"].iloc[0] == "a.b.example.com"
    assert out["registered_domain"].tolist() == ["example.com", "example.co.uk"]
    assert out["size"].tolist() == [1024, 2 * 1024**2]
    assert out["k"].tolist() == [5, 6]
    assert out["fp"].iloc[0] != out["fp"].iloc[1]
    # drop processor filters rows
    from elasticsearch_ray.ops.processors import Pipeline as P

    dropped = P([{"drop": {"condition": lambda d: d["size"] == "1kb"}}])(df.copy())
    assert len(dropped) == 1


def test_reindex_resume(ray_session, tmp_path):
    from elasticsearch_ray.pipelines.reindex import reindex
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf(SF, multiplier=1, num_files=3)
    dst = str(tmp_path / "reindexed")
    r1 = reindex(corpus, dst, processors=[{"uppercase": {"field": "lang"}}],
                 file_pattern="pages-*.parquet", columns=["url", "lang"])
    assert r1["shards"] == 3 and r1["skipped"] == 0 and r1["rows"] == 500
    out = pq.read_table(os.path.join(dst, "part-00000.parquet"))
    assert set(out["lang"].to_pylist()) <= {"EN", "DE", "FR", "ES", "ZH"}
    r2 = reindex(corpus, dst, processors=[{"uppercase": {"field": "lang"}}],
                 file_pattern="pages-*.parquet", columns=["url", "lang"])
    assert r2["skipped"] == 3 and r2["rows"] == 0


def test_grok_and_foreach(ray_session):
    from elasticsearch_ray.ops.processors import Pipeline

    df = pd.DataFrame(
        {
            "log": [
                "2024-01-02T03:04:05Z ERROR 10.0.0.7 disk full",
                "2024-06-07 11:12:13 INFO 192.168.1.1 started",
            ],
            "tags": [["Alpha", "Beta"], ["Gamma"]],
        }
    )
    pipe = Pipeline(
        [
            {"grok": {"field": "log",
                      "pattern": "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{IP:ip} %{GREEDYDATA:msg}"}},
            {"foreach": {"field": "tags", "processor": {"lowercase": {}}}},
        ]
    )
    out = pipe(df.copy())
    assert out["level"].tolist() == ["ERROR", "INFO"]
    assert out["ip"].tolist() == ["10.0.0.7", "192.168.1.1"]
    assert out["msg"].tolist() == ["disk full", "started"]
    assert out["tags"].tolist() == [["alpha", "beta"], ["gamma"]]


def test_training_data_pipeline(ray_session, tmp_path):
    from elasticsearch_ray.pipelines.training_data import training_data_pipeline
    from elasticsearch_ray.search.query import MatchQuery
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf(SF, multiplier=2, num_files=4)  # rep 1 = permuted dups
    out = training_data_pipeline(corpus, str(tmp_path / "td"), min_tokens=10)
    assert out["input_pages"] == 1000
    assert 0 < out["after_quality"] <= 1000
    # permuted reps have identical token BAGS but different text → exact dedup
    # keeps them; the pipeline still must not LOSE uniques
    assert out["after_dedup"] <= out["after_quality"]
    hits = out["engine"].search(MatchQuery("spark join"), k=5, fetch=("url",))
    assert hits.num_rows == 5


def test_training_pipeline_near_dedup(ray_session, tmp_path):
    """near_dup_threshold collapses each planted MinHash cluster to ONE
    representative between exact dedup and indexing (exact dedup alone
    cannot: the members differ by a trailing edit)."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.training_data import training_data_pipeline

    rows = []
    for c in range(3):
        base = " ".join(f"cluster{c}word{i}" for i in range(40))
        for j in range(3):  # 3 near-identical variants per cluster
            rows.append({"url": f"https://nd.example.com/c{c}/v{j}",
                         "warc_ts": pd.Timestamp("2024-01-01"),
                         "html": f"<html><body><p>{base}{' tail edit' if j else ''}"
                                 f"{' two' if j == 2 else ''}</p></body></html>",
                         "lang": "en"})
    for k in range(30):
        words = " ".join(f"unique{k}tok{i}" for i in range(30))
        rows.append({"url": f"https://nd.example.com/u{k}",
                     "warc_ts": pd.Timestamp("2024-01-02"),
                     "html": f"<html><body><p>{words}</p></body></html>",
                     "lang": "en"})
    corpus = tmp_path / "ndcorpus"
    corpus.mkdir()
    df = pd.DataFrame(rows)
    for part in range(2):
        pq.write_table(pa.Table.from_pandas(df.iloc[part::2], preserve_index=False),
                       corpus / f"pages-{part:05d}.parquet")

    out = training_data_pipeline(str(corpus), str(tmp_path / "td"),
                                 min_tokens=10, near_dup_threshold=0.5)
    assert out["after_dedup"] == 39  # all texts distinct → exact dedup keeps all
    assert out["after_near_dedup"] == 33  # 3 clusters × 2 dropped members
    out["engine"].close() if hasattr(out["engine"], "close") else None


def test_tdigest_accuracy_and_merge(ray_session):
    from elasticsearch_ray.ops.tdigest import TDigest

    rng = np.random.default_rng(7)
    data = np.concatenate([rng.lognormal(0, 1.2, 100_000), rng.normal(50, 5, 50_000)])
    d = TDigest(delta=200).add(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
        approx = d.quantile(q)
        # rank error: how far off is the approx value's true rank from q
        rank = (data <= approx).mean()
        assert abs(rank - q) < 0.01, (q, approx, rank)
    # mergeability: split/merge ~= whole
    half = len(data) // 2
    a = TDigest(delta=200).add(data[:half])
    b = TDigest(delta=200).add(data[half:])
    merged = a.merge(b)
    for q in (0.25, 0.5, 0.95):
        rank = (data <= merged.quantile(q)).mean()
        assert abs(rank - q) < 0.015
    # serialization roundtrip
    rt = TDigest.from_bytes(merged.to_bytes())
    assert abs(rt.quantile(0.5) - merged.quantile(0.5)) < 1e-9


def test_percentiles_tdigest_vs_exact(rds, con):
    from elasticsearch_ray.ops.aggs import percentiles_agg, percentiles_tdigest

    exact = percentiles_agg(rds["documents"], "lang", "n_chars", percents=(50.0, 95.0))
    approx = percentiles_tdigest(rds["documents"], "lang", "n_chars", percents=(50.0, 95.0))
    m = exact.merge(approx, on="lang", suffixes=("_e", "_a"))
    # approximate but close on this modest-skew data
    assert np.all(np.abs(m["p50_e"] - m["p50_a"]) / m["p50_e"].clip(lower=1) < 0.05)
    assert np.all(np.abs(m["p95_e"] - m["p95_a"]) / m["p95_e"].clip(lower=1) < 0.05)


def test_date_index_name_processor(ray_session):
    from elasticsearch_ray.ops.processors import Pipeline

    df = pd.DataFrame({"ts": ["2024-03-05 10:00:00", "2024-11-30 23:59:59"]})
    out = Pipeline([{"date_index_name": {"field": "ts", "index_name_prefix": "logs",
                                          "date_rounding": "M"}}])(df)
    assert out["_index"].tolist() == ["logs-2024-03", "logs-2024-11"]


def test_new_agg_bank(rds, ray_session):
    """missing/global/date_range/MAD/percentile_ranks + pipeline-agg bank."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_ray.ops import aggs as A

    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "b"],
            "v": [1.0, 3.0, 2.0, 8.0, 4.0],
            "n": pd.array([1.0, None, 2.0, None, 5.0], dtype="float64"),
        }
    )
    ds = rd.from_pandas(df)
    assert A.missing_agg(ds, "n")["doc_count"].iloc[0] == 2
    g = A.global_stats_agg(ds, "v")
    assert g["count"].iloc[0] == 5 and g["sum"].iloc[0] == 18.0
    mad = A.median_absolute_deviation_agg(ds, "k", "v")
    assert mad.set_index("k")["mad"].to_dict() == {"a": 1.0, "b": 2.0}
    pr = A.percentile_ranks_agg(ds, "v", [2.0, 8.0])
    assert pr["rank_pct"].tolist() == [40.0, 100.0]

    buckets = pd.DataFrame({"key": [1, 2, 3, 4], "c": [10, 30, 20, 40], "s": [1.0, 2.0, 3.0, 4.0]})
    assert A.max_bucket(buckets, "key", "c").iloc[0].tolist() == [4, 40]
    assert A.min_bucket(buckets, "key", "c").iloc[0].tolist() == [1, 10]
    assert A.avg_bucket(buckets, "c")["value"].iloc[0] == 25.0
    assert A.sum_bucket(buckets, "c")["value"].iloc[0] == 100.0
    sb = A.stats_bucket(buckets, "c")
    assert sb["min"].iloc[0] == 10.0 and sb["max"].iloc[0] == 40.0
    bs = A.bucket_script(buckets, lambda d: d["c"] / 10, out_col="r")
    assert bs["r"].tolist() == [1.0, 3.0, 2.0, 4.0]
    sel = A.bucket_selector(buckets, lambda d: d["c"] > 15)
    assert sel["key"].tolist() == [2, 3, 4]
    srt = A.bucket_sort(buckets, [("c", "desc")], size=2)
    assert srt["key"].tolist() == [4, 2]
    sd = A.serial_diff(buckets, "c", lag=1)
    assert sd["diff"].tolist()[1:] == [20.0, -10.0, 20.0]
    pb = A.percentiles_bucket(buckets, "c", pcts=(50.0,))
    assert pb["value"].iloc[0] == 25.0


def test_date_range_and_auto_histogram(ray_session):
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import auto_date_histogram, date_range_agg

    ts = pd.date_range("2024-01-01", periods=48, freq="h")
    ds = rd.from_pandas(pd.DataFrame({"ts": ts}))
    out = date_range_agg(ds, "ts", [(None, "2024-01-02"), ("2024-01-02", None)])
    assert out["doc_count"].tolist() == [24, 24]
    ah = auto_date_histogram(ds, "ts", target_buckets=3)
    assert len(ah) <= 3 and ah["doc_count"].sum() == 48


def test_hnsw_recall_vs_brute(ray_session):
    """Sharded HNSW (Malkov & Yashunin) recall@10 >= 0.95 vs exact brute
    force on the embeddings fixture."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from elasticsearch_ray.ops.ann import brute_topk
    from elasticsearch_ray.ops.hnsw import hnsw_topk

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ds = rd.from_arrow(t)
    qm = np.stack([np.asarray(v, np.float64) for v in t["embedding"][:8].to_pylist()])
    qids = t["vec_id"][:8].to_pylist()
    exact = brute_topk(ds, qids, qm, k=10)
    approx = hnsw_topk(rd.from_arrow(t), qids, qm, k=10)
    recalls = []
    for q in qids:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    assert np.mean(recalls) >= 0.95, recalls
    # self-match sanity: each query's own vector is its top neighbor
    for q in qids:
        top = approx[approx["query_id"] == q].iloc[0]
        assert top["neighbor_id"] == q and top["cosine"] >= 0.999999


def test_hnsw_wave_path_recall():
    """n > 4096 forces the batched wave-insert build (the exact-kNN small
    path can't mask it). Regression for the _diversify owner-vector bug:
    wave rows belong to nodes lo..hi, not 0..wave — scoring candidates
    against the wrong owners silently degraded graph quality at scale."""
    import numpy as np

    from elasticsearch_ray.ops.ann import _normalize
    from elasticsearch_ray.ops.hnsw import HNSWGraph, _diversify

    rng = np.random.default_rng(11)
    v = _normalize(rng.normal(size=(5000, 24)))
    g = HNSWGraph(v, m=16, ef_construction=100)
    q = _normalize(rng.normal(size=(10, 24)))
    k, hits = 10, 0
    for i in range(len(q)):
        ids, _ = g.search(q[i], k, ef=120)
        exact = np.argsort(-(v @ q[i]))[:k]
        hits += len(set(ids.tolist()) & set(exact.tolist()))
    assert hits / (len(q) * k) >= 0.95

    # owner-sim invariant: with explicit owners, returned sims are the
    # TRUE owner→neighbor cosines (what reverse merges rely on)
    vv = _normalize(rng.normal(size=(300, 16)))
    owners = np.array([250, 260, 270], dtype=np.int64)
    sims_all = vv[owners] @ vv.T
    cand = np.argsort(-sims_all, axis=1)[:, 1:9].astype(np.int64)
    out, out_s = _diversify(cand, vv, 4, owners=owners)
    for r in range(len(owners)):
        for c in range(out.shape[1]):
            if out[r, c] >= 0:
                assert abs(vv[owners[r]] @ vv[out[r, c]] - out_s[r, c]) < 1e-5


def test_new_processors():
    """fail, sort, dot_expander, csv, pipeline-in-pipeline,
    network_direction, community_id (IngestCommonPlugin.java:57-89)."""
    import pandas as pd
    import pytest as _pt

    from elasticsearch_ray.ops.processors import Pipeline

    df = pd.DataFrame(
        {
            "tags": [["b", "a", "c"], ["z", "y"]],
            "line": ['x,1,"a,b"', "y,2,c"],
            "a.b": [1, 2],
            "source_ip": ["10.1.2.3", "8.8.8.8"],
            "dest_ip": ["93.184.216.34", "192.168.0.5"],
            "source_port": [34855, 53],
            "dest_port": [80, 53],
            "transport": ["tcp", "udp"],
        }
    )
    pipe = Pipeline(
        [
            {"sort": {"field": "tags"}},
            {"csv": {"field": "line", "target_fields": ["c1", "c2", "c3"]}},
            {"dot_expander": {"field": "a.b"}},
            {"pipeline": {"processors": [{"uppercase": {"field": "c1"}}]}},
            {"network_direction": {}},
            {"community_id": {}},
        ]
    )
    out = pipe(df.copy())
    assert out["tags"].tolist() == [["a", "b", "c"], ["y", "z"]]
    assert out["c1"].tolist() == ["X", "Y"]
    assert out["c3"].tolist() == ["a,b", "c"]
    assert "a__b" in out.columns and "a.b" not in out.columns
    assert out["network_direction"].tolist() == ["outbound", "inbound"]
    # community-id: symmetric under endpoint swap (flow identity)
    rev = df.copy()
    rev[["source_ip", "dest_ip"]] = rev[["dest_ip", "source_ip"]]
    rev[["source_port", "dest_port"]] = rev[["dest_port", "source_port"]]
    out2 = Pipeline([{"community_id": {}}])(rev)
    assert out["community_id"].tolist() == out2["community_id"].tolist()
    assert all(c.startswith("1:") for c in out["community_id"])
    # community-id spec published test vector (corelight/community-id-spec)
    v = pd.DataFrame(
        {
            "source_ip": ["128.232.110.120"], "dest_ip": ["66.35.250.204"],
            "source_port": [34855], "dest_port": [80], "transport": ["tcp"],
        }
    )
    got = Pipeline([{"community_id": {}}])(v)["community_id"].iloc[0]
    assert got == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    # fail processor raises on match
    with _pt.raises(ValueError):
        Pipeline([{"fail": {"where": lambda d: d["source_port"] > 0}}])(df.copy())


def test_grok_full_bank():
    """Apache common log + ISO8601/LOGLEVEL/PATH/EMAIL via the recursive
    grok bank (public logstash grok pattern semantics)."""
    import pandas as pd

    from elasticsearch_ray.ops.processors import Pipeline

    df = pd.DataFrame({"msg": [
        '10.0.0.5 - alice [10/Oct/2000:13:55:36 -0700] "POST /api/v1?x=1 HTTP/1.1" 201 99',
    ]})
    pat = (r'%{IPORHOST:client} %{USER:ident} %{USER:auth} \[%{HTTPDATE:ts}\] '
           r'"%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?" '
           r'%{NUMBER:status} (?:%{NUMBER:bytes}|-)')
    out = Pipeline([{"grok": {"field": "msg", "pattern": pat}}])(df)
    r = out.iloc[0]
    assert (r["client"], r["verb"], r["status"], r["httpversion"]) == (
        "10.0.0.5", "POST", "201", "1.1")
    df2 = pd.DataFrame({"m": ["2024-03-01 10:11:12 WARN /opt/app/log bob@ex.org"]})
    out2 = Pipeline([{"grok": {"field": "m", "pattern":
        r"%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{UNIXPATH:p} %{EMAILADDRESS:mail}"}}])(df2)
    assert out2.iloc[0]["mail"] == "bob@ex.org" and out2.iloc[0]["lvl"] == "WARN"


def test_diversified_sampler(ray_session):
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import diversified_sampler_agg

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 2, "i": range(7)})
    out = diversified_sampler_agg(rd.from_pandas(df), "k", 2, sort_col="i").to_pandas()
    counts = out["k"].value_counts().to_dict()
    assert counts == {"a": 2, "b": 2}
    assert sorted(out[out["k"] == "a"]["i"].tolist()) == [0, 1]


def test_time_series_agg(ray_session):
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import time_series_agg

    df = pd.DataFrame(
        {
            "host": ["a", "a", "a", "b", "b"],
            "metric": ["cpu", "cpu", "mem", "cpu", "cpu"],
            "ts": pd.to_datetime(
                ["2024-01-01 03:00", "2024-01-01 09:00", "2024-01-01 04:00",
                 "2024-01-02 01:00", "2024-01-02 02:00"]
            ),
            "value": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    # tsid-style buckets: one per (host, metric)
    out = time_series_agg(rd.from_pandas(df), ["host", "metric"], value_col="value")
    assert out[["host", "metric", "doc_count"]].values.tolist() == [
        ["a", "cpu", 2], ["a", "mem", 1], ["b", "cpu", 2]]
    assert out["sum_value"].tolist() == [3.0, 4.0, 24.0]
    # daily downsampling within each series
    out2 = time_series_agg(rd.from_pandas(df), ["host"], interval="day",
                           value_col="value")
    assert out2["doc_count"].tolist() == [3, 2]
    assert out2["sum_value"].tolist() == [7.0, 24.0]


def test_variable_width_histogram(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import variable_width_histogram

    rng = np.random.default_rng(3)
    v = np.concatenate([rng.normal(0, 1, 500), rng.normal(50, 1, 300), rng.normal(200, 2, 200)])
    out = variable_width_histogram(rd.from_pandas(pd.DataFrame({"v": v})), "v", buckets=3)
    assert len(out) == 3
    assert out["doc_count"].sum() == 1000
    # the three modes separate: bucket boundaries don't overlap
    assert (out["min"].to_numpy()[1:] > out["max"].to_numpy()[:-1]).all()
    assert abs(out["key"].iloc[2] - 200) < 5


def test_ip_range_and_prefix(ray_session):
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import ip_prefix_agg, ip_range_agg

    df = pd.DataFrame({"ip": ["10.0.0.1", "10.0.1.200", "10.32.5.5", "192.168.1.1"]})
    ds = rd.from_pandas(df)
    out = ip_range_agg(ds, "ip", ["10.0.0.0/19", ("10.32.0.0", "10.48.0.0"),
                                  "192.168.0.0/16"])
    assert out["doc_count"].tolist() == [2, 1, 1]
    pref = ip_prefix_agg(rd.from_pandas(df), "ip", prefix_length=24)
    m = dict(zip(pref["prefix"], pref["doc_count"]))
    assert m == {"10.0.0.0/24": 1, "10.0.1.0/24": 1, "10.32.5.0/24": 1,
                 "192.168.1.0/24": 1}


def test_multi_terms_agg(ray_session):
    import pandas as pd
    import ray.data

    from elasticsearch_ray.ops.aggs import multi_terms_agg

    df = pd.DataFrame({"a": ["x", "x", "y", "y", "y"], "b": [1, 1, 1, 2, 2],
                       "v": [10, 20, 30, 40, 50]})
    out = multi_terms_agg(ray.data.from_pandas(df), ["a", "b"], value_col="v")
    assert out.iloc[0][["a", "b"]].tolist() in (["x", 1], ["y", 2])  # both count 2
    assert out["doc_count"].tolist() == sorted(out["doc_count"], reverse=True)
    got = {(r["a"], r["b"]): (r["doc_count"], r["sum_v"]) for _, r in out.iterrows()}
    assert got == {("x", 1): (2, 30), ("y", 1): (1, 30), ("y", 2): (2, 90)}


def test_random_sampler_agg_deterministic(ray_session):
    import pandas as pd
    import ray.data

    from elasticsearch_ray.ops.aggs import random_sampler_agg

    df = pd.DataFrame({"doc_id": range(1000), "v": range(1000)})
    a = set(random_sampler_agg(ray.data.from_pandas(df), "doc_id", 0.3)
            .to_pandas()["doc_id"])
    b = set(random_sampler_agg(ray.data.from_pandas(df), "doc_id", 0.3)
            .to_pandas()["doc_id"])
    assert a == b  # hash-based: identical across runs and block layouts
    assert 0.2 < len(a) / 1000 < 0.4
    # matches the SQL-oracle predicate exactly
    expect = {i for i in range(1000) if (i * 2654435761) % 4294967296 < 0.3 * 4294967296}
    assert a == expect


def test_convert_boolean_parses_strings():
    import pandas as pd
    import pytest as _pt

    from elasticsearch_ray.ops.processors import Pipeline

    pipe = Pipeline([{"convert": {"field": "flag", "type": "boolean"}}])
    df = pipe(pd.DataFrame({"flag": ["true", "False", "TRUE", False]}))
    assert df["flag"].tolist() == [True, False, True, False]
    with _pt.raises(ValueError):
        pipe(pd.DataFrame({"flag": ["yes"]}))


def test_hll_float_values_hash_bits(ray_session):
    import ray.data

    from elasticsearch_ray.ops.hll import HLL

    # 5000 distinct floats in [0,1): a truncate-cast would collapse them all
    vals = (np.arange(5000) / 5000.0).astype(np.float64)
    h = HLL(p=12)
    h.add(vals)
    est = h.cardinality()
    assert 4000 < est < 6000, est


def test_tiered_merge_caps_segments_per_tier():
    from elasticsearch_ray.index.merge import (FLOOR_BYTES, SEGMENTS_PER_TIER,
                                               plan_tiered_merges)

    # 50 healthy same-tier segments: the tier is over budget and adjacent
    # runs must merge (the old planner returned nothing here)
    parts = [{"part": i, "bytes": 10 * 1024 * 1024} for i in range(50)]
    groups = plan_tiered_merges(parts)
    assert groups, "above-floor tier over budget must produce merges"
    flat = [p for g in groups for p in g]
    assert len(flat) == len(set(flat)), "a segment may appear in ONE group only"
    assert set(flat) <= {p["part"] for p in parts}
    assert all(len(g) > 1 for g in groups)
    # within budget: no merges
    small = [{"part": i, "bytes": 10 * 1024 * 1024} for i in range(SEGMENTS_PER_TIER)]
    assert plan_tiered_merges(small) == []
    # below-floor eager behavior unchanged
    tiny = [{"part": i, "bytes": FLOOR_BYTES // 4} for i in range(4)]
    assert plan_tiered_merges(tiny) == [[0, 1, 2, 3]]


def test_percolate_matches_forward_search(ray_session, tmp_path_factory):
    """Reverse search agrees with forward search: the set of docs a bank
    query percolates equals that query's exhaustive hit set on an index."""
    import ray.data as rd

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.ops.percolate import percolate
    from elasticsearch_ray.search.dsl import parse_dsl
    from elasticsearch_ray.search.engine import QueryEngine

    sf = "/root/testdata/sf0.001"
    bank = [
        ("spark", {"match": {"text": "spark"}}),
        ("and2", {"match": {"text": {"query": "merge sort", "operator": "and"}}}),
        ("phrase", {"match_phrase": {"text": "spark join"}}),
        ("near", {"span_near": {"clauses": [{"span_term": {"text": "merge"}},
                                            {"span_term": {"text": "sort"}}],
                                "slop": 2, "in_order": True}}),
        ("notq", {"bool": {"must_not": [{"match": {"text": "spark"}}]}}),
        ("pfx", {"prefix": {"text": "spar"}}),
    ]
    perc = percolate(rd.read_parquet(f"{sf}/documents.parquet"), bank).to_pandas()
    got = {name: set(g["doc_id"]) for name, g in perc.groupby("query_name")}

    idx = str(tmp_path_factory.mktemp("percidx") / "index")
    build_index(sf, idx, IndexSpec(use_html=False, text_column="text",
                                   doc_columns=("lang",)), concurrency=2,
                file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    for name, dsl in bank:
        fwd = eng.search(parse_dsl(dsl), k=10**9, mode="exhaustive",
                         fetch=("doc_id",))
        assert got.get(name, set()) == set(fwd["doc_id"].to_pylist()), name


def test_update_by_query_rejects_reshaping_and_handles_added_columns(
        ray_session, tmp_path_factory):
    import pyarrow.dataset as pads
    import pytest as _pt

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.pipelines.reindex import delete_by_query, update_by_query
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import MatchQuery

    sf = "/root/testdata/sf0.001"
    base = tmp_path_factory.mktemp("ubq")
    idx = str(base / "idx")
    build_index(sf, idx, IndexSpec(use_html=False, text_column="text",
                                   doc_columns=("lang",)), concurrency=2,
                file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    # a row-dropping processor must be rejected, not silently NaN-spliced
    with _pt.raises(Exception):
        update_by_query(eng, str(base / "bad"), MatchQuery("spark"),
                        [{"drop": {"where": lambda df: df["lang"] == "en"}}])
    # a field-ADDING processor extends the schema for all rows
    dst = str(base / "add")
    update_by_query(eng, dst, MatchQuery("spark"),
                    [{"set": {"field": "flag", "value": "hit"}}])
    out = pads.dataset(dst).to_table().to_pandas()
    import pyarrow.parquet as _pq

    # every output file carries the SAME unified schema (processor-added
    # columns null-filled in files whose slice had no matches)
    import glob as _glob

    schemas = [_pq.read_schema(p) for p in sorted(_glob.glob(f"{dst}/*.parquet"))]
    assert all(s.equals(schemas[0]) for s in schemas)
    assert "flag" in schemas[0].names
    # multi-file divergence is exercised directly: a file written WITHOUT
    # the processor-added column gets it null-filled in union order
    import pyarrow as _pa

    div = base / "div"
    div.mkdir()
    _pq.write_table(_pa.table({"a": [1, 2], "flag": ["x", "y"]}), div / "f1.parquet")
    _pq.write_table(_pa.table({"a": [3]}), div / "f2.parquet")
    from elasticsearch_ray.pipelines.reindex import _unify_output_schema

    _unify_output_schema(str(div))
    s1, s2 = (_pq.read_schema(div / f) for f in ("f1.parquet", "f2.parquet"))
    assert s1.equals(s2)
    t2 = _pq.read_table(div / "f2.parquet")
    assert t2["flag"].null_count == 1

    texts = _pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    has = {d for d, t in zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist())
           if "spark" in t.split()}
    for _, r in out.iterrows():
        assert (r["flag"] == "hit") == (r["doc_id"] in has)
    # rerunning into the same dst does not accumulate stale files
    n1 = len(out)
    delete_by_query(eng, dst, MatchQuery("spark"))
    out2 = pads.dataset(dst).to_table().to_pandas()
    assert len(out2) == n1 - len(has)


def test_dissect_modifiers():
    """DissectParser key modifiers: named skip, right padding, append."""
    import pandas as pd

    from elasticsearch_ray.ops.processors import DissectProcessor

    d = DissectProcessor("msg", "%{a->} %{?skip} [%{rest}]")
    df = d(pd.DataFrame({"msg": ["web01    prod [ERRORHIGH]"]}))
    assert df["a"][0] == "web01" and df["rest"][0] == "ERRORHIGH"
    assert "skip" not in df.columns and "?skip" not in df.columns
    d2 = DissectProcessor("msg", "%{+who} said %{+who}", append_separator=" ")
    df2 = d2(pd.DataFrame({"msg": ["alice said hi"]}))
    assert df2["who"][0] == "alice hi"
    d3 = DissectProcessor("msg", "%{host->} %{level}")
    df3 = d3(pd.DataFrame({"msg": ["web01        INFO"]}))
    assert df3["host"][0] == "web01" and df3["level"][0] == "INFO"
    d4 = DissectProcessor("msg", "%{} %{keep}")
    df4 = d4(pd.DataFrame({"msg": ["drop this"]}))
    assert df4["keep"][0] == "this"


def test_knn_dsl_search(ray_session):
    """knn DSL clause (KnnVectorQueryBuilder): parse-time validation, exact
    brute route when num_candidates covers the table, HNSW route otherwise,
    similarity floor, and the (1+cos)/2 score mapping."""
    import numpy as np
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    from elasticsearch_ray.ops.ann import brute_topk
    from elasticsearch_ray.ops.hnsw import knn_search
    from elasticsearch_ray.search.dsl import DslError, parse_dsl

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in t["embedding"][0].as_py()]

    # parse-time validation (mirrors the reference's parser errors)
    with pytest.raises(DslError):
        parse_dsl({"knn": {"field": "embedding"}})
    with pytest.raises(DslError):
        parse_dsl({"knn": {"field": "embedding", "query_vector": []}})
    with pytest.raises(DslError):
        parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                           "k": 10, "num_candidates": 3}})

    q = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                           "k": 5, "num_candidates": 10_000, "boost": 2.0}})
    out = knn_search(rd.from_arrow(t), q)
    # brute route: must equal the exact baseline with the ES score mapping
    exact = brute_topk(rd.from_arrow(t), [0], np.asarray([qv]), k=5)
    assert out["vec_id"].tolist() == exact["neighbor_id"].tolist()
    np.testing.assert_allclose(
        out["_score"].to_numpy(),
        2.0 * (1 + exact["cosine"].to_numpy()) / 2, rtol=1e-9)
    # self-match scores boost*(1+1)/2 = boost
    assert abs(out["_score"].iloc[0] - 2.0) < 1e-6

    # similarity floor drops below-threshold hits
    thresh = float(exact["cosine"].iloc[2])
    q2 = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                            "k": 5, "num_candidates": 10_000,
                            "similarity": thresh}})
    out2 = knn_search(rd.from_arrow(t), q2)
    assert len(out2) == 3

    # HNSW route (num_candidates < table size): same top-1, k rows
    q3 = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                            "k": 5, "num_candidates": 50}})
    out3 = knn_search(rd.from_arrow(t), q3)
    assert len(out3) == 5 and out3["vec_id"].iloc[0] == out["vec_id"].iloc[0]


def test_training_pipeline_decontaminate(ray_session, tmp_path):
    """decontaminate_benchmark drops eval-overlapping docs between dedup and
    indexing; counts and the built index reflect the smaller corpus."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.training_data import training_data_pipeline

    secret = " ".join(f"benchtok{i}" for i in range(8))
    rows = []
    for k in range(24):
        words = " ".join(f"doc{k}tok{i}" for i in range(30))
        # plant the benchmark 8-gram inside every 6th doc
        body = words + (" " + secret if k % 6 == 0 else "")
        rows.append({"url": f"https://dc.example.com/{k}",
                     "warc_ts": pd.Timestamp("2024-02-01"),
                     "html": f"<html><body><p>{body}</p></body></html>",
                     "lang": "en"})
    corpus = tmp_path / "dccorpus"
    corpus.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
                   corpus / "pages-00000.parquet")

    out = training_data_pipeline(str(corpus), str(tmp_path / "td"),
                                 min_tokens=10,
                                 decontaminate_benchmark=[secret],
                                 decontaminate_ngram=8)
    assert out["after_dedup"] == 24
    assert out["after_decontaminate"] == 20  # 4 planted docs dropped


def test_ivfpq_full_probe_equals_brute(rds):
    """IVF-PQ (Jégou et al. IVFADC) with nprobe=ncells and rerank >=
    corpus: the exact rerank pass sees every vector, so the result is
    bit-equal to brute_topk (the oracle configuration)."""
    from elasticsearch_ray.ops.ann import brute_topk, ivfpq_topk

    t = pq.read_table(f"{SF}/embeddings.parquet")
    qids = t["vec_id"].to_numpy()[:4].tolist()
    qm = np.stack([np.asarray(v, np.float64)
                   for v in t["embedding"].to_pylist()[:4]])
    exact = brute_topk(rds["embeddings"], qids, qm, k=5)
    full = ivfpq_topk(rds["embeddings"], qids, qm, k=5, ncells=8,
                      nprobe=8, rerank=10**9)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), full.reset_index(drop=True))


def test_ivfpq_recall_vs_brute(rds):
    from elasticsearch_ray.ops.ann import brute_topk, ivfpq_topk

    t = pq.read_table(f"{SF}/embeddings.parquet")
    qids = t["vec_id"].to_numpy()[:5].tolist()
    qm = np.stack([np.asarray(v, np.float64)
                   for v in t["embedding"].to_pylist()[:5]])
    exact = brute_topk(rds["embeddings"], qids, qm, k=10)
    approx = ivfpq_topk(rds["embeddings"], qids, qm, k=10, ncells=8,
                        nprobe=5, rerank=128)
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    # candidates come from 5/8 cells; survivors are exact-reranked
    assert np.mean(recalls) >= 0.5


def test_ivfpq_dim_must_divide_m(rds):
    from elasticsearch_ray.ops.ann import ivfpq_topk

    t = pq.read_table(f"{SF}/embeddings.parquet")
    qm = np.stack([np.asarray(t["embedding"].to_pylist()[0], np.float64)])
    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_topk(rds["embeddings"], [0], qm, m=7)


def test_png_round_trip_all_channel_counts():
    """PNG codec (public spec, stdlib zlib): encode->decode identity for
    gray/RGB/RGBA, and the decode_image dispatch returns (1,h,w,c)."""
    from elasticsearch_ray.ops.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(3)
    for c in (1, 3, 4):
        a = rng.randint(0, 256, (13, 17, c), dtype=np.uint8)
        payload = encode_png(a[:, :, 0] if c == 1 else a)
        got = decode_png(payload)
        assert got.shape == (13, 17, c)
        assert np.array_equal(got, a)
        via = decode_image(payload)
        assert via.shape == (1, 13, 17, c)
        assert np.array_equal(via[0], a)


def _png_forward_filter(a: np.ndarray, ftype: int) -> bytes:
    """Independent forward filter per PNG spec §9 (test-side only)."""
    h, w, c = a.shape
    stride = w * c
    flat = a.reshape(h, stride).astype(np.int64)
    out = bytearray()
    for y in range(h):
        out.append(ftype)
        prior = flat[y - 1] if y else np.zeros(stride, np.int64)
        for x in range(stride):
            left = flat[y, x - c] if x >= c else 0
            ul = prior[x - c] if x >= c else 0
            up = prior[x]
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else \
                    (up if pb <= pc else ul)
            out.append((int(flat[y, x]) - pred) % 256)
    return bytes(out)


def test_png_decodes_every_scanline_filter():
    """Each of the five filters, forward-applied by an independent
    test-side encoder, unfilters back to the pixels."""
    import struct
    import zlib

    from elasticsearch_ray.ops.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    rng = np.random.RandomState(9)
    a = rng.randint(0, 256, (6, 7, 3), dtype=np.uint8)
    for ftype in range(5):
        ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 2, 0, 0, 0)
        raw = _png_forward_filter(a, ftype)
        payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                   + _png_chunk(b"IDAT", zlib.compress(raw))
                   + _png_chunk(b"IEND", b""))
        assert np.array_equal(decode_png(payload), a), ftype


def test_png_palette_and_rejections():
    import struct
    import zlib

    import pytest as _pytest

    from elasticsearch_ray.ops.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    # palette (color type 3): indices expand through PLTE
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"PLTE", plte.tobytes())
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
    got = decode_png(payload)
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got, plte[idx])
    # 16-bit depth and Adam7 interlace reject like missing features
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    p16 = (_PNG_SIG + _png_chunk(b"IHDR", ihdr16)
           + _png_chunk(b"IDAT", zlib.compress(b"")) + _png_chunk(b"IEND", b""))
    with _pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(p16)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    p_i = (_PNG_SIG + _png_chunk(b"IHDR", ihdr_i)
           + _png_chunk(b"IDAT", zlib.compress(b"")) + _png_chunk(b"IEND", b""))
    with _pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(p_i)
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    with _pytest.raises(ValueError, match="channels"):
        encode_png(np.zeros((2, 2, 2), np.uint8))


def test_png_through_media_pipeline(ray_session):
    """PNG payloads flow through the decode->resize->embed actor stages
    like the uncompressed codecs (the multimodal plumbing contract)."""
    import pyarrow as _pa
    import ray

    from elasticsearch_ray.ops.multimodal import encode_png, media_pipeline

    rng = np.random.RandomState(4)
    rows = []
    for i in range(8):
        h, w = int(rng.randint(8, 20)), int(rng.randint(8, 20))
        a = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append({"media_id": i, "mime": "image/png", "width": w,
                     "height": h, "n_frames": 1,
                     "payload": encode_png(a)})
    t = _pa.Table.from_pylist(rows)
    out = media_pipeline(ray.data.from_arrow(t), out_h=8, out_w=8,
                         dim=8).to_pandas()
    assert len(out) == 8
    assert all(len(e) == 8 for e in out["embedding"])


def test_gif_round_trip_and_animation():
    from elasticsearch_ray.ops.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.RandomState(12)
    # paletted content: few distinct colors
    colors = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.randint(0, 7, (3, 9, 11))
    frames = colors[idx]  # (3, 9, 11, 3)
    payload = encode_gif(frames)
    got = decode_gif(payload)
    assert got.shape == (3, 9, 11, 3)
    assert np.array_equal(got, frames)
    via = decode_image(payload)
    assert np.array_equal(via, frames)
    # single frame, 2 colors (1-bit palette path)
    two = np.where(np.arange(8)[:, None, None] % 2 == 0,
                   np.uint8(255), np.uint8(0)) * np.ones((8, 5, 3),
                                                         np.uint8)
    assert np.array_equal(decode_gif(encode_gif(two))[0], two)


def test_gif_lzw_independent_vector_and_kwkwk():
    """Hand-packed LZW stream (spec appendix F): CLEAR, literal 1, then
    code==len(table) (the KwKwK special case), EOI — pixels [1,1,1]."""
    import struct

    from elasticsearch_ray.ops.multimodal import _lzw_decode, decode_gif

    # 3-bit codes LSB-first: 4(clear), 1, 6(KwKwK), 5(eoi)
    packed = 4 | (1 << 3) | (6 << 6) | (5 << 9)
    stream = bytes([packed & 0xFF, (packed >> 8) & 0xFF])
    assert _lzw_decode(stream, 2, 3) == [1, 1, 1]
    # wrap it into a full 3x1 GIF with a 4-color palette
    pal = bytes([0, 0, 0, 10, 20, 30, 0, 0, 0, 0, 0, 0])
    gif = (b"GIF89a" + struct.pack("<HHBBB", 3, 1, 0x81, 0, 0) + pal
           + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
           + bytes([2, len(stream)]) + stream + b"\x00\x3b")
    got = decode_gif(gif)
    assert got.shape == (1, 1, 3, 3)
    assert np.array_equal(got[0, 0], np.array([[10, 20, 30]] * 3))


def test_gif_rejections():
    import struct

    import pytest as _pytest

    from elasticsearch_ray.ops.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(1)
    with _pytest.raises(ValueError, match="256 distinct"):
        encode_gif(rng.randint(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG....")
    pal = bytes(6)
    interlaced = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
                  + pal + b"\x2c"
                  + struct.pack("<HHHHB", 0, 0, 2, 2, 0x40))
    with _pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(interlaced)


def test_gif_through_frame_sampling(ray_session):
    """Animated GIF payloads drive the real video path: decode ->
    frame-sample inside the media actor pipeline."""
    import pyarrow as _pa
    import ray

    from elasticsearch_ray.ops.multimodal import encode_gif, media_pipeline

    rng = np.random.RandomState(8)
    colors = rng.randint(0, 256, (5, 3), dtype=np.uint8)
    rows = []
    for i in range(6):
        f = int(rng.randint(2, 6))
        frames = colors[rng.randint(0, 5, (f, 10, 12))]
        rows.append({"media_id": i, "mime": "image/gif", "width": 12,
                     "height": 10, "n_frames": f,
                     "payload": encode_gif(frames)})
    t = _pa.Table.from_pylist(rows)
    out = media_pipeline(ray.data.from_arrow(t), out_h=6, out_w=6,
                         dim=8).to_pandas()
    assert len(out) == 6
    assert all(len(e) == 8 for e in out["embedding"])


def test_brute_topk_similarity_family(ray_session):
    """DenseVectorFieldMapper.VectorSimilarity: l2_norm and dot_product
    with the Lucene score mappings, vs a numpy reference."""
    import ray.data as rd

    from elasticsearch_ray.ops.ann import brute_topk

    rng = np.random.RandomState(2)
    vecs = rng.normal(size=(60, 8))
    df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    ds = rd.from_pandas(df).repartition(3)
    qm = vecs[:2]
    out = brute_topk(ds, [0, 1], qm, k=5, similarity="l2_norm")
    assert "similarity" in out.columns
    for qi in (0, 1):
        d2 = ((vecs - qm[qi]) ** 2).sum(axis=1)
        want = np.sort(1.0 / (1.0 + d2))[::-1][:5].round(6)
        got = out[out["query_id"] == qi]["similarity"].to_numpy()
        assert np.allclose(got, want)
        assert got[0] == 1.0  # the query itself at distance 0
    # dot_product over unit vectors: score = (1 + dot)/2
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    df2 = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                        "embedding": [v.tolist() for v in unit]})
    out2 = brute_topk(rd.from_pandas(df2), [0], unit[:1], k=5,
                      similarity="dot_product")
    want = np.sort((1.0 + unit @ unit[0]) / 2.0)[::-1][:5].round(6)
    assert np.allclose(out2["similarity"].to_numpy(), want)
    with pytest.raises(ValueError, match="unknown similarity"):
        brute_topk(ds, [0], qm[:1], k=2, similarity="manhattan")
    # cosine path unchanged (column name kept)
    out3 = brute_topk(ds, [0], qm[:1], k=3)
    assert "cosine" in out3.columns


def test_tiff_round_trip_and_packbits():
    import struct

    from elasticsearch_ray.ops.multimodal import (
        _packbits_decode,
        _packbits_encode,
        decode_image,
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(5)
    # PackBits property: exact round trip on runs-heavy byte streams
    for _ in range(50):
        n = int(rng.integers(0, 300))
        data = bytes(rng.choice([0, 9, 255],
                                size=n, p=[.5, .3, .2]).astype(np.uint8))
        assert _packbits_decode(_packbits_encode(data), n) == data

    for c in (1, 3):
        for comp in (1, 32773):
            img = rng.integers(0, 256, size=(19, 13, c)).astype(np.uint8)
            src = img if c == 3 else img[:, :, 0]
            payload = encode_tiff(src, compression=comp, rows_per_strip=5)
            assert payload[:4] == b"II*\x00"
            back = decode_tiff(payload)
            assert back.shape == (19, 13, c)
            assert (back == img).all()
            # dispatching decoder sees it too
            frames = decode_image(payload)
            assert frames.shape == (1, 19, 13, c)

    # big-endian (MM) single-strip grayscale fixture built by hand
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = img.tobytes()

    def e(tag, typ, count, val):
        if typ == 3:
            return struct.pack(">HHIHH", tag, typ, count, val, 0)
        return struct.pack(">HHII", tag, typ, count, val)

    entries = [e(256, 3, 1, 4), e(257, 3, 1, 3), e(258, 3, 1, 8),
               e(259, 3, 1, 1), e(262, 3, 1, 1), e(273, 4, 1, 8),
               e(277, 3, 1, 1), e(278, 3, 1, 3), e(279, 4, 1, len(raw))]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) \
        + struct.pack(">I", 0)
    payload = struct.pack(">2sHI", b"MM", 42, 8 + len(raw)) + raw + ifd
    back = decode_tiff(payload)
    assert (back[:, :, 0] == img).all()


def test_tiff_media_pipeline(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.multimodal import (
        media_pipeline,
        synthesize_tiff_media,
    )

    tbl = synthesize_tiff_media(8, seed=3)
    out = media_pipeline(rd.from_arrow(tbl), out_h=8, out_w=8,
                         dim=8).to_pandas()
    assert len(out) == 8
    assert all(len(e) == 8 for e in out["embedding"])


# ----------------------------------------------------------- SemDeDup

def _planted_vectors(rng, n_random=120, dim=16):
    """Random unit-ish vectors plus two planted duplicate groups."""
    import numpy as np
    base = rng.normal(size=(n_random, dim))
    g1 = np.tile(base[3], (3, 1))                      # exact dups of #3
    g2 = np.tile(base[7], (4, 1)) + rng.normal(
        scale=1e-3, size=(4, dim))                     # near dups of #7
    return np.concatenate([base, g1, g2])


def test_semdedup_one_survivor_per_group(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.dedup import semdedup

    rng = np.random.default_rng(5)
    vecs = _planted_vectors(rng)
    n = len(vecs)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in vecs]}))
    out = semdedup(ds, eps=0.02, ncells=4, sample_n=n, seed=3)
    # group 1: ids {3, 120, 121, 122} identical -> 3 drops, kept is the
    # group member that sorts first (same centroid cosine, min id)
    g1 = {3, 120, 121, 122}
    d1 = out[out["drop_id"].isin(g1)]
    assert len(d1) == 3
    assert set(d1["kept_id"]) == {3}
    assert (d1["cosine"] > 0.999).all()
    # group 2: ids {7, 123..126} near-identical -> 4 drops, one kept
    g2 = {7, 123, 124, 125, 126}
    d2 = out[out["drop_id"].isin(g2)]
    assert len(d2) == 4
    assert len(set(g2) - set(d2["drop_id"])) == 1
    assert set(d2["kept_id"]).issubset(g2)
    # no random vector was dropped at this tight epsilon
    assert set(out["drop_id"]).issubset(g1 | g2)


def test_semdedup_eps_monotone_and_cap(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.ops.dedup import semdedup

    rng = np.random.default_rng(9)
    vecs = _planted_vectors(rng)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [list(map(float, v)) for v in vecs]}))
    tight = semdedup(ds, eps=0.02, ncells=4, sample_n=len(vecs))
    loose = semdedup(ds, eps=0.5, ncells=4, sample_n=len(vecs))
    assert len(loose) >= len(tight)
    # chunked sweep still kills within-chunk duplicates
    capped = semdedup(ds, eps=0.02, ncells=1, sample_n=len(vecs),
                      cluster_cap=2000)
    assert set(tight["drop_id"]) == set(capped["drop_id"])


def test_training_pipeline_blocklist_and_compression(ray_session, tmp_path):
    """The curation knobs: domain blocklist drops all of a blocked
    eTLD+1's subdomain pages; compression bounds drop templated spam —
    both inside the one streaming flow."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.training_data import (
        training_data_pipeline,
    )

    words = ("spark join merge sort hash table scan filter group "
             "window order").split()
    rows = []
    for i in range(40):
        body = " ".join(words[j % len(words)] for j in range(i, i + 30))
        host = "blocked.example.com" if i % 4 == 0 else "ok.org"
        text = ("lorem " * 200) if i % 5 == 0 and i % 4 != 0 else body
        rows.append({
            "url": f"https://sub{i}.{host}/p{i}",
            "warc_ts": "2024-01-01T00:00:00Z",
            "html": f"<html><body><p>{text} u{i}</p></body></html>",
            "lang": "en",
        })
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(corpus / "pages-000.parquet"))
    out = training_data_pipeline(
        str(corpus), str(tmp_path / "td"), min_tokens=5,
        blocked_domains={"example.com"},
        compression_bounds=(0.08, 0.9))
    assert out["input_pages"] == 40
    # 10 blocked-domain pages + the repetitive-spam pages are gone
    clean = pq.read_table(str(tmp_path / "td" / "clean")).to_pandas()
    assert not clean["url"].str.contains("example.com").any()
    assert out["after_quality"] < 30
    assert (clean["text"].str.count("lorem") < 50).all()
