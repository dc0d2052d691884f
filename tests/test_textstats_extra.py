"""Extra text-stats ops (compression-ratio quality signal)."""

import numpy as np
import pandas as pd
def test_compression_ratio_signal(ray_session):
    """zlib ratio: repetitive text << prose << random noise; empty = 0."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    noise = "".join(chr(c) for c in rng.integers(33, 1100, 4000))
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["spam " * 800,
                 ("the quick brown fox jumps over the lazy dog and then "
                  "discusses compression behaviour at length ") * 20,
                 noise,
                 ""],
    })
    from elasticsearch_ray.ops.textstats import (
        add_compression_ratio,
        compression_filter,
    )

    out = (add_compression_ratio(rd.from_pandas(docs))
           .to_pandas().sort_values("doc_id", ignore_index=True))
    r = out["compression_ratio"]
    assert r[0] < r[1] < r[2]
    assert r[0] < 0.05 and r[2] > 0.5
    assert r[3] == 0.0
    kept = (compression_filter(rd.from_pandas(docs), 0.05, 0.5)
            .to_pandas())
    assert kept["doc_id"].tolist() == [1]
    assert "_zratio" not in kept.columns


def test_url_blocklist_filter_modes(ray_session):
    """UT1/Dolma-style URL blocklist: registered-domain mode blocks
    subdomains; host mode is exact."""
    import ray.data as rd

    from elasticsearch_ray.ops.llm_prep import (
        url_blocklist_filter,
        url_host,
    )

    docs = pd.DataFrame({
        "doc_id": range(6),
        "url": [
            "https://spam.example.com/page",
            "http://user@sub.deep.spam.example.com:8080/x?q=1",
            "https://good.org/a",
            "HTTPS://GOOD.ORG/b",
            "https://shop.co.uk/x",
            "ftp://spam.example.com.evil.net/y",
        ],
    })
    assert url_host(docs["url"]).tolist() == [
        "spam.example.com", "sub.deep.spam.example.com", "good.org",
        "good.org", "shop.co.uk", "spam.example.com.evil.net"]
    out = (url_blocklist_filter(rd.from_pandas(docs), "url",
                                {"example.com"})
           .to_pandas())
    # both example.com subdomains blocked; the evil.net lookalike is NOT
    assert out["doc_id"].tolist() == [2, 3, 4, 5]
    out2 = (url_blocklist_filter(rd.from_pandas(docs), "url",
                                 {"spam.example.com"}, mode="host")
            .to_pandas())
    assert out2["doc_id"].tolist() == [1, 2, 3, 4, 5]
    # PSL two-label suffix: shop.co.uk IS the registered domain
    out3 = (url_blocklist_filter(rd.from_pandas(docs), "url",
                                 {"shop.co.uk"})
            .to_pandas())
    assert 4 not in out3["doc_id"].tolist()
    import pytest as _pt

    with _pt.raises(ValueError):
        url_blocklist_filter(rd.from_pandas(docs), "url", set(),
                             mode="nope")
