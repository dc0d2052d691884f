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
