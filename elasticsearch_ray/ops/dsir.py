"""DSIR — Data Selection via Importance Resampling (Xie et al.,
arXiv 2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a small TARGET corpus, by importance weights

    log w(x) = Σ_f c_f(x) · (log p_target[f] − log p_raw[f])

over unigram(+bigram) features, then take the Gumbel-top-k (sampling
without replacement ∝ w) or the deterministic top-k.

Distribution shape (Ray-Data-first):
- FIT: one ``map_batches`` pass per corpus emitting sparse per-batch
  (feature, count) partials (bounded by the bucket count, never the
  token count), combined on the driver into two fixed-size count
  vectors — the classic map-side-combine reduce.
- SCORE: the λ = log p_t − log p_r vector is broadcast ONCE via
  ``ray.put``; each batch hashes its tokens vectorized
  (``pd.util.hash_array`` + polynomial bigram combine, stable across
  workers) and segment-sums λ per doc with ``np.add.reduceat`` — no
  per-row Python.
- SELECT: scores stream; only the top-k (id, weight) frame reaches the
  driver.

``buckets=None`` is the exact-word mode (features are the tokens
themselves — used by the SQL oracle); production scale uses hashed
buckets (the paper's 10⁴ hash dimension).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

_C = np.uint64(0x9E3779B97F4A7C15)


def _token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All tokens of a batch → (uint64 hashes, per-doc lengths)."""
    toks = texts.fillna("").str.split()
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    flat = [t for doc in toks for t in (doc or [])]
    if not flat:
        return np.empty(0, np.uint64), lens
    return pd.util.hash_array(np.asarray(flat, dtype=object)), lens


def _features(texts: pd.Series, buckets: int | None,
              bigrams: bool) -> tuple[np.ndarray, np.ndarray, list | None]:
    """→ (feature ids per occurrence — doc-CONTIGUOUS, per-doc feature
    counts, word list or None). Per-doc contiguity is what lets scoring
    segment-sum with ``np.add.reduceat``. Hashed mode returns bucket
    ids; word mode returns indices into the returned word list
    (batch-local)."""
    toks = texts.fillna("").str.split()
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    glens = lens + (np.maximum(lens - 1, 0) if bigrams else 0)
    if buckets is None:
        grams: list = []
        for doc in toks:
            doc = doc or []
            grams.extend(doc)
            if bigrams and len(doc) > 1:
                grams.extend(f"{a} {b}" for a, b in zip(doc, doc[1:]))
        if not grams:
            return np.empty(0, np.int64), glens, []
        words, inv = np.unique(np.asarray(grams, dtype=object),
                               return_inverse=True)
        return inv.astype(np.int64), glens, list(words)
    h, _lens = _token_hashes(texts)
    if len(h) == 0:
        return np.empty(0, np.int64), glens, None
    b = np.uint64(buckets)
    out = np.empty(int(glens.sum()), np.uint64)
    pos = opos = 0
    for n in lens.tolist():
        hn = h[pos:pos + n]
        out[opos:opos + n] = hn % b
        opos += n
        if bigrams and n > 1:
            out[opos:opos + n - 1] = (hn[:-1] * _C + hn[1:]) % b
            opos += n - 1
        pos += n
    return out.astype(np.int64), glens, None


def fit_feature_counts(ds: Dataset, text_col: str,
                       buckets: int | None = None,
                       bigrams: bool = False) -> tuple[dict, int]:
    """Corpus feature counts: {feature: count}, total. Sparse per-batch
    partials (np.unique), driver combine."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, _glens, words = _features(df[text_col], buckets, bigrams)
        if len(ids) == 0:
            return pd.DataFrame({"f": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        uniq, counts = np.unique(ids, return_counts=True)
        keys = [words[i] for i in uniq] if words is not None else uniq
        return pd.DataFrame({"f": pd.Series(keys, dtype=object),
                             "n": counts.astype(np.int64)})

    part = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if part.empty:
        return {}, 0
    agg = part.groupby("f")["n"].sum()
    return agg.to_dict(), int(agg.sum())


def dsir_lambda(raw_counts: tuple, target_counts: tuple,
                smoothing: float = 1.0) -> dict:
    """λ[f] = log p_target[f] − log p_raw[f] with add-α smoothing over
    the UNION feature space (absent features count 0 + α)."""
    rc, rtot = raw_counts
    tc, ttot = target_counts
    feats = set(rc) | set(tc)
    dim = len(feats)
    lam = {}
    for f in feats:
        pt = (tc.get(f, 0) + smoothing) / (ttot + smoothing * dim)
        pr = (rc.get(f, 0) + smoothing) / (rtot + smoothing * dim)
        lam[f] = np.log(pt) - np.log(pr)
    return lam


def dsir_log_weights(raw_ds: Dataset, target_ds: Dataset, text_col: str,
                     id_col: str, buckets: int | None = None,
                     bigrams: bool = False,
                     smoothing: float = 1.0) -> Dataset:
    """→ Dataset of (id, logw). Fits both corpora, broadcasts λ once,
    scores every raw doc with a vectorized segment sum."""
    import ray

    lam = dsir_lambda(
        fit_feature_counts(raw_ds, text_col, buckets, bigrams),
        fit_feature_counts(target_ds, text_col, buckets, bigrams),
        smoothing)
    if buckets is not None:
        vec = np.zeros(buckets)
        for f, v in lam.items():
            vec[int(f)] = v
        ref = ray.put(("dense", vec))
    else:
        keys = np.array(sorted(lam), dtype=object)
        vals = np.array([lam[k] for k in keys])
        ref = ray.put(("sparse", keys, vals))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        model = ray.get(ref)
        ids, glens, words = _features(df[text_col], buckets, bigrams)
        if model[0] == "dense":
            contrib = model[1][ids] if len(ids) else np.empty(0)
        else:
            _kind, keys, vals = model
            if words is not None:
                wa = np.asarray(words, dtype=object)
                pos = np.searchsorted(keys, wa)
                ok = (pos < len(keys)) & (keys[np.clip(pos, 0,
                                                       len(keys) - 1)] == wa)
                wl = np.where(ok, vals[np.clip(pos, 0, len(keys) - 1)], 0.0)
                contrib = wl[ids] if len(ids) else np.empty(0)
            else:
                contrib = np.empty(0)
        offs = np.zeros(len(df), np.int64)
        np.cumsum(glens[:-1], out=offs[1:])
        logw = np.zeros(len(df))
        nz = glens > 0
        if contrib.size:
            sums = np.add.reduceat(contrib, offs[nz]) if nz.any() else \
                np.empty(0)
            logw[nz] = sums
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "logw": logw})

    return raw_ds.map_batches(score, batch_format="pandas")


def dsir_select(raw_ds: Dataset, target_ds: Dataset, text_col: str,
                id_col: str, k: int, buckets: int | None = None,
                bigrams: bool = False, smoothing: float = 1.0,
                gumbel_seed: int | None = None) -> pd.DataFrame:
    """Top-k selection. ``gumbel_seed=None`` → deterministic top-k by
    (round(logw, 9) desc, id); a seed → the paper's Gumbel-top-k
    (sampling without replacement ∝ w), with the noise derived from a
    STABLE per-id hash so the draw is reproducible across workers."""
    w = dsir_log_weights(raw_ds, target_ds, text_col, id_col, buckets,
                         bigrams, smoothing)

    if gumbel_seed is not None:
        seed = np.uint64(gumbel_seed)

        def noise(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_array(
                df[id_col].to_numpy(np.uint64) * _C + seed)
            u = (h.astype(np.float64) + 0.5) / 2.0 ** 64
            df = df.copy()
            df["logw"] = df["logw"] - np.log(-np.log(u))
            return df

        w = w.map_batches(noise, batch_format="pandas")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch pre-cut: only ≤ k rows per block reach the driver
        df = df.copy()
        df["_key"] = df["logw"].round(9)
        return (df.sort_values(["_key", id_col],
                               ascending=[False, True]).head(k))

    out = w.map_batches(local_topk, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "logw": pd.Series(dtype=float)})
    out = (out.sort_values(["_key", id_col], ascending=[False, True])
           .head(k).drop(columns="_key").reset_index(drop=True))
    return out
