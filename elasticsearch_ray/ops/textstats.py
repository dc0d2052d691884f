"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID, document fingerprinting. All vectorized
map_batches stages over the documents/webpages text column."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from elasticsearch_ray.analysis.stopwords import ENGLISH_STOP_WORDS


class TextQuality:
    """Per-doc quality features: token count, mean token length, stopword
    ratio, unique-token ratio. Heuristics in the C4/Gopher-rule family."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.stop = ENGLISH_STOP_WORDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        tok_n = np.zeros(n, np.int64)
        mean_len = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        uniq_ratio = np.zeros(n, np.float64)
        texts = batch[self.text_col].to_pylist()
        toks_per_doc = [(t or "").split() for t in texts]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        tok_n[:] = lens
        nz = np.flatnonzero(lens > 0)
        if len(nz):
            # one flat token array; everything else is C-vectorized:
            # char lengths via fromiter, stopword membership via isin,
            # per-doc uniques via duplicated() on (doc, token)
            total = int(lens.sum())
            flat = np.empty(total, dtype=object)
            pos = 0
            for t in toks_per_doc:
                flat[pos : pos + len(t)] = t
                pos += len(t)
            doc_rep = np.repeat(np.arange(n), lens)
            starts = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            char_lens = np.fromiter(map(len, flat), dtype=np.int64, count=total)
            s = pd.Series(flat)
            is_stop = s.isin(self.stop).to_numpy()
            dup = pd.DataFrame({"d": doc_rep, "t": flat}).duplicated().to_numpy()
            mean_len[nz] = np.add.reduceat(char_lens, starts) / lens[nz]
            stop_ratio[nz] = np.add.reduceat(is_stop.astype(np.int64), starts) / lens[nz]
            uniq = lens[nz] - np.add.reduceat(dup.astype(np.int64), starts)
            uniq_ratio[nz] = uniq / lens[nz]
        # raw float64 — presentation rounding is the consumer's concern
        # (oracle-compared entries floor-truncate; see __ray_entry__)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(tok_n),
                "mean_token_len": pa.array(mean_len),
                "stopword_ratio": pa.array(stop_ratio),
                "unique_ratio": pa.array(uniq_ratio),
            }
        )


def text_quality(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    out = ds.map_batches(
        TextQuality, fn_constructor_args=(text_col, id_col), batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


# GPT-2 pretokenizer pattern (Radford et al. 2019, public gpt-2 repo
# encoder.py), restricted to RE2: the original's final "\s+(?!\S)"
# lookahead branch is dropped (RE2 has no lookahead), so a whitespace
# run counts as ONE token instead of splitting its last space off.
# RE2 on both sides -> pyarrow count_substring_regex and DuckDB
# regexp_extract_all agree exactly.
BPE_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_count(ds: Dataset, text_col: str = "text",
                    id_col: str = "doc_id",
                    pattern: str = BPE_SPLIT_PATTERN) -> Dataset:
    """Per-doc BPE-ish token count: the GPT-2 pretokenizer split (the
    public proxy for subword token budgets — contractions, unicode
    letter/number runs, punctuation clusters each count once). One
    vectorized RE2 pass per batch; stays a lazy Dataset."""
    def count(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(batch[text_col], pattern)
        return pa.table({id_col: batch[id_col],
                         "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow")


def token_count_by(ds: Dataset, group_col: str, text_col: str = "text") -> pd.DataFrame:
    """Total whitespace-token count per group (partial counts per batch →
    tiny groupby — the pre-aggregate pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.count_substring_regex(batch[text_col], r"\S+")
        df = pd.DataFrame({group_col: batch[group_col].to_pylist(),
                           "n": toks.to_numpy(zero_copy_only=False)})
        agg = df.groupby(group_col, as_index=False)["n"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n_tokens"))
        .to_pandas()
    )
    return out.sort_values(group_col).reset_index(drop=True)


class NgramLangProfiles:
    """Character-n-gram language-ID (Cavnar–Trenkle style cosine over
    trigram frequency profiles). Profiles are trained once per actor from the
    provided labeled sample (broadcast), then applied per batch."""

    _CP = np.uint64(0x110000)  # trigram → uint64 key base (max codepoint + 1)

    def __init__(self, profiles: dict, text_col: str, id_col: str, n: int = 3):
        self.profiles = {k: v for k, v in profiles.items()}
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.langs = sorted(self.profiles)
        self.mat = np.stack([self.profiles[lg][1] for lg in self.langs])
        self.vocab = {g: i for i, g in enumerate(self.profiles[self.langs[0]][0])}
        # Sorted uint64 trigram keys for vectorized searchsorted lookup
        # (built once per actor; key = cp0*CP² + cp1*CP + cp2).
        keys = np.array(
            [self._gram_key(g) for g in self.vocab], dtype=np.uint64
        )
        order = np.argsort(keys)
        self._keys_sorted = keys[order]
        self._key_to_vid = np.fromiter(self.vocab.values(), np.int64, len(self.vocab))[order]

    @classmethod
    def _gram_key(cls, g: str) -> np.uint64:
        k = np.uint64(0)
        for ch in g:
            k = k * cls._CP + np.uint64(ord(ch))
        return k

    @staticmethod
    def ngrams(text: str, n: int = 3):
        t = f" {text.strip()} "
        return [t[i : i + n] for i in range(max(len(t) - n + 1, 0))]

    def vec(self, text: str) -> np.ndarray:
        v = np.zeros(len(self.vocab), np.float64)
        for g in self.ngrams(text, self.n):
            i = self.vocab.get(g)
            if i is not None:
                v[i] += 1
        nrm = np.linalg.norm(v)
        return v / nrm if nrm else v

    def vec_ids(self, text: str) -> np.ndarray:
        """Vocab-id counts for one text — pandas-map instead of a Python
        dict-lookup loop."""
        grams = self.ngrams(text, self.n)
        if not grams:
            return np.zeros(len(self.vocab), np.float64)
        ids = pd.Series(grams).map(self.vocab).dropna().to_numpy(dtype=np.int64)
        v = np.bincount(ids, minlength=len(self.vocab)).astype(np.float64)
        nrm = np.linalg.norm(v)
        return v / nrm if nrm else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch vectorized scoring: one flat codepoint array for all
        docs (NUL-sentinel joined — NUL never appears in a trained vocab
        gram, so boundary-spanning windows can't match), sliding-window
        uint64 gram keys, one searchsorted vocab lookup, per-doc counts via
        a single bincount over (doc, vocab_id) pairs, one matmul."""
        texts = [(t or "") for t in batch[self.text_col].to_pylist()]
        nd, V = len(texts), len(self.vocab)
        if nd == 0 or self.n > 3:
            preds = [self.langs[int(np.argmax(self.mat @ self.vec_ids(t)))] for t in texts]
            return pa.table({self.id_col: batch[self.id_col], "lang_pred": pa.array(preds, pa.string())})
        padded = [f" {t.strip()} " for t in texts]
        joined = "\x00".join(padded)
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        L, n = len(codes), self.n
        if L < n:
            keys = np.empty(0, np.uint64)
        else:
            keys = np.zeros(L - n + 1, np.uint64)
            for j in range(n):
                keys = keys * self._CP + codes[j : L - n + 1 + j]
        # window → owning doc: doc of the window's first char
        doc_lens = np.array([len(p) for p in padded], dtype=np.int64)
        starts = np.zeros(nd, np.int64)
        np.cumsum(doc_lens[:-1] + 1, out=starts[1:])
        doc_of = np.zeros(len(keys), np.int64)
        if nd > 1 and len(keys):
            doc_of = (np.searchsorted(starts, np.arange(len(keys)), side="right") - 1)
        idx = np.searchsorted(self._keys_sorted, keys)
        idx[idx >= len(self._keys_sorted)] = 0
        valid = self._keys_sorted[idx] == keys if len(self._keys_sorted) else np.zeros(len(keys), bool)
        vids = self._key_to_vid[idx[valid]]
        docs = doc_of[valid]
        M = np.bincount(docs * V + vids, minlength=nd * V).reshape(nd, V).astype(np.float64)
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        scores = (M / nrm[:, None]) @ self.mat.T
        preds = [self.langs[i] for i in np.argmax(scores, axis=1)]
        return pa.table({self.id_col: batch[self.id_col], "lang_pred": pa.array(preds, pa.string())})


def train_lang_profiles(sample: pd.DataFrame, text_col: str, lang_col: str, n: int = 3,
                        top_grams: int = 512) -> dict:
    from collections import Counter

    counts: dict[str, Counter] = {}
    for lg, grp in sample.groupby(lang_col):
        c = Counter()
        for t in grp[text_col]:
            c.update(NgramLangProfiles.ngrams(t or "", n))
        counts[lg] = c
    total = Counter()
    for c in counts.values():
        total.update(c)
    vocab = [g for g, _ in total.most_common(top_grams)]
    out = {}
    for lg, c in counts.items():
        v = np.array([c.get(g, 0) for g in vocab], np.float64)
        nrm = np.linalg.norm(v)
        out[lg] = (vocab, v / nrm if nrm else v)
    return out


def lang_id(ds: Dataset, train_sample: pd.DataFrame, text_col: str = "text",
            id_col: str = "doc_id", lang_col: str = "lang") -> pd.DataFrame:
    profiles = train_lang_profiles(train_sample, text_col, lang_col)
    out = ds.map_batches(
        NgramLangProfiles, fn_constructor_args=(profiles, text_col, id_col),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


class Fingerprint:
    """Rolling polynomial (Rabin–Karp) 64-bit document fingerprint over the
    token stream — stable content identity for shard-level dedup manifests."""

    B = np.uint64(1000003)

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    SEED = np.uint64(1469598103934665603)
    # B is odd, hence invertible mod 2^64 — lets the rolling fold vectorize:
    # h = seed*B^n + Σ t_i·B^(n-1-i) = seed*B^n + B^(start+n-1)·Σ t_g·Binv^g
    BINV = np.uint64(pow(1000003, -1, 1 << 64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):  # uint64 wrap-around is the hash semantics
            return self._fold(batch)

    def _fold(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        out = np.zeros(n, np.uint64)
        toks_per_doc = [(t or "").split() for t in batch[self.text_col].to_pylist()]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        nz = np.flatnonzero(lens > 0)
        total = int(lens.sum())
        if total:
            flat = np.empty(total, dtype=object)
            pos = 0
            for t in toks_per_doc:
                flat[pos : pos + len(t)] = t
                pos += len(t)
            th = pd.util.hash_array(flat)  # stable siphash, one C pass
            # per-token Binv^g and per-position B^g via cumprod (wraps mod 2^64)
            binv_pows = np.ones(total, np.uint64)
            binv_pows[1:] = self.BINV
            np.cumprod(binv_pows, out=binv_pows)
            b_pows = np.ones(total + 1, np.uint64)
            b_pows[1:] = self.B
            np.cumprod(b_pows, out=b_pows)
            starts = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            sums = np.add.reduceat(th * binv_pows, starts)
            ends = starts + lens[nz]
            out[nz] = self.SEED * b_pows[lens[nz]] + b_pows[ends - 1] * sums
        # empty docs keep the seed as their fingerprint
        out[lens == 0] = self.SEED
        return pa.table({self.id_col: batch[self.id_col], "fingerprint": pa.array(out, pa.uint64())})


def fingerprints(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    out = ds.map_batches(
        Fingerprint, fn_constructor_args=(text_col, id_col), batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


# ---------------------------------------------------------------- unigram LM
# perplexity-style quality scoring (the CCNet practice: score documents by a
# language-model NLL and filter/partition on it; public description in
# Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from
# Web Crawl Data", arXiv:1911.00359 — their KenLM 5-gram becomes a unigram
# LM here, the smallest model with the same pipeline shape).

def fit_unigram_lm(ds: Dataset, text_col: str = "text",
                   vocab_cap: int | None = None) -> dict:
    """Distributed unigram-LM fit: per-batch token-hash count PARTIALS
    (map-side combine) → one (hash, count) groupby — the shuffle is
    vocabulary-sized, never corpus-sized. Returns the broadcastable model
    {hashes (sorted uint64), logp, oov_logp} with add-one smoothing:
    p(t) = (c_t + 1) / (total + V)."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        toks = [(t or "").split() for t in batch[text_col].to_pylist()]
        flat = np.concatenate([np.asarray(t, object) for t in toks if t]) \
            if any(toks) else np.empty(0, object)
        if len(flat) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        hashes = pd.util.hash_array(flat, hash_key="esray-unigram-lm")
        uniq, cnt = np.unique(hashes, return_counts=True)
        return pa.table({"h": uniq.view(np.int64), "n": cnt.astype(np.int64)})

    counts = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby("h").aggregate(Sum("n", alias_name="c")).to_pandas())
    if counts.empty or "c" not in counts.columns:
        # all-empty corpus: the hash groupby emits a ZERO-SCHEMA empty
        # frame (no columns at all), so guard before touching them
        return {"hashes": np.empty(0, np.uint64),
                "logp": np.empty(0, np.float64), "oov_logp": 0.0}
    # deterministic cap cut: count-tied tokens at the boundary order by
    # hash (the groupby's row order is nondeterministic across runs)
    counts = counts.sort_values(["c", "h"], ascending=[False, True],
                                kind="stable")
    if vocab_cap is not None:
        counts = counts.head(vocab_cap)
    total = int(counts["c"].sum())
    v = len(counts)
    if v == 0:
        # empty/all-empty corpus: a degenerate uniform model (every token
        # OOV at probability 1) instead of a ZeroDivisionError
        return {"hashes": np.empty(0, np.uint64),
                "logp": np.empty(0, np.float64), "oov_logp": 0.0}
    order = np.argsort(counts["h"].to_numpy().view(np.uint64))
    hashes = counts["h"].to_numpy().view(np.uint64)[order]
    c = counts["c"].to_numpy()[order].astype(np.float64)
    logp = np.log((c + 1.0) / (total + v))
    return {"hashes": hashes, "logp": logp,
            "oov_logp": float(np.log(1.0 / (total + v)))}


def add_nll(ds: Dataset, lm: dict, text_col: str = "text",
            out_col: str = "nll") -> Dataset:
    """Append each doc's mean negative log-likelihood under the unigram LM
    (the perplexity score: ppl = exp(nll)). The model broadcasts once via
    ray.put; scoring is one hash pass + searchsorted + reduceat per batch.
    Empty docs get NaN (no tokens to score)."""
    import ray

    ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        toks = [(t or "").split() for t in batch[text_col].to_pylist()]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        out = np.full(len(toks), np.nan)
        if lens.sum():
            flat = np.concatenate([np.asarray(t, object) for t in toks if t])
            if len(m["hashes"]) == 0:  # degenerate model: everything OOV
                lp = np.full(len(flat), m["oov_logp"])
            else:
                h = pd.util.hash_array(flat, hash_key="esray-unigram-lm")
                idx = np.searchsorted(m["hashes"], h)
                ok = (idx < len(m["hashes"])) & (
                    m["hashes"][np.clip(idx, 0, len(m["hashes"]) - 1)] == h)
                lp = np.where(ok, m["logp"][np.clip(idx, 0, len(m["logp"]) - 1)],
                              m["oov_logp"])
            nz = lens > 0
            offs = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offs[1:])
            out[nz] = np.add.reduceat(-lp, offs) / lens[nz]
        return batch.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def perplexity_filter(ds: Dataset, lm: dict, max_ppl: float,
                      text_col: str = "text") -> Dataset:
    """CCNet-style quality gate: keep docs whose unigram perplexity is at
    most ``max_ppl`` (high-ppl = far from the corpus distribution — boilerplate,
    gibberish, wrong language)."""
    scored = add_nll(ds, lm, text_col=text_col, out_col="_nll")

    def keep(batch: pa.Table) -> pa.Table:
        nll = batch["_nll"].to_numpy(zero_copy_only=False)
        mask = np.exp(nll) <= max_ppl  # NaN (empty doc) compares False → drop
        return batch.filter(pa.array(mask)).drop_columns(["_nll"])

    return scored.map_batches(keep, batch_format="pyarrow")


def ccnet_perplexity_buckets(ds: Dataset, lm: dict,
                             lang_col: str = "lang",
                             text_col: str = "text",
                             round_digits: int = 4):
    """CCNet head/middle/tail partitioning (Wenzek et al. 1911.00359
    §4.4): per LANGUAGE, documents are split into three equal-count
    quality buckets by LM score — ``head`` = lowest-perplexity third,
    then ``middle``, then ``tail``. CCNet keeps the bucket boundary a
    VALUE threshold (documents tied at the cutoff share a bucket), so
    the split is deterministic and shuffle-free:

    1. one scoring pass appends the mean NLL (:func:`add_nll`,
       broadcast model);
    2. per-batch ``(lang, nll_r)`` count partials → one tiny groupby
       (shuffle is distinct-rounded-score-sized, never corpus-sized);
    3. the driver reads each language's cumulative counts and takes the
       values at 0-based ranks ``(n-1)//3`` and ``2*(n-1)//3`` of the
       sorted score multiset as thresholds (the discrete quantile);
    4. a second vectorized pass assigns ``head/middle/tail`` by
       comparing the rounded score against the broadcast thresholds.

    NLL is monotone in perplexity (ppl = exp(nll)), so thresholding on
    nll IS the CCNet perplexity split without the exp. Scores are
    rounded to ``round_digits`` BEFORE thresholding so the rule is
    reproducible cross-engine (log values never land on rounding
    boundaries). Empty docs (NaN score) are dropped, as in CCNet.

    Returns ``(bucketed_dataset, thresholds)`` where the dataset gains
    ``ppl_bucket`` (and keeps ``_nll_r``) and thresholds is
    ``{lang: (t1, t2)}``.
    """
    from ray.data.aggregate import Sum

    scored = add_nll(ds, lm, text_col=text_col, out_col="_nll")

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch[lang_col].to_pylist(),
            "v": np.round(batch["_nll"].to_numpy(zero_copy_only=False),
                          round_digits)})
        df = df.dropna()
        g = df.groupby(["lang", "v"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    counts = (scored.map_batches(partial, batch_format="pyarrow")
              .groupby(["lang", "v"]).aggregate(Sum("n", alias_name="c"))
              .to_pandas())
    thresholds: dict[str, tuple[float, float]] = {}
    if not counts.empty and "c" in counts.columns:
        for lang, g in counts.groupby("lang"):
            g = g.sort_values("v")
            cum = g["c"].cumsum().to_numpy()
            n = int(cum[-1])
            vals = g["v"].to_numpy()
            i1, i2 = (n - 1) // 3, 2 * (n - 1) // 3
            t1 = float(vals[np.searchsorted(cum, i1, side="right")])
            t2 = float(vals[np.searchsorted(cum, i2, side="right")])
            thresholds[str(lang)] = (t1, t2)

    import ray

    ref = ray.put(thresholds)

    def assign(batch: pa.Table) -> pa.Table:
        th = ray.get(ref)
        langs = batch[lang_col].to_pylist()
        v = np.round(batch["_nll"].to_numpy(zero_copy_only=False),
                     round_digits)
        t1 = np.array([th.get(str(l), (np.inf, np.inf))[0]
                       for l in langs])
        t2 = np.array([th.get(str(l), (np.inf, np.inf))[1]
                       for l in langs])
        bucket = np.where(v <= t1, "head",
                          np.where(v <= t2, "middle", "tail"))
        keep = ~np.isnan(v)
        out = batch.append_column("_nll_r", pa.array(v, pa.float64()))
        out = out.append_column("ppl_bucket",
                                pa.array(bucket, pa.string()))
        return out.filter(pa.array(keep))

    return scored.map_batches(assign, batch_format="pyarrow"), thresholds


def top_ngram_fraction(ds: Dataset, n: int = 2, text_col: str = "text",
                       id_col: str = "doc_id") -> pd.DataFrame:
    """Gopher repetition signal (Rae et al., arXiv:2112.11446 Table A1):
    the fraction of a document's tokens covered by its single most frequent
    word n-gram — high values flag boilerplate/template pages. Vectorized:
    one hash pass per batch via the shingle kernel, per-doc top count via
    sort + reduceat, no per-row Python. Docs shorter than n score 0."""
    from elasticsearch_ray.ops.dedup import _shingle_hashes

    def score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n_toks = np.array([len((t or "").split()) for t in texts], np.int64)
        out = np.zeros(len(texts))
        sh = _all_gram_hashes(texts, n)
        lens = np.array([len(x) for x in sh], np.int64)
        if lens.sum():
            # whole-batch: lexsort (doc, hash) → run-lengths per (doc, gram)
            # → per-doc max via one maximum.reduceat — no per-doc Python
            flat = np.concatenate([x for x in sh if len(x)])
            doc_rep = np.repeat(np.arange(len(texts)), lens)
            order = np.lexsort((flat, doc_rep))
            fs, dr = flat[order], doc_rep[order]
            new_run = np.r_[True, (fs[1:] != fs[:-1]) | (dr[1:] != dr[:-1])]
            starts = np.flatnonzero(new_run)
            counts = np.diff(np.r_[starts, len(fs)])
            cdoc = dr[starts]
            dstarts = np.flatnonzero(np.r_[True, cdoc[1:] != cdoc[:-1]])
            top = np.maximum.reduceat(counts, dstarts)
            docs = cdoc[dstarts]
            # clamp: self-overlapping grams ('a a a a', n=2) push top·n
            # past n_toks; downstream filter thresholds assume [0, 1]
            out[docs] = np.minimum(top * n / n_toks[docs], 1.0)
        # floor-truncate: k/2^m token ratios land EXACTLY on rounding
        # boundaries where pandas (half-even) and DuckDB (half-away)
        # disagree — the repo's established ratio-oracle convention
        return pa.table({id_col: pa.array(ids),
                         "top_ngram_frac": pa.array(np.floor(out * 1e6) / 1e6)})

    return (ds.map_batches(score, batch_format="pyarrow")
            .to_pandas().sort_values(id_col).reset_index(drop=True))


def _all_gram_hashes(texts: list, k: int) -> list:
    """Per doc: uint64 hashes of ALL k-token shingles INCLUDING duplicates
    (the dedup kernel's `_shingle_hashes` uniquifies; repetition signals
    need multiplicity)."""
    toks_per_doc = [(t or "").split() for t in texts]
    out = []
    for toks in toks_per_doc:
        if len(toks) < k:
            out.append(np.empty(0, np.uint64))
            continue
        h = pd.util.hash_array(np.asarray(toks, object),
                               hash_key="esray-allgram-h1")
        C = np.uint64(0x9E3779B97F4A7C15)
        acc = h[: len(h) - k + 1].copy()
        for j in range(1, k):
            acc = acc * C ^ h[j: len(h) - k + 1 + j]
        out.append(acc)
    return out


# --------------------------------------------------------- bigram LM


_BIGRAM_C = np.uint64(0x9E3779B97F4A7C15)


def fit_bigram_lm(ds: Dataset, text_col: str = "text",
                  lam: float = 0.9) -> dict:
    """Distributed bigram-LM fit with Jelinek-Mercer interpolation onto
    the add-one unigram (the KenLM-family count shape; interpolation per
    Jelinek & Mercer 1980, the same smoothing family the phrase
    suggester exposes):

        p(w | prev) = λ · c(prev, w)/c(prev, ·) + (1 − λ) · p_uni(w)

    Shuffle shape mirrors ``fit_unigram_lm``: per-batch (pair-hash,
    count) partials → one vocabulary²-bounded groupby; the context
    totals c(prev, ·) reduce from the SAME pair table (no second pass
    over the corpus). Pairs ride as one combined uint64 hash lane."""
    from ray.data.aggregate import Min, Sum

    uni = fit_unigram_lm(ds, text_col)

    def partials(batch: pa.Table) -> pa.Table:
        toks = [(t or "").split() for t in batch[text_col].to_pylist()]
        prev_l, cur_l = [], []
        for t in toks:
            if len(t) > 1:
                h = pd.util.hash_array(np.asarray(t, object),
                                       hash_key="esray-unigram-lm")
                prev_l.append(h[:-1])
                cur_l.append(h[1:])
        if not prev_l:
            return pa.table({"hp": pa.array([], pa.int64()),
                             "hb": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        prev = np.concatenate(prev_l)
        cur = np.concatenate(cur_l)
        pair = prev * _BIGRAM_C + cur
        # combine per batch: unique pairs with counts, carrying the
        # context hash so the reduce can total c(prev, ·)
        uniq, inv, cnt = np.unique(pair, return_inverse=True,
                                   return_counts=True)
        first = np.zeros(len(uniq), np.int64)
        first[inv[::-1]] = np.arange(len(pair))[::-1]
        return pa.table({"hp": prev[first].view(np.int64),
                         "hb": uniq.view(np.int64),
                         "n": cnt.astype(np.int64)})

    pairs = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("hb").aggregate(Sum("n", alias_name="c"),
                                      Min("hp", alias_name="hp"))
             .to_pandas())
    if pairs.empty or "c" not in pairs.columns:
        # all-empty corpus: the hash groupby emits zero-SCHEMA empty
        # blocks (dev-notes rule), so the frame may lack columns too
        return {"uni": uni, "lam": float(lam),
                "pairs": np.empty(0, np.uint64),
                "p_ml": np.empty(0, np.float64)}
    ctx = pairs.groupby("hp")["c"].sum()
    p_ml = (pairs["c"] / pairs["hp"].map(ctx)).to_numpy(np.float64)
    keys = pairs["hb"].to_numpy().view(np.uint64)
    order = np.argsort(keys)
    return {"uni": uni, "lam": float(lam), "pairs": keys[order],
            "p_ml": p_ml[order]}


def add_bigram_nll(ds: Dataset, lm: dict, text_col: str = "text",
                   out_col: str = "nll2") -> Dataset:
    """Per-doc mean NLL under the interpolated bigram LM: position 1
    scores with the unigram alone, positions ≥2 with
    λ·p_ml + (1−λ)·p_uni. One hash pass + two searchsorted lookups per
    batch; empty docs get NaN."""
    import ray

    ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        uni, lam = m["uni"], m["lam"]
        toks = [(t or "").split() for t in batch[text_col].to_pylist()]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        out = np.full(len(toks), np.nan)
        if lens.sum() == 0:
            return batch.append_column(out_col, pa.array(out, pa.float64()))
        flat = np.concatenate([np.asarray(t, object) for t in toks if t])
        h = pd.util.hash_array(flat, hash_key="esray-unigram-lm")
        if len(uni["hashes"]):
            idx = np.searchsorted(uni["hashes"], h)
            ok = (idx < len(uni["hashes"])) & (
                uni["hashes"][np.clip(idx, 0,
                                      len(uni["hashes"]) - 1)] == h)
            p_uni = np.exp(np.where(
                ok, uni["logp"][np.clip(idx, 0, len(uni["logp"]) - 1)],
                uni["oov_logp"]))
        else:  # degenerate model — everything OOV (empty-array clip
            # indexing would raise, review r5 #2)
            p_uni = np.full(len(h), np.exp(uni["oov_logp"]))
        # per-position previous-token hash (first position has none)
        nz = lens > 0
        starts = np.zeros(int(nz.sum()), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=starts[1:])
        is_first = np.zeros(len(flat), bool)
        is_first[starts] = True
        prev = np.empty_like(h)
        prev[1:] = h[:-1]
        prev[0] = 0
        pair = prev * _BIGRAM_C + h
        if len(m["pairs"]):
            pidx = np.searchsorted(m["pairs"], pair)
            pok = (pidx < len(m["pairs"])) & (
                m["pairs"][np.clip(pidx, 0, len(m["pairs"]) - 1)]
                == pair) & ~is_first
            p_ml = np.where(pok, m["p_ml"][np.clip(pidx, 0,
                            len(m["p_ml"]) - 1)], 0.0)
        else:  # no bigrams fitted (≤1-token docs) — back off to unigram
            p_ml = np.zeros(len(h))
        p = np.where(is_first, p_uni, lam * p_ml + (1 - lam) * p_uni)
        out[nz] = np.add.reduceat(-np.log(p), starts) / lens[nz]
        return batch.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def add_compression_ratio(ds: Dataset, text_col: str = "text",
                          out_col: str = "compression_ratio",
                          level: int = 6) -> Dataset:
    """zlib compression ratio per document — compressed bytes /
    raw bytes of the UTF-8 text. The standard web-scale noise /
    repetition signal (the Dolma and RedPajama-v2 quality-signal
    suites compute exactly this; boilerplate and template spam
    compress far below prose, random noise compresses above it).
    Empty docs get ratio 0. Streaming narrow transform; zlib is
    C-speed per row."""
    import zlib

    def ratio(df: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(df), np.float64)
        for i, t in enumerate(df[text_col].fillna("")):
            b = t.encode("utf-8", "ignore")
            if b:
                out[i] = len(zlib.compress(b, level)) / len(b)
        res = df.copy()
        res[out_col] = out
        return res

    return ds.map_batches(ratio, batch_format="pandas")


def compression_filter(ds: Dataset, min_ratio: float = 0.1,
                       max_ratio: float = 1.0,
                       text_col: str = "text") -> Dataset:
    """Keep documents whose compression ratio lies in
    [min_ratio, max_ratio] — the two-sided cut the quality suites
    apply (too low = templated/repetitive, too high = random noise)."""
    scored = add_compression_ratio(ds, text_col, "_zratio")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = ((df["_zratio"] >= min_ratio)
             & (df["_zratio"] <= max_ratio)).to_numpy(bool)
        return df[m].drop(columns=["_zratio"])

    return scored.map_batches(keep, batch_format="pandas")
