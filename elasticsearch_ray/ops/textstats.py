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
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            toks = (text or "").split()
            tok_n[i] = len(toks)
            if toks:
                mean_len[i] = sum(map(len, toks)) / len(toks)
                stop_ratio[i] = sum(t in self.stop for t in toks) / len(toks)
                uniq_ratio[i] = len(set(toks)) / len(toks)
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

    def __init__(self, profiles: dict, text_col: str, id_col: str, n: int = 3):
        self.profiles = {k: v for k, v in profiles.items()}
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.langs = sorted(self.profiles)
        self.mat = np.stack([self.profiles[lg][1] for lg in self.langs])
        self.vocab = {g: i for i, g in enumerate(self.profiles[self.langs[0]][0])}

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for text in batch[self.text_col].to_pylist():
            v = self.vec(text or "")
            preds.append(self.langs[int(np.argmax(self.mat @ v))])
        return pa.table({self.id_col: batch[self.id_col], "lang_pred": pa.array(preds)})


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        np.seterr(over="ignore")  # uint64 wrap-around is the hash semantics
        out = np.zeros(len(batch), np.uint64)
        cache: dict[str, np.uint64] = {}
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            h = np.uint64(1469598103934665603)
            for tok in (text or "").split():
                th = cache.get(tok)
                if th is None:
                    # stable across processes (python hash() is salted)
                    th = np.uint64(
                        int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
                    )
                    cache[tok] = th
                h = h * self.B + th
            out[i] = h
        return pa.table({self.id_col: batch[self.id_col], "fingerprint": pa.array(out, pa.uint64())})


def fingerprints(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    out = ds.map_batches(
        Fingerprint, fn_constructor_args=(text_col, id_col), batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)
