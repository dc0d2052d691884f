"""Okapi BM25 with Elasticsearch 8.3.0 float semantics.

Reference semantics:
  - Default similarity is BM25, k1=1.2, b=0.75, discount_overlaps=true
    (``server/.../index/similarity/SimilarityProviders.java:254-261``).
  - ES wraps Lucene 9's BM25 (which dropped the (k1+1) numerator factor) in
    ``LegacyBM25Similarity`` which multiplies the query boost by (k1 + 1)
    (``server/.../lucene/similarity/LegacyBM25Similarity.java:66-68``), so the
    effective per-(term, doc) score is the classic
        idf * (k1+1) * tf / (tf + k1 * (1 - b + b * dl/avgdl)).
  - idf = ln(1 + (N - df + 0.5) / (df + 0.5)), computed in double, narrowed
    to float32.
  - dl is the SmallFloat-lossy decoded doc length (norms.py); avgdl =
    sumTotalTermFreq / docCount in double, narrowed to float32.
  - Per-norm-byte denominator cache of 256 float32 values:
        cache[b] = k1 * (1 - b_param + b_param * LENGTH_TABLE[b] / avgdl)
    per-doc score = weight * float32(tf / (tf + cache[norm_byte])).
  - Multi-term scores are summed in double and narrowed to float32
    (Lucene DisjunctionSumScorer / ConjunctionScorer behavior).

``dtype='float32'`` reproduces those narrowing points exactly;
``dtype='float64'`` computes everything in double — used for the DuckDB
oracle comparison where SQL cannot express float32 narrowing (ranking is
identical; only ulp-level score digits differ).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from elasticsearch_ray.index.norms import LENGTH_TABLE


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


def idf(df: int, doc_count: int) -> float:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) in double precision."""
    return math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))


class BM25Scorer:
    """Per-term scorer over (tf, norm_byte) arrays.

    One instance per query term; precomputes the 256-entry denominator cache
    and the float32 weight, mirroring Lucene's BM25Scorer.
    """

    def __init__(
        self,
        df: int,
        doc_count: int,
        avgdl: float,
        params: BM25Params = BM25Params(),
        boost: float = 1.0,
        dtype: str = "float32",
    ):
        self.params = params
        self.dtype = dtype
        idf_d = idf(df, doc_count)
        if dtype == "float32":
            idf_f = np.float32(idf_d)
            avgdl_f = np.float32(avgdl)
            k1 = np.float32(params.k1)
            b = np.float32(params.b)
            # LegacyBM25: boost' = boost * (k1 + 1); weight = boost' * idf (float math)
            self.weight = np.float32(np.float32(boost) * np.float32(k1 + np.float32(1.0)) * idf_f)
            self.cache = (k1 * ((np.float32(1.0) - b) + b * LENGTH_TABLE / avgdl_f)).astype(
                np.float32
            )
        else:
            self.weight = float(boost) * (params.k1 + 1.0) * idf_d
            self.cache = (
                params.k1 * ((1.0 - params.b) + params.b * LENGTH_TABLE.astype(np.float64) / avgdl)
            )

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """Vectorized score for arrays of (tf, norm_byte); returns self.dtype array."""
        norm = self.cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        tf = np.asarray(tfs)
        if self.dtype == "float32":
            # Lucene: weight * (float)(freq / (freq + (double) norm))
            frac = (tf.astype(np.float64) / (tf.astype(np.float64) + norm.astype(np.float64))).astype(
                np.float32
            )
            return (np.float32(self.weight) * frac).astype(np.float32)
        return self.weight * (tf / (tf + norm))

    def max_score(self, max_tf: np.ndarray | int, min_norm_byte: np.ndarray | int) -> np.ndarray:
        """Upper bound of score for a block given its impacts (max tf, min norm).

        Valid bound: score is increasing in tf and decreasing in dl, so
        (max_tf, min_norm) dominates every (tf, norm) pair in the block —
        our analog of Lucene's per-block impact entries.
        """
        return self.score(np.asarray(max_tf), np.asarray(min_norm_byte))


class BooleanScorer:
    """``boolean`` similarity (SimilarityProviders.java:254-324 option;
    Lucene BooleanSimilarity): every match scores the query boost, ignoring
    tf/norms — the only non-BM25 similarity worth porting per SURVEY §2.6."""

    def __init__(self, boost: float = 1.0, dtype: str = "float32"):
        self.dtype = dtype
        self.weight = np.float32(boost) if dtype == "float32" else float(boost)

    def score(self, tfs, norm_bytes) -> np.ndarray:
        dt = np.float32 if self.dtype == "float32" else np.float64
        return np.full(np.shape(tfs), self.weight, dtype=dt)

    def max_score(self, max_tf, min_norm_byte) -> np.ndarray:
        dt = np.float32 if self.dtype == "float32" else np.float64
        return np.full(np.shape(max_tf), self.weight, dtype=dt)


class LMDirichletScorer:
    """``LMDirichlet`` similarity (SimilarityProviders.java:284-291; Lucene
    LMDirichletSimilarity, Zhai & Lafferty smoothing, default μ=2000):

        score = boost · max(0, ln(1 + tf / (μ·P(w|C))) + ln(μ / (dl + μ)))
        P(w|C) = (ttf + 1) / (total_tokens + 1)

    dl decodes through the same lossy SmallFloat LENGTH_TABLE as BM25.
    Increasing in tf, decreasing in dl, and the ≥0 clamp preserves both, so
    the (max_tf, min_norm) impact bound stays valid for BMW pruning."""

    def __init__(self, ttf: int, total_tokens: int, boost: float = 1.0,
                 mu: float = 2000.0, dtype: str = "float32"):
        self.dtype = dtype
        self.boost = float(boost)
        self.mu = float(mu)
        self.mu_p = self.mu * (ttf + 1.0) / (total_tokens + 1.0)
        self.dl = LENGTH_TABLE.astype(np.float64)

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = self.dl[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        tf = np.asarray(tfs, dtype=np.float64)
        s = self.boost * (np.log1p(tf / self.mu_p) + np.log(self.mu / (dl + self.mu)))
        s = np.maximum(s, 0.0)
        return s.astype(np.float32) if self.dtype == "float32" else s

    def max_score(self, max_tf, min_norm_byte) -> np.ndarray:
        return self.score(np.asarray(max_tf), np.asarray(min_norm_byte))


class DFRScorer:
    """``DFR`` similarity (SimilarityProviders.java:262-283 option) in the
    classic I(n)L2 composition (Amati & van Rijsbergen, "Probabilistic
    models of information retrieval based on measuring the divergence from
    randomness", TOIS 2002):

        tfn   = tf · log2(1 + c · avgdl / dl)          (normalization H2, c=1)
        score = boost · log2((N + 1)/(df + 0.5)) · tfn / (tfn + 1)
                                                (basic model I(n) × after-effect L)

    Monotone in tf and anti-monotone in dl → impact bounds valid."""

    def __init__(self, df: int, doc_count: int, avgdl: float,
                 boost: float = 1.0, c: float = 1.0, dtype: str = "float32"):
        self.dtype = dtype
        self.inf = float(boost) * math.log2((doc_count + 1.0) / (df + 0.5))
        self.cavg = float(c) * float(avgdl)
        self.dl = LENGTH_TABLE.astype(np.float64)

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = np.maximum(self.dl[np.asarray(norm_bytes, dtype=np.int64) & 0xFF], 1.0)
        tfn = np.asarray(tfs, dtype=np.float64) * np.log2(1.0 + self.cavg / dl)
        s = self.inf * tfn / (tfn + 1.0)
        return s.astype(np.float32) if self.dtype == "float32" else s

    def max_score(self, max_tf, min_norm_byte) -> np.ndarray:
        return self.score(np.asarray(max_tf), np.asarray(min_norm_byte))


class LMJelinekMercerScorer:
    """``LMJelinekMercer`` similarity (SimilarityProviders.java:292-299;
    Lucene LMJelinekMercerSimilarity, default λ=0.1):

        score = boost · ln(1 + ((1−λ)·tf/dl) / (λ·P(w|C)))
        P(w|C) = (ttf + 1) / (total_tokens + 1)

    Increasing in tf, decreasing in dl (dl divides tf), always ≥ 0 —
    impact bounds stay valid."""

    def __init__(self, ttf: int, total_tokens: int, boost: float = 1.0,
                 lam: float = 0.1, dtype: str = "float32"):
        self.dtype = dtype
        self.boost = float(boost)
        # (1-λ) / (λ · P(w|C)) precombined
        p_wc = (ttf + 1.0) / (total_tokens + 1.0)
        self.ratio = (1.0 - lam) / (lam * p_wc)
        self.dl = np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = self.dl[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        tf = np.asarray(tfs, dtype=np.float64)
        s = self.boost * np.log1p(self.ratio * tf / dl)
        return s.astype(np.float32) if self.dtype == "float32" else s

    def max_score(self, max_tf, min_norm_byte) -> np.ndarray:
        return self.score(np.asarray(max_tf), np.asarray(min_norm_byte))


class DFIScorer:
    """``DFI`` similarity (SimilarityProviders.java:300-307; Lucene
    DFISimilarity with the ``standardized`` independence measure,
    Kocabas, Dincer & Karaoglan, "A nonparametric term weighting method
    for information retrieval based on measuring the divergence from
    independence", IR 2014):

        expected = (ttf + 1) · dl / (total_tokens + 1)
        score    = 0                                 if tf ≤ expected
                 = boost · log2(1 + (tf − expected)/√expected)   otherwise

    Increasing in tf; expected grows with dl so the score falls with dl;
    the ≤-expected clamp preserves both → impact bounds valid."""

    def __init__(self, ttf: int, total_tokens: int, boost: float = 1.0,
                 dtype: str = "float32"):
        self.dtype = dtype
        self.boost = float(boost)
        self.exp_per_dl = (ttf + 1.0) / (total_tokens + 1.0)
        self.dl = LENGTH_TABLE.astype(np.float64)

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = self.dl[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        tf = np.asarray(tfs, dtype=np.float64)
        expected = np.maximum(self.exp_per_dl * dl, 1e-12)
        meas = (tf - expected) / np.sqrt(expected)
        s = np.where(tf > expected, self.boost * np.log2(1.0 + np.maximum(meas, 0.0)), 0.0)
        return s.astype(np.float32) if self.dtype == "float32" else s

    def max_score(self, max_tf, min_norm_byte) -> np.ndarray:
        return self.score(np.asarray(max_tf), np.asarray(min_norm_byte))


class IBScorer:
    """``IB`` similarity (SimilarityProviders.java:308-324; Lucene
    IBSimilarity, Clinchant & Gaussier "Information-based models for ad hoc
    IR", SIGIR 2010) in the LL / df / H2 composition:

        tfn   = tf · log2(1 + c · avgdl / dl)     (normalization H2, c=1)
        λ     = (df + 1) / (N + 1)                (LambdaDF)
        score = boost · ln(1 + tfn / λ)           (DistributionLL)

    Monotone in tf, anti-monotone in dl → impact bounds valid."""

    def __init__(self, df: int, doc_count: int, avgdl: float,
                 boost: float = 1.0, c: float = 1.0, dtype: str = "float32"):
        self.dtype = dtype
        self.boost = float(boost)
        self.inv_lambda = (doc_count + 1.0) / (df + 1.0)
        self.cavg = float(c) * float(avgdl)
        self.dl = np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = self.dl[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        tfn = np.asarray(tfs, dtype=np.float64) * np.log2(1.0 + self.cavg / dl)
        s = self.boost * np.log1p(tfn * self.inv_lambda)
        return s.astype(np.float32) if self.dtype == "float32" else s

    def max_score(self, max_tf, min_norm_byte) -> np.ndarray:
        return self.score(np.asarray(max_tf), np.asarray(min_norm_byte))


def make_scorer(similarity: str, df: int, doc_count: int, avgdl: float,
                params: BM25Params, boost: float = 1.0, dtype: str = "float32",
                ttf: int = 0, total_tokens: int = 0):
    if isinstance(similarity, dict):
        if similarity.get("type") != "scripted":
            raise ValueError(f"unknown similarity spec {similarity!r}")
        return ScriptedScorer(similarity["script"], df, doc_count,
                              total_tokens=total_tokens, ttf=ttf,
                              boost=boost, dtype=dtype,
                              weight_source=similarity.get("weight_script"))
    if similarity == "boolean":
        return BooleanScorer(boost, dtype)
    if similarity == "match_only_text":
        # match_only_text field (mapper-extras MatchOnlyTextFieldMapper.java:
        # 187-216): EVERY query on the field is wrapped in ConstantScoreQuery,
        # so each matching term contributes exactly the query boost — the
        # BooleanScorer constant — regardless of tf/norms (the index stores
        # IndexOptions.DOCS and omits norms, so there is nothing to score on).
        return BooleanScorer(boost, dtype)
    if similarity == "LMDirichlet":
        return LMDirichletScorer(ttf, total_tokens, boost, dtype=dtype)
    if similarity == "LMJelinekMercer":
        return LMJelinekMercerScorer(ttf, total_tokens, boost, dtype=dtype)
    if similarity == "DFI":
        return DFIScorer(ttf, total_tokens, boost, dtype=dtype)
    if similarity == "DFR":
        return DFRScorer(df, doc_count, avgdl, boost, dtype=dtype)
    if similarity == "IB":
        return IBScorer(df, doc_count, avgdl, boost, dtype=dtype)
    return BM25Scorer(df, doc_count, avgdl, params, boost, dtype)


_SCRIPTED_DOTS = {
    "query.boost": "query_boost",
    "field.docCount": "field_docCount",
    "field.sumTotalTermFreq": "field_sumTotalTermFreq",
    "field.sumDocFreq": "field_sumDocFreq",
    "term.docFreq": "term_docFreq",
    "term.totalTermFreq": "term_totalTermFreq",
    "doc.freq": "doc_freq",
    "doc.length": "doc_length",
}


def _flatten_sim_script(src: str) -> str:
    """Map the reference's ScriptedSimilarity variable names
    (``query.boost``, ``term.docFreq``, ``doc.freq``, …) onto flat
    expression identifiers before compiling with the sandboxed
    lang-expression parser."""
    for dotted, flat in _SCRIPTED_DOTS.items():
        src = src.replace(dotted, flat)
    return src


class ScriptedScorer:
    """``scripted`` similarity (SimilarityProviders.java scripted option;
    ``index/similarity/ScriptedSimilarity.java``): the per-(term, doc)
    score is a sandboxed script over the reference's exact variable set —
    ``query.boost``, ``field.docCount``, ``field.sumTotalTermFreq``,
    ``term.docFreq``, ``term.totalTermFreq``, ``doc.freq``,
    ``doc.length`` — plus ``weight`` from the optional ``weight_script``
    (evaluated ONCE per term on doc-independent stats, exactly the
    reference's SimilarityWeightScript split). Scripts compile through
    the lang-expression analog (search/expressions.py), so the language
    is the documented arithmetic subset, not Painless.

    ``doc.length`` decodes through the same lossy SmallFloat
    LENGTH_TABLE the built-in similarities read (the reference's norm).
    ``field.sumDocFreq`` is not tracked by this engine's stats files;
    scripts referencing it fail at compile with an unknown-identifier
    error rather than reading a wrong number.

    BMW: an arbitrary script has no monotone (max_tf, min_norm) impact
    bound, so ``max_score`` returns +inf — block-max pruning degrades to
    never-prune (correct, unpruned), matching Lucene's treatment of
    similarities without impacts."""

    def __init__(self, source: str, df: int, doc_count: int,
                 total_tokens: int = 0, ttf: int = 0, boost: float = 1.0,
                 dtype: str = "float32", weight_source: str | None = None):
        from elasticsearch_ray.search.expressions import compile_expression

        self.dtype = dtype
        self.const = {
            "query_boost": np.float64(boost),
            "field_docCount": np.float64(doc_count),
            "field_sumTotalTermFreq": np.float64(total_tokens),
            "term_docFreq": np.float64(df),
            "term_totalTermFreq": np.float64(ttf),
        }
        weight = 1.0
        if weight_source:
            wfn = compile_expression(_flatten_sim_script(weight_source))
            weight = float(np.asarray(wfn(dict(self.const))).reshape(-1)[0])
        self.const["weight"] = np.float64(weight)
        self.fn = compile_expression(_flatten_sim_script(source))
        self.dl = LENGTH_TABLE.astype(np.float64)

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        env = dict(self.const)
        env["doc_freq"] = np.asarray(tfs, dtype=np.float64)
        env["doc_length"] = self.dl[np.asarray(norm_bytes,
                                               dtype=np.int64) & 0xFF]
        s = np.asarray(self.fn(env), dtype=np.float64)
        s = np.broadcast_to(s, env["doc_freq"].shape).astype(np.float64)
        return s.astype(np.float32) if self.dtype == "float32" else s

    def max_score(self, max_tf, min_norm_byte) -> np.ndarray:
        shape = np.asarray(max_tf, dtype=np.float64).shape
        return np.full(shape, np.inf)
