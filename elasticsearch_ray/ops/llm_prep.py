"""LLM training-data preparation operators: stratified sampling,
sequence packing, PII redaction.

These are beyond-reference first-class pipeline ops (task brief). Public
semantics they implement:

- **Stratified / mixture sampling** — per-stratum inclusion rates (the
  "domain mixture weights" step of LM data recipes, e.g. GPT-3 §2.2 /
  The Pile). Inclusion is decided by the SAME deterministic Knuth
  multiplicative hash as the x-pack `random_sampler` agg
  (`ops/aggs.py:522`) so the sample is reproducible across runs and
  parallelism AND exactly expressible in a SQL oracle.
- **Sequence packing** — the classic "concatenate documents in a fixed
  order and cut fixed-size training windows" step (GPT-2/3 data prep;
  RoBERTa FULL-SENTENCES). `pack_windows` assigns each document its
  global token-offset interval and the window ids it lands in; an exact
  SQL twin is a prefix-sum window function. `pack_bins` is the
  alternative no-document-splitting form: next-fit bin packing in
  doc-id order within fixed-size doc groups (deterministic, shuffle
  once on the group key).
- **PII redaction** — vectorized regex replacement of
  email / IPv4 / phone / SSN-shaped spans with typed placeholder tags,
  the shape of the ES 8.x `redact` ingest processor (grok-rule based)
  restricted to RE2-compatible patterns so DuckDB's `regexp_replace`
  replicates it exactly.

Scale shape: sampling and redaction are streaming narrow transforms
(one vectorized map_batches, nothing materialized). `pack_windows` does
ONE small driver reduce (per-group token sums — #groups = n_docs /
group_size rows) and ONE hash shuffle on the group key; `pack_bins`
shuffles once on the same key. No stage holds more than a group in
memory.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(4294967296)


# ------------------------------------------------------------- sampling


def stratified_sample(ds, strata_col: str, rates: dict, id_col: str,
                      default_rate: float = 0.0):
    """Keep each row of stratum ``s`` iff
    ``(id * 2654435761) mod 2^32 < rates[s] * 2^32`` — deterministic,
    layout-independent, SQL-expressible (CASE over the same predicate).
    ``rates`` maps stratum value -> [0, 1] rate; unlisted strata use
    ``default_rate``. Rows with NULL stratum use ``default_rate``."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    # the hash is mod 2^32, so a rate-1.0 threshold of 2^32 keeps every
    # row under strict < (clamping to 2^32-1 would drop the one hash
    # residue equal to it)
    thresholds = {str(s): np.uint64(min(int(r * 4294967296.0), 2**32))
                  for s, r in rates.items()}
    default_thr = np.uint64(min(int(default_rate * 4294967296.0), 2**32))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * _KNUTH) % _MOD32
        strata = batch[strata_col].to_pandas().astype(str)
        thr = strata.map(thresholds).fillna(float(default_thr)) \
            .to_numpy(np.float64).astype(np.uint64)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def c4_clean(ds, text_col: str = "text", out_col: str = "clean",
             min_words_per_line: int = 5, min_sentences: int = 3):
    """C4 cleaning rules (public: Raffel et al. 2020 §2.2 — the heuristics
    behind the C4 corpus), each SQL-expressible so an oracle can replicate
    the whole pass:

    - keep only lines that END in a terminal punctuation mark
      (``. ! ? "``) after trimming;
    - keep only lines with >= ``min_words_per_line`` words (single-space
      split, exactly like the twin's ``string_split(l, ' ')``);
    - drop lines containing the word "javascript" (case-insensitive);
    - drop PAGES containing "lorem ipsum" (ci) or a curly brace;
    - drop pages whose cleaned text has fewer than ``min_sentences``
      terminal marks.

    Streaming narrow transform: per-batch pandas line explode + boolean
    masks + group rejoin; emits (passthrough columns, ``out_col``) for
    surviving pages only."""
    import re as _re

    term = _re.compile(r'[.!?"]$')

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        text = df[text_col].astype(str)
        page_ok = ~text.str.lower().str.contains("lorem ipsum",
                                                 regex=False) \
            & ~text.str.contains("{", regex=False)
        lines = text.str.split("\n")
        ex = lines.explode()
        # SPACE-only trim — DuckDB trim() strips spaces only, and the
        # oracle must agree on tab/CR-terminated lines (review r5 #5)
        t = ex.astype(str).str.strip(" ")
        keep_line = (t.str.contains(term) &
                     (ex.astype(str).str.split(" ").str.len()
                      >= min_words_per_line) &
                     ~t.str.lower().str.contains("javascript",
                                                 regex=False))
        kept = ex.where(keep_line)
        clean_text = kept.dropna().groupby(level=0).agg("\n".join)
        clean_text = clean_text.reindex(df.index, fill_value="")
        n_sentences = clean_text.str.count(r"[.!?]")
        ok = page_ok & (n_sentences >= min_sentences)
        out = df[ok].copy()
        out[out_col] = clean_text[ok]
        return out

    return ds.map_batches(clean, batch_format="pandas")


def temperature_mixture_rates(ds, strata_col: str, alpha: float = 0.7,
                              target_fraction: float = 0.5) -> dict:
    """Temperature-based domain mixture (the mT5 / XLM-R smoothing rule,
    public: Xue et al. 2021 §3.1, Conneau et al. 2020 §3): sample domain
    ``d`` with probability ``p_d ∝ n_d^alpha`` (``alpha = 1/T``), which
    up-weights small domains. Converted to per-domain inclusion rates for
    :func:`stratified_sample`:

        rate_d = min(1, target_fraction · N_total · p_d / n_d)

    rounded to 6 decimals so an SQL twin computing the same formula parses
    the identical double. Counts come from a per-batch value_counts partial
    + driver combine — no shuffle (strata are low-cardinality)."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")

    def part(batch: pa.Table) -> pa.Table:
        s = batch[strata_col].to_pandas().astype(str)
        vc = s.value_counts()
        return pa.table({"stratum": pa.array(vc.index.astype(str)),
                         "n": pa.array(vc.to_numpy(np.int64))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    counts = parts.groupby("stratum")["n"].sum()
    n = counts.to_numpy(np.float64)
    w = np.power(n, alpha)
    w = w / w.sum()
    rates = np.minimum(1.0, np.round(
        target_fraction * n.sum() * w / n, 6))
    return dict(zip(counts.index, rates))


def temperature_sample(ds, strata_col: str, id_col: str,
                       alpha: float = 0.7, target_fraction: float = 0.5):
    """Deterministic temperature-mixture sample: rates from
    :func:`temperature_mixture_rates` applied through the Knuth-hash
    inclusion rule of :func:`stratified_sample` (layout-independent,
    SQL-expressible). Two streaming passes: a tiny counts pass, then the
    filter pass."""
    rates = temperature_mixture_rates(ds, strata_col, alpha,
                                      target_fraction)
    return stratified_sample(ds, strata_col, rates, id_col)


def global_shuffle(ds, id_col: str, seed: int = 0,
                   key_col: str | None = None):
    """Deterministic global shuffle for training-data ordering: sort by
    ``hash(id, seed)`` — unlike ``ds.random_shuffle()`` the permutation
    depends only on row VALUES and the seed, never on block layout, so
    a resumed/re-run pipeline reproduces the exact epoch order. One
    distributed sort; the key is the same SQL-expressible Knuth hash as
    :func:`stratified_sample` (full 64-bit spread via a second multiply)
    so an oracle can replicate the order."""
    keep = key_col is not None
    key_col = key_col or "_shuffle_key"
    s = np.uint64(seed)

    def key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        # ONE Fibonacci-hash round (K/2^32 ≈ the golden ratio, so
        # consecutive ids land far apart); chaining a second multiply
        # would compose to K^2 mod 2^32, which is nearly -1651 — an
        # almost-linear, order-preserving key. Hash ties (id spaces
        # >> 2^32) break deterministically on the id sort key.
        h = ((ids + s) * _KNUTH) % _MOD32
        return batch.append_column(key_col, pa.array(h))

    out = ds.map_batches(key, batch_format="pyarrow") \
        .sort([key_col, id_col])
    if keep:
        return out

    def drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([key_col])
    return out.map_batches(drop, batch_format="pyarrow")


# ------------------------------------------------------------- packing


def _group_token_offsets(ds, id_col: str, count_col: str, group_size: int):
    """Exclusive prefix sum of per-group token totals, in id order.
    Returns (offsets dict {group -> start token}, total tokens). The
    driver frame is #groups rows (n_docs / group_size), never per-doc."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ids // group_size
        uniq, inv = np.unique(g, return_inverse=True)
        sums = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table({"g": uniq, "s": sums})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    by_g = parts.groupby("g", sort=True)["s"].sum()
    starts = by_g.cumsum().shift(fill_value=0)
    return dict(zip(by_g.index.astype(int), starts.astype(int))), \
        int(by_g.sum())


def pack_windows(ds, id_col: str, count_col: str, window: int,
                 group_size: int = 4096):
    """Concat-and-chunk packing: documents are laid out end-to-end in
    ``id_col`` order; training windows are the ``window``-sized cuts of
    that stream. Emits per doc: ``offset`` (global start token),
    ``first_window`` / ``last_window`` (ids of the windows the doc
    spans), ``n_windows``. Exact SQL twin::

        SUM(cnt) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)  -- offset
        offset // window, (offset + cnt - 1) // window

    Two phases: small driver reduce of per-group totals, then one hash
    shuffle on the group key to order rows within each group."""
    if window <= 0:
        raise ValueError("window must be positive")
    offsets, _total = _group_token_offsets(ds, id_col, count_col,
                                           group_size)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort", ignore_index=True)
        n = g[count_col].to_numpy(np.int64)
        gid = int(g[id_col].iloc[0]) // group_size
        off = offsets[gid] + np.concatenate(([0], np.cumsum(n[:-1])))
        g = g[[id_col, count_col]].copy()
        g["offset"] = off
        g["first_window"] = off // window
        g["last_window"] = np.maximum(off + n - 1, off) // window
        g["n_windows"] = g["last_window"] - g["first_window"] + 1
        return g

    keyed = ds.map_batches(
        lambda t: t.append_column(
            "_pack_group",
            pa.array(t[id_col].to_numpy(zero_copy_only=False)
                     // group_size)),
        batch_format="pyarrow")
    out = keyed.groupby("_pack_group").map_groups(
        assign, batch_format="pandas")
    return out


def pack_bins(ds, id_col: str, count_col: str, capacity: int,
              group_size: int = 4096):
    """No-splitting variant: next-fit bin packing in id order WITHIN
    each fixed ``group_size`` id range (deterministic and distributed —
    one shuffle on the group key; bins never cross groups, the
    real-world shard-local packing discipline). Docs larger than
    ``capacity`` get a dedicated bin with ``oversize=True``. Bin ids
    are ``group * group_size + local`` so they are globally unique and
    layout-stable."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort", ignore_index=True)
        n = g[count_col].to_numpy(np.int64)
        gid = int(g[id_col].iloc[0]) // group_size
        local = np.zeros(len(g), np.int64)
        fill = 0
        cur = 0
        for i, cnt in enumerate(n):  # sequential by definition of
            # next-fit; group_size bounds the loop (never corpus-sized)
            if fill > 0 and fill + cnt > capacity:
                cur += 1
                fill = 0
            local[i] = cur
            fill += cnt
            if cnt > capacity:  # oversize doc: close its bin immediately
                cur += 1
                fill = 0
        out = g[[id_col, count_col]].copy()
        out["bin_id"] = gid * group_size + local
        out["oversize"] = n > capacity
        return out

    keyed = ds.map_batches(
        lambda t: t.append_column(
            "_pack_group",
            pa.array(t[id_col].to_numpy(zero_copy_only=False)
                     // group_size)),
        batch_format="pyarrow")
    return keyed.groupby("_pack_group").map_groups(
        pack, batch_format="pandas")


# ------------------------------------------------- quality classifier


QUALITY_FEATURES = ["n_tokens", "mean_token_len", "stopword_ratio",
                    "unique_ratio"]


def train_quality_classifier(ds, labels: pd.DataFrame,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             label_col: str = "label",
                             **gbt_params) -> tuple[dict, dict]:
    """Train a document-quality classifier (the GPT-3 appendix-A /
    CCNet "quality filter" shape: a small model scoring documents by
    surface features) over the :mod:`textstats` feature set, using the
    repo's distributed GBT (:func:`ops.dfa_train.fit_gbt`).

    ``labels`` is a (id, label) seed frame (two classes). Features are
    computed distributed; only seed rows train (broadcast id->label
    lookup). Returns (TrainedModelDefinition dict, meta)."""
    from elasticsearch_ray.ops.dfa_train import fit_gbt
    from elasticsearch_ray.ops.textstats import TextQuality

    lab = dict(zip(labels[id_col].astype(np.int64),
                   labels[label_col].astype(str)))

    def featurize(batch: pa.Table) -> pa.Table:
        feats = TextQuality(text_col, id_col)(batch)
        ids = feats[id_col].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, list(lab))
        feats = feats.filter(pa.array(keep))
        y = [lab[int(i)] for i in
             feats[id_col].to_numpy(zero_copy_only=False)]
        return feats.append_column(label_col, pa.array(y))

    train = ds.map_batches(featurize, batch_format="pyarrow")
    params = {"max_trees": 10, "max_depth": 3, "num_bins": 32,
              **gbt_params}
    return fit_gbt(train, QUALITY_FEATURES, label_col,
                   objective="binary_logloss", **params)


def score_quality(ds, definition: dict, text_col: str = "text",
                  id_col: str = "doc_id",
                  prob_col: str = "quality_prob",
                  positive_label: str | None = None):
    """Attach P(positive class) per doc — features computed and scored
    in the same batch, source columns passed through."""
    from elasticsearch_ray.ops.inference import TrainedModelDefinition
    from elasticsearch_ray.ops.textstats import TextQuality

    model = TrainedModelDefinition(definition)
    labels = model.model.classification_labels
    if len(labels) != 2:
        raise ValueError("score_quality expects a binary model")
    pos = positive_label if positive_label is not None else labels[-1]

    def score(batch: pa.Table) -> pa.Table:
        feats = TextQuality(text_col, id_col)(batch).to_pandas()
        res = model.infer(feats)
        p_best = res["prediction_probability"]
        # binary: P(pos) is p when pos was predicted, else 1-p
        p_pos = np.where(res["predicted_value"] == pos,
                         p_best, 1.0 - p_best)
        return batch.append_column(prob_col,
                                   pa.array(p_pos.astype(np.float64)))

    return ds.map_batches(score, batch_format="pyarrow")


def quality_filter(ds, definition: dict, threshold: float = 0.5,
                   **score_kwargs):
    """Keep docs with P(positive) >= threshold (streaming filter)."""
    scored = score_quality(ds, definition, **score_kwargs)
    prob_col = score_kwargs.get("prob_col", "quality_prob")

    def keep(batch: pa.Table) -> pa.Table:
        p = batch[prob_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(p >= threshold))

    return scored.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------- redaction

# RE2-compatible (no lookaround/backrefs) so DuckDB regexp_replace(.., 'g')
# is an exact twin. Order matters: applied top to bottom.
DEFAULT_PII_RULES: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
]


def hash_split(ds, id_col: str,
               splits: dict[str, float] | None = None, salt: str = "",
               out_col: str = "split"):
    """Deterministic train/valid/test assignment — the standard
    stable-split rule of LM data pipelines: band = md5(salt + id) mod
    10000 against cumulative split fractions. Properties the pipelines
    rely on: (1) assignment is a pure function of the id (re-runs,
    re-partitioning, appends never move a document between splits);
    (2) salt gives independent re-splits; (3) md5 makes it
    cross-language reproducible (and exactly SQL-twin-able, unlike
    Python's process-salted hash()).

    Streaming narrow transform; hashing is hashlib-C per row."""
    import hashlib

    splits = splits or {"train": 0.9, "valid": 0.05, "test": 0.05}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    names = list(splits)
    bounds = []
    acc = 0.0
    for n in names:
        acc += splits[n]
        bounds.append(int(round(acc * 10000)))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].astype(str)
        bands = np.fromiter(
            (int(hashlib.md5((salt + i).encode()).hexdigest()[:8], 16)
             % 10000 for i in ids), np.int64, len(ids))
        out = np.empty(len(ids), object)
        lo = 0
        for name, hi in zip(names, bounds):
            out[(bands >= lo) & (bands < hi)] = name
            lo = hi
        df = df.copy()
        df[out_col] = out
        return df

    return ds.map_batches(assign, batch_format="pandas")


def hash_split_sql_expr(col: str, splits: dict[str, float] | None = None,
                        salt: str = "") -> str:
    """DuckDB twin of :func:`hash_split`: same md5-prefix band and the
    same cumulative CASE ladder."""
    splits = splits or {"train": 0.9, "valid": 0.05, "test": 0.05}
    band = (f"(('0x' || substr(md5('{salt}' || CAST({col} AS VARCHAR)),"
            f" 1, 8))::BIGINT % 10000)")
    acc = 0.0
    cases = []
    names = list(splits)
    for n in names[:-1]:
        acc += splits[n]
        cases.append(f"WHEN {band} < {int(round(acc * 10000))} "
                     f"THEN '{n}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def redact_pii(ds, text_col: str, rules: list[tuple[str, str]] | None = None,
               out_col: str | None = None):
    """Replace PII-shaped spans with ``<NAME>`` tags (ES `redact`
    processor shape). ``rules`` is an ordered list of
    ``(tag, re2_pattern)``; each is applied globally in order. Patterns
    are compiled once per worker (module-level cache), the replace is
    pandas-vectorized."""
    rules = list(DEFAULT_PII_RULES if rules is None else rules)
    out_col = out_col or text_col
    compiled = [(f"<{tag}>", re.compile(pat)) for tag, pat in rules]

    def redact(df: pd.DataFrame) -> pd.DataFrame:
        # "string" dtype keeps nulls null ("str" would stringify them to
        # the literal "None", which the regexp_replace SQL twin never
        # produces)
        s = df[text_col].astype("string")
        for repl, rx in compiled:
            s = s.str.replace(rx, repl, regex=True)
        df = df.copy()
        df[out_col] = s
        return df

    return ds.map_batches(redact, batch_format="pandas")


def pii_sql_expr(col: str, rules: list[tuple[str, str]] | None = None) -> str:
    """The DuckDB twin of :func:`redact_pii`: nested
    ``regexp_replace(.., 'g')`` in the same rule order."""
    rules = list(DEFAULT_PII_RULES if rules is None else rules)
    expr = col
    for tag, pat in rules:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '<{tag}>', 'g')"
    return expr


# ------------------------------------------------- hard-negative mining

def mine_hard_negatives(engine, queries: list[tuple], k: int = 5,
                        overfetch: int = 50) -> pd.DataFrame:
    """BM25 hard negatives for retrieval training data (the DPR recipe,
    Karpukhin et al. EMNLP'20 §4.2: negatives = "top passages returned by
    BM25" that are not the labeled positive). ``queries`` is
    ``[(qid, query_text, positive_doc_id)]``; returns one frame
    ``(qid, rank, doc_id, score)`` with the positive excluded and ranks
    re-assigned 1..k on (rounded score desc, doc_id) — the same tie
    discipline the oracle twins use.

    Scale shape: each query is ONE distributed top-k over the warm engine
    (BMW-pruned, partition fan-out); the per-query merge frame is k+
    overfetch rows. Mining a large query set would batch through
    ``engine.msearch`` — negatives never materialize the corpus."""
    from elasticsearch_ray.search.query import MatchQuery

    rows = []
    for qid, text, pos in queries:
        hits = engine.search(MatchQuery(text), k=k + 1 + overfetch,
                             fetch=("doc_id",)).to_pandas()
        hits = hits[["doc_id", "score"]]
        hits["score"] = hits["score"].round(4)
        hits = hits[hits["doc_id"] != pos]
        hits = hits.sort_values(["score", "doc_id"],
                                ascending=[False, True]).head(k)
        hits.insert(0, "rank", np.arange(1, len(hits) + 1, dtype=np.int64))
        hits.insert(0, "qid", qid)
        rows.append(hits)
    return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
        columns=["qid", "rank", "doc_id", "score"])


# ------------------------------------------------- fill-in-the-middle


def fim_transform(ds, text_col: str, id_col: str, rate: float = 0.5,
                  mode: str = "psm", seed: int = 0,
                  out_col: str = "fim",
                  pre_tok: str = "<PRE>", mid_tok: str = "<MID>",
                  suf_tok: str = "<SUF>"):
    """Fill-in-the-middle data transform (Bavarian et al. 2022,
    arXiv:2207.14255 "Efficient Training of Language Models to Fill in
    the Middle", §2 + Fig. 1): split each selected document into
    (prefix, middle, suffix) at two uniform character positions and emit
    the sentinel-delimited reordering —

    - ``psm``:  ``<PRE> prefix <SUF> suffix <MID> middle``
    - ``spm``:  ``<PRE> <SUF> suffix <MID> prefix middle`` (the paper's
      joined SPM variant, §4/D.2: prefix follows the middle sentinel so
      prefix+middle is one contiguous span)

    Documents are selected at ``rate`` (the paper applies FIM to a
    random document fraction; 0.5/0.9 in their ablations) and both the
    selection and the split points come from the repo's deterministic
    Knuth multiplicative hash of ``(id, seed)`` — layout-independent,
    reproducible, and exactly expressible in a SQL twin:

        apply   iff ((id + seed) * 2654435761) mod 2^32 < rate·2^32
        cut_i = (((id·2 + i) * 2654435761) mod 2^32) mod (len + 1)

    with ``(lo, hi) = sorted(cut_1, cut_2)``. Unselected docs pass
    through unchanged. One vectorized map_batches pass."""
    if mode not in ("psm", "spm"):
        raise ValueError(f"unknown FIM mode {mode!r}")
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    thr = np.uint64(min(int(rate * 4294967296.0), 2**32))
    s = np.uint64(seed)

    def transform(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        texts = batch[text_col].to_pylist()
        lens = np.array([len(t or "") for t in texts], np.uint64)
        apply = ((ids + s) * _KNUTH) % _MOD32 < thr
        c1 = ((ids * np.uint64(2) + np.uint64(1)) * _KNUTH) % _MOD32 \
            % (lens + np.uint64(1))
        c2 = ((ids * np.uint64(2) + np.uint64(2)) * _KNUTH) % _MOD32 \
            % (lens + np.uint64(1))
        lo = np.minimum(c1, c2).astype(np.int64)
        hi = np.maximum(c1, c2).astype(np.int64)
        out = []
        for i, t in enumerate(texts):
            t = t or ""
            if not apply[i]:
                out.append(t)
                continue
            p, m, x = t[:lo[i]], t[lo[i]:hi[i]], t[hi[i]:]
            if mode == "psm":
                out.append(f"{pre_tok}{p}{suf_tok}{x}{mid_tok}{m}")
            else:
                out.append(f"{pre_tok}{suf_tok}{x}{mid_tok}{p}{m}")
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(transform, batch_format="pyarrow")


# --------------------------------------------------- span corruption


def span_corruption(ds, text_col: str, id_col: str,
                    noise_density: float = 0.15,
                    mean_span_length: float = 3.0, seed: int = 0,
                    inputs_col: str = "inputs",
                    targets_col: str = "targets"):
    """T5 span-corruption objective as a data transform (Raffel et al.
    2020, JMLR 21(140) §3.1.4 and the t5 codebase's
    ``random_spans_noise_mask``): per document,

        num_noise = clamp(round(n · density), 1, n − 1)
        num_spans = max(1, round(num_noise / mean_span_length))

    noise tokens are segmented into ``num_spans`` spans and non-noise
    tokens into ``num_spans`` runs, interleaved ``[run_0, span_0, …]``;
    each noise span is replaced by ``<extra_id_k>`` in ``inputs`` and
    emitted after its sentinel in ``targets`` (terminated by the final
    sentinel — the T5 preprocessing convention).

    Where T5 segments RANDOMLY, this op draws the two break-point
    subsets from the repo's deterministic Knuth hash stream
    ``h(i) = ((id·1000003 + seed·65537 + i) · 2654435761) mod 2^32``:
    the ``k−1`` smallest hashes over the ``m−1`` interior positions mark
    the breaks (a deterministic without-replacement sample, exactly the
    permutation trick of the original implementation). Layout- and
    run-independent; docs with fewer than 2 whitespace tokens pass
    through unchanged (inputs = text, empty targets). Tokens are
    whitespace-split, consistent with the engine's LM ops."""
    if not 0.0 < noise_density < 1.0:
        raise ValueError("noise_density must be in (0, 1)")
    if mean_span_length <= 0:
        raise ValueError("mean_span_length must be positive")

    def _breaks(doc_id: int, m: int, k: int, lane: int) -> np.ndarray:
        """k-1 deterministic break positions among 1..m-1 (sorted)."""
        if k <= 1 or m <= 1:
            return np.empty(0, np.int64)
        i = np.arange(1, m, dtype=np.uint64)
        h = ((np.uint64(doc_id) * np.uint64(1000003)
              + np.uint64(seed) * np.uint64(65537)
              + np.uint64(lane) * np.uint64(97) + i)
             * _KNUTH) % _MOD32
        # ties broken by position — argsort is total
        return np.sort(i[np.argsort(h, kind="stable")[:k - 1]]
                       .astype(np.int64))

    def _segment(doc_id: int, total: int, k: int, lane: int) -> np.ndarray:
        """Segment ``total`` items into ``k`` positive-length runs."""
        b = _breaks(doc_id, total, k, lane)
        edges = np.r_[0, b, total]
        return np.diff(edges)

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        inputs, targets = [], []
        for doc_id, text in zip(df[id_col], df[text_col]):
            toks = (text or "").split()
            n = len(toks)
            if n < 2:
                inputs.append(text or "")
                targets.append("")
                continue
            num_noise = int(round(n * noise_density))
            num_noise = min(max(num_noise, 1), n - 1)
            num_spans = max(1, int(round(num_noise / mean_span_length)))
            num_spans = min(num_spans, num_noise, n - num_noise)
            noise_lens = _segment(int(doc_id), num_noise, num_spans, 1)
            keep_lens = _segment(int(doc_id), n - num_noise, num_spans, 2)
            inp, tgt = [], []
            pos = 0
            for s in range(num_spans):
                kl, nl = int(keep_lens[s]), int(noise_lens[s])
                inp.extend(toks[pos:pos + kl])
                pos += kl
                inp.append(f"<extra_id_{s}>")
                tgt.append(f"<extra_id_{s}>")
                tgt.extend(toks[pos:pos + nl])
                pos += nl
            inp.extend(toks[pos:])
            tgt.append(f"<extra_id_{num_spans}>")
            inputs.append(" ".join(inp))
            targets.append(" ".join(tgt))
        out = df.copy()
        out[inputs_col] = inputs
        out[targets_col] = targets
        return out

    return ds.map_batches(transform, batch_format="pandas")


def prefix_lm_split(ds, text_col: str, id_col: str, seed: int = 0,
                    min_prefix: float = 0.25, max_prefix: float = 0.75,
                    inputs_col: str = "inputs",
                    targets_col: str = "targets"):
    """Prefix-LM split — the S-denoiser of UL2's mixture-of-denoisers
    (Tay et al. 2023, arXiv:2205.05131 §3.1; also T5's prefix-LM
    baseline, Raffel et al. 2020 §3.2.1): cut each document at one
    position and predict the suffix from the prefix.

    The cut lands at a deterministic Knuth-hash character position
    uniform over ``[min_prefix·len, max_prefix·len]``:

        u   = ((id·3 + 1 + seed) · 2654435761) mod 2^32
        cut = floor(min_prefix·len) + u mod (floor(max_prefix·len)
              − floor(min_prefix·len) + 1)

    — layout-independent and exactly replayable in a SQL twin with
    substr. One vectorized map_batches pass."""
    if not 0.0 <= min_prefix <= max_prefix <= 1.0:
        raise ValueError("need 0 <= min_prefix <= max_prefix <= 1")
    s = np.uint64(seed)

    def transform(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        texts = batch[text_col].to_pylist()
        lens = np.array([len(t or "") for t in texts], np.int64)
        lo = np.floor(min_prefix * lens).astype(np.int64)
        hi = np.floor(max_prefix * lens).astype(np.int64)
        u = ((ids * np.uint64(3) + np.uint64(1) + s) * _KNUTH) % _MOD32
        cut = lo + (u % (hi - lo + 1).astype(np.uint64)).astype(np.int64)
        pre = [(t or "")[:c] for t, c in zip(texts, cut)]
        suf = [(t or "")[c:] for t, c in zip(texts, cut)]
        return (batch.append_column(inputs_col, pa.array(pre, pa.string()))
                .append_column(targets_col, pa.array(suf, pa.string())))

    return ds.map_batches(transform, batch_format="pyarrow")


# ------------------------------------------------- URL blocklist filter

_HOST_RE = r"^(?:[a-z][a-z0-9+.\-]*://)?(?:[^/@]*@)?([^/:?#]+)"


def url_host(urls: pd.Series) -> pd.Series:
    """Host extraction (scheme/userinfo stripped, lowercase, no
    port/path) — the normalization every URL blocklist applies."""
    return (urls.astype(str).str.lower()
            .str.extract(_HOST_RE, expand=False).fillna(""))


def url_blocklist_filter(ds, url_col: str, blocked: set,
                         mode: str = "registered_domain"):
    """Drop documents whose URL is on a blocklist — the standard
    web-corpus domain filter (the UT1/Blacklists-style category lists
    used by RefinedWeb §3.1 and the Dolma URL filters). ``mode``:

    - ``registered_domain`` (default): block by eTLD+1 (the PSL rule of
      ops.processors.RegisteredDomainProcessor), so every subdomain of
      a blocked domain is blocked too — how the published filters work;
    - ``host``: exact-host matching only.

    The blocklist is closure-captured (broadcast once per worker);
    filtering is a streaming narrow transform."""
    if mode not in ("registered_domain", "host"):
        raise ValueError(f"unknown blocklist mode {mode!r}")
    blocked = {b.lower().rstrip(".") for b in blocked}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        hosts = url_host(df[url_col])
        if mode == "host":
            m = ~hosts.isin(blocked).to_numpy()
            return df[m]
        from elasticsearch_ray.ops.processors import (
            RegisteredDomainProcessor,
        )

        tmp = pd.DataFrame({"_host": hosts})
        rd_ = RegisteredDomainProcessor("_host", "_rd")(tmp)["_rd"]
        m = ~(hosts.isin(blocked) | rd_.isin(blocked)).to_numpy()
        return df[m]

    return ds.map_batches(keep, batch_format="pandas")


# ------------------------------------- replaced-token detection (RTD)

def rtd_transform(ds, text_col: str, id_col: str, vocab: list,
                  replace_rate: float = 0.15, seed: int = 0,
                  corrupted_col: str = "corrupted",
                  labels_col: str = "labels"):
    """ELECTRA replaced-token-detection data prep (Clark et al. 2020,
    arXiv:2003.10555 §2): corrupt ~``replace_rate`` of each document's
    tokens by substituting a plausible token, and emit per-token 0/1
    labels (1 = replaced) for the discriminator. The paper's generator
    is a trained MLM; this op's stand-in samples the replacement from a
    corpus ``vocab`` list (build it from
    ``ops.bpe.word_frequencies(...).head(K)``) through the repo's
    deterministic Knuth hash stream — position selection AND
    replacement choice are pure functions of (id, seed), so runs and
    repartitions reproduce bit-for-bit. The paper's own rule applies:
    a sampled replacement equal to the original token is labeled 0
    ("the generator happens to produce the correct token").

    The vocab list is closure-captured (broadcast once); streaming
    narrow transform."""
    if not 0.0 < replace_rate < 1.0:
        raise ValueError("replace_rate must be in (0, 1)")
    if not vocab:
        raise ValueError("vocab must be non-empty")
    vocab = [str(v) for v in vocab]
    nv = np.uint64(len(vocab))

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        corr, labs = [], []
        for doc_id, text in zip(df[id_col], df[text_col]):
            # NaN text cells are truthy floats — isinstance guards them
            # (review r5d #6)
            toks = text.split() if isinstance(text, str) else []
            n = len(toks)
            if n == 0:
                corr.append(text if isinstance(text, str) else "")
                labs.append([])
                continue
            i = np.arange(n, dtype=np.uint64)
            h = ((np.uint64(int(doc_id)) * np.uint64(1000003)
                  + np.uint64(seed) * np.uint64(65537) + i)
                 * _KNUTH) % _MOD32
            k = max(1, int(round(n * replace_rate)))
            # the k smallest hashes are the corruption positions — a
            # deterministic without-replacement sample
            pos = np.sort(np.argsort(h, kind="stable")[:k])
            out = list(toks)
            lab = np.zeros(n, np.int64)
            for p in pos.tolist():
                rep = vocab[int((h[p] * np.uint64(2654435761))
                                % _MOD32 % nv)]
                if rep != toks[p]:
                    out[p] = rep
                    lab[p] = 1
            corr.append(" ".join(out))
            labs.append(lab.tolist())
        res = df.copy()
        res[corrupted_col] = corr
        res[labels_col] = labs
        return res

    return ds.map_batches(transform, batch_format="pandas")
