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


# ------------------------------------------------------------- redaction

# RE2-compatible (no lookaround/backrefs) so DuckDB regexp_replace(.., 'g')
# is an exact twin. Order matters: applied top to bottom.
DEFAULT_PII_RULES: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
]


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
