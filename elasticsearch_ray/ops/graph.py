"""Graph explore API (x-pack graph:
``action/TransportGraphExploreAction.java``,
``protocol/xpack/graph/GraphExploreRequest.java`` / ``VertexRequest.java``
/ ``Hop.java``).

Breadth-first term-graph "spidering" over a table:

- hop 0: docs matching the guiding query → per vertex-field term
  buckets (terms or significant_terms); each bucket becomes a vertex
  whose weight is its share of the hop's total signal
  (``getInitialTotalSignalStrength``);
- hop k: docs containing ANY last-wave term (the reference's big OR
  clause) → for every (last-wave term → target-field term) bucket pair
  a connection is created; signal = bucket score / total signal of the
  wave, decayed by ``min(0.95, fromVertex.weight)``; self-joins
  (same field+term) are skipped; an existing target vertex accumulates
  weight, a new one is created (``addAndScoreNewVertices``);
- after each wave the NEW vertices are trimmed per field to the
  request's ``size`` best-by-weight; evicted vertices drop with their
  dangling connections (``trimNewAdditions``);
- exploration stops when a wave adds nothing or ``hops`` are exhausted.

``use_significance=True`` scores buckets with the JLH heuristic against
index-wide background stats (the reference's significant_terms
default); ``False`` scores by doc_count (popularity). Defaults mirror
VertexRequest: size=5, min_doc_count=3.

Distributed shape: every wave is ONE filtered scan of the Dataset —
per-batch pandas partial counts of (last-term, target-term) pairs (a
wave's candidate-pair frame is bounded by |last terms| x field
cardinality, not rows) reduced through a single small Ray
groupby-sum; vertex scoring/trim runs on the driver over bucket-sized
frames, like the reference coordinator. ``sample_size`` (reference
default 100 docs per shard) bounds each wave's doc pool: the first N
matching rows in ``sort_key`` order — deterministic stand-in for the
reference's score-ordered sampler agg.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa

DECAY = 0.95


def _jlh(fg: float, fg_total: float, bg: float, bg_total: float) -> float:
    """JLH significance (reference significant_terms default): requires
    a positive foreground lift; (fgPct - bgPct) * (fgPct / bgPct)."""
    if fg_total <= 0 or bg_total <= 0 or bg <= 0:
        return 0.0
    fg_pct = fg / fg_total
    bg_pct = bg / bg_total
    if fg_pct <= bg_pct:
        return 0.0
    return (fg_pct - bg_pct) * (fg_pct / bg_pct)


def _wave_counts(ds, match_col: str, match_vals, target_fields,
                 sample_size: int | None, sort_key: str | None):
    """One filtered scan: per-batch pandas groupby partials of
    (match value, target field, target value) counts, reduced by a
    single Ray groupby-sum. Returns a small pandas frame."""
    vals = frozenset(match_vals)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[match_col].isin(vals)]
        outs = []
        for tf in target_fields:
            if tf == match_col:
                # same-field hop (term<->term within one column): every
                # doc pairs its value with itself; real co-occurrence
                # needs multi-valued fields, which rows here don't have —
                # keep the diagonal (the caller drops self-joins)
                g = (df.groupby(tf, sort=False).size()
                     .reset_index(name="n"))
                g.insert(0, "from_term", g[tf].astype(str))
                g.columns = ["from_term", "to_term", "n"]
            else:
                g = (df.groupby([match_col, tf], sort=False).size()
                     .reset_index(name="n"))
                g.columns = ["from_term", "to_term", "n"]
            g.insert(1, "to_field", tf)
            outs.append(g)
        out = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            columns=["from_term", "to_field", "to_term", "n"])
        out["from_term"] = out["from_term"].astype(str)
        out["to_term"] = out["to_term"].astype(str)
        out["n"] = out["n"].astype("int64")
        return out

    cols = sorted({match_col, *target_fields,
                   *([sort_key] if sort_key else [])})
    scan = ds.select_columns(cols)
    if sample_size is not None:
        # deterministic sampler-agg stand-in: first N matching rows in
        # sort_key order (the reference keeps the sample_size best-score
        # docs per shard)
        if sort_key is None:
            raise ValueError("sample_size needs sort_key for determinism")
        scan = (scan.map_batches(
                    lambda df: df[df[match_col].astype(str).isin(vals)],
                    batch_format="pandas")
                .sort(sort_key).limit(sample_size))

    from ray.data.aggregate import Sum

    def partial_str(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[match_col] = df[match_col].astype(str)
        return partial(df)

    out = (scan.map_batches(partial_str, batch_format="pandas")
           .groupby(["from_term", "to_field", "to_term"])
           .aggregate(Sum("n", alias_name="doc_count")).to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["from_term", "to_field", "to_term",
                                     "doc_count"])
    return out


def _field_df(ds, fields) -> dict[tuple[str, str], int]:
    """Background doc frequency per (field, value) over the whole table
    (one scan, map-side combined)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for f in fields:
            g = df.groupby(f, sort=False).size().reset_index(name="n")
            g.columns = ["value", "n"]
            g.insert(0, "field", f)
            outs.append(g)
        out = pd.concat(outs, ignore_index=True)
        out["value"] = out["value"].astype(str)
        return out

    from ray.data.aggregate import Sum

    res = (ds.select_columns(sorted(set(fields)))
           .map_batches(partial, batch_format="pandas")
           .groupby(["field", "value"])
           .aggregate(Sum("n", alias_name="df")).to_pandas())
    return {(r.field, r.value): int(r.df) for r in res.itertuples()}


def _fg_totals(counts, hop, lterms, bg, lf, use_significance,
               sample_size) -> dict[str, int]:
    """Foreground totals per from-term for JLH. Unsampled: the full-table
    df (the significant_terms foreground is every doc holding the term).
    Sampled: the term's doc count WITHIN the sample — rows are
    single-valued, so summing its buckets over one target field counts
    each sampled doc exactly once (mixing sampled counts with full-table
    totals would deflate fg_pct and zero most buckets)."""
    if not use_significance:
        return {}
    if sample_size is None:
        return {lt: bg.get((lf, lt), 0) for lt in lterms}
    f0 = hop[0]["field"]
    sub = counts[counts["to_field"] == f0]
    sums = sub.groupby("from_term")["doc_count"].sum()
    return {lt: int(sums.get(lt, 0)) for lt in lterms}


def graph_explore(ds, seed_field: str, seed_values, hops,
                  use_significance: bool = False,
                  sample_size: int | None = None,
                  sort_key: str | None = None,
                  decay: float = DECAY) -> dict:
    """Explore the term graph. ``hops`` is a list of per-hop vertex
    request lists: ``[[{"field": ..., "size": 5, "min_doc_count": 3}],
    ...]`` — hops[0] runs against the seed query, hops[k] against the
    docs of hop k-1's new vertices. Returns ``{"vertices": DataFrame
    (field, term, weight, depth), "connections": DataFrame (from_field,
    from_term, to_field, to_term, weight, doc_count)}`` ranked like the
    reference response (vertices by weight desc)."""
    seed_values = [str(v) for v in seed_values]
    n_total = ds.count()
    all_fields = sorted({vr["field"] for hop in hops for vr in hop})
    bg = _field_df(ds, all_fields + [seed_field]) if use_significance \
        else {}

    vertices: dict[tuple[str, str], dict] = {}
    connections: list[dict] = []

    # ---- hop 0: seed query -> initial vertices
    hop0 = hops[0]
    counts = _wave_counts(ds, seed_field, seed_values,
                          [vr["field"] for vr in hop0],
                          sample_size, sort_key)
    fg_total = None
    if use_significance:
        if sample_size is None:
            fg_total = sum(bg.get((seed_field, v), 0)
                           for v in seed_values)
        else:
            # sampled foreground: docs actually in the sample (see
            # _fg_totals)
            f0 = hop0[0]["field"]
            fg_total = int(counts[counts["to_field"] == f0]
                           ["doc_count"].sum())
    buckets = []
    for vr in hop0:
        f = vr["field"]
        sub = counts[counts["to_field"] == f]
        sub = (sub.groupby("to_term")["doc_count"].sum()
               .reset_index())
        sub = sub[sub["doc_count"] >= vr.get("min_doc_count", 3)]
        if use_significance:
            sub["score"] = [
                _jlh(c, fg_total, bg.get((f, t), 0), n_total)
                for t, c in zip(sub["to_term"], sub["doc_count"])]
            sub = sub[sub["score"] > 0]
        else:
            sub["score"] = sub["doc_count"].astype(float)
        sub = sub.sort_values(["score", "to_term"],
                              ascending=[False, True]) \
            .head(vr.get("size", 5))
        for t, c, s in zip(sub["to_term"], sub["doc_count"], sub["score"]):
            buckets.append((f, t, float(s), int(c)))
    total = sum(s for _f, _t, s, _c in buckets)
    if total <= 0:
        return _result(vertices, connections)
    for f, t, s, c in buckets:
        vertices[(f, t)] = {"field": f, "term": t, "weight": s / total,
                            "depth": 0}
    last_wave = list(vertices.keys())

    # ---- expansion hops
    for hop_no in range(1, len(hops)):
        hop = hops[hop_no]
        by_field: dict[str, list[str]] = {}
        for f, t in last_wave:
            by_field.setdefault(f, []).append(t)
        new_vertices: dict[tuple[str, str], dict] = {}
        new_connections: list[dict] = []
        # per-from-term bucket lists (top size, min_doc_count, self-join
        # excluded) accumulated across ALL from-fields first — the
        # reference normalizes by the WAVE total signal
        # (getExpandTotalSignalStrength spans every lastHop vertex
        # request), not per from-field
        scored = []
        for lf, lterms in by_field.items():
            counts = _wave_counts(ds, lf, lterms,
                                  [vr["field"] for vr in hop],
                                  sample_size, sort_key)
            fg_totals = _fg_totals(counts, hop, lterms, bg, lf,
                                   use_significance, sample_size)
            for vr in hop:
                f = vr["field"]
                sub = counts[counts["to_field"] == f]
                for lt in lterms:
                    b = sub[sub["from_term"] == lt]
                    b = b[~((f == lf) & (b["to_term"] == lt))]
                    b = b[b["doc_count"] >= vr.get("min_doc_count", 3)]
                    if use_significance:
                        ft = fg_totals.get(lt, 0)
                        sc = [_jlh(c, ft, bg.get((f, t), 0), n_total)
                              for t, c in zip(b["to_term"],
                                              b["doc_count"])]
                        b = b.assign(score=sc)
                        b = b[b["score"] > 0]
                    else:
                        b = b.assign(score=b["doc_count"].astype(float))
                    b = b.sort_values(["score", "to_term"],
                                      ascending=[False, True]) \
                        .head(vr.get("size", 5))
                    for t, c, s in zip(b["to_term"], b["doc_count"],
                                       b["score"]):
                        scored.append((lf, lt, f, t, float(s), int(c)))
        total = sum(s for *_x, s, _c in scored)
        if total > 0:
            for lf2, lt, f, t, s, c in scored:
                from_w = vertices[(lf2, lt)]["weight"]
                signal = (s / total) * min(decay, from_w)
                key = (f, t)
                if key in vertices:
                    vertices[key]["weight"] += signal
                elif key in new_vertices:
                    new_vertices[key]["weight"] += signal
                else:
                    new_vertices[key] = {"field": f, "term": t,
                                         "weight": signal,
                                         "depth": hop_no}
                new_connections.append({
                    "from_field": lf2, "from_term": lt,
                    "to_field": f, "to_term": t,
                    "weight": signal, "doc_count": c})
        # trim new vertices per field to the request size by weight
        evicted = set()
        for vr in hop:
            f = vr["field"]
            cand = [(k, v) for k, v in new_vertices.items()
                    if v["field"] == f]
            size = vr.get("size", 5)
            if len(cand) > size:
                cand.sort(key=lambda kv: (-kv[1]["weight"], kv[0][1]))
                for k, _v in cand[size:]:
                    evicted.add(k)
        for k in evicted:
            del new_vertices[k]
        new_connections = [
            c for c in new_connections
            if (c["to_field"], c["to_term"]) not in evicted]
        if not new_vertices:
            break
        vertices.update(new_vertices)
        connections.extend(new_connections)
        last_wave = list(new_vertices.keys())

    return _result(vertices, connections)


def _result(vertices, connections) -> dict:
    v = pd.DataFrame(list(vertices.values()),
                     columns=["field", "term", "weight", "depth"])
    v = v.sort_values(["weight", "field", "term"],
                      ascending=[False, True, True], ignore_index=True)
    c = pd.DataFrame(connections, columns=["from_field", "from_term",
                                           "to_field", "to_term",
                                           "weight", "doc_count"])
    c = c.sort_values(["from_field", "from_term", "to_field", "to_term"],
                      ignore_index=True)
    return {"vertices": v, "connections": c}
