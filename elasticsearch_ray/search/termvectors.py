"""_termvectors / _mtermvectors — per-document term/tf/positions
introspection (reference: `action/termvectors/TermVectorsRequest.java`,
`MultiTermVectorsRequest.java`, with the response assembled by
`index/termvectors/TermVectorsService.java`).

Model parity: when a field does not STORE term vectors, the reference
re-analyzes the document's ``_source`` with the field's analyzer and
generates the vector on the fly (TermVectorsService.generateTermVectors);
term statistics (df, ttf) and field statistics (doc_count, sum_doc_freq,
sum_ttf) always come from the INDEX. This module does exactly that:

- the document text comes from the partition's INPUT lineage via the
  fetch phase's row-group-pushdown reader (the ``_source`` analog —
  O(one row group) per lookup, no whole-column load), or from a
  caller-provided ``doc`` string (the reference's "artificial documents"
  mode: a termvectors request with a ``doc`` body instead of an id);
- term_freq/positions come from re-analysis with the index's analyzer
  (per-language dispatch honored when the index was built with
  ``lang_analyzers``);
- doc_freq/ttf reuse the engine's cached DFS gathers, so they are GLOBAL
  across partitions exactly like dfs=true in the reference;
- consistency with the inverted index (re-analyzed tf == postings tf) is
  pinned by tests/test_termvectors.py.

Everything here is driver-side O(one doc) — no Dataset pass."""

from __future__ import annotations

import numpy as np

from elasticsearch_ray.analysis.analyzers import get_analyzer


def _source_text(engine, doc_id: int, source_col: str) -> tuple[str, str | None]:
    """(text, lang) of one doc from the partition's INPUT lineage — the
    _source store. Uses the fetch phase's row-group-pushdown reader
    (engine._fetch_source_rows), so the cost is O(one row group), never a
    whole-column load."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.search.engine import _fetch_source_rows

    part, local = engine._locate(int(doc_id))
    s = engine._searcher(part)
    paths = s.r.manifest["input_path"]
    first = paths[0] if isinstance(paths, list) else paths
    avail = set(pq.read_schema(first).names)
    if source_col not in avail:
        raise ValueError(
            f"source column {source_col!r} is not in this index's input "
            "lineage (the _source analog) — derived fields (e.g. text "
            "stripped from html) have no re-analyzable source; pass doc= "
            "for artificial-document term vectors")
    lang_col = engine.spec.get("lang_column", "lang")
    cols = [source_col] + ([lang_col] if lang_col in avail else [])
    t = _fetch_source_rows(s.r.manifest, np.array([local], dtype=np.int64),
                           cols)
    text = t[source_col][0].as_py()
    lang = t[lang_col][0].as_py() if lang_col in t.column_names else None
    return text or "", lang


def _sum_doc_freq(engine) -> int:
    """Σ df over the whole term dictionary (the field_statistics
    sum_doc_freq; includes namespaced extra-field terms). One term-dict
    column scan per partition, cached on the engine."""
    v = getattr(engine, "_sum_doc_freq_cache", None)
    if v is None:
        v = sum(int(engine._searcher(p).r.df.sum()) for p in engine.parts)
        engine._sum_doc_freq_cache = v
    return v


def _apply_tv_filter(engine, terms: dict, flt: dict) -> dict:
    """TermVectorsFilter (index/termvectors/TermVectorsFilter.java): keep
    only "interesting" terms — bounded by word length / term freq / doc
    freq, ranked by the MLT-style tf·idf score, cut to max_num_terms.
    Adds a ``score`` to every surviving term."""
    allowed = {"max_num_terms", "min_term_freq", "max_term_freq",
               "min_doc_freq", "max_doc_freq", "min_word_length",
               "max_word_length"}
    unknown = set(flt) - allowed
    if unknown:
        raise ValueError(f"unknown termvectors filter option(s) {sorted(unknown)}; "
                         f"allowed: {sorted(allowed)}")
    tl = sorted(terms)
    df = engine._global_stats(tl)
    n = max(engine.n_docs, 1)
    out = {}
    for t in tl:
        e = terms[t]
        tf = e["term_freq"]
        d = df[t]
        if tf < flt.get("min_term_freq", 1):
            continue
        if tf > flt.get("max_term_freq", 2 ** 31):
            continue
        if d < flt.get("min_doc_freq", 1):
            continue
        if d > flt.get("max_doc_freq", 2 ** 31):
            continue
        if len(t) < flt.get("min_word_length", 0):
            continue
        if len(t) > flt.get("max_word_length", 2 ** 31):
            continue
        # the reference scores candidates with the MLT similarity:
        # tf · idf, idf = 1 + ln(N / (df + 1))
        out[t] = dict(e, score=round(tf * (1.0 + np.log(n / (d + 1.0))), 6))
    k = flt.get("max_num_terms")
    if k is not None and len(out) > k:
        top = sorted(out.items(), key=lambda kv: (-kv[1]["score"], kv[0]))[:k]
        out = dict(top)
    return out


def termvectors(engine, doc_id: int | None = None, doc: str | None = None,
                positions: bool = True, term_statistics: bool = False,
                field_statistics: bool = False, analyzer: str | None = None,
                source_col: str = "text",
                filter: dict | None = None) -> dict:
    """One document's term vector: {term: {term_freq, positions[,
    doc_freq, ttf, score]}} (+ field_statistics). Exactly one of
    ``doc_id`` / ``doc`` must be given. ``filter`` applies the
    TermVectorsFilter options (max_num_terms, min/max_term_freq,
    min/max_doc_freq, min/max_word_length) with tf·idf ranking."""
    if (doc_id is None) == (doc is None):
        raise ValueError("exactly one of doc_id / doc is required")
    lang = None
    if doc is None:
        if not (0 <= int(doc_id) < engine.n_docs):
            # the reference's TermVectorsResponse for a missing doc:
            # found=false, no terms (ADVICE r4 — was hardcoded found=True
            # with an IndexError deeper in)
            return {"doc_id": doc_id, "found": False, "terms": {}}
        text, lang = _source_text(engine, doc_id, source_col)
    else:
        text = doc
    if analyzer is None:
        analyzer = engine.analyzer_name
        la = engine.spec.get("lang_analyzers")
        if la and lang is not None:
            analyzer = la.get(lang, analyzer)
    toks, poss = get_analyzer(analyzer)(text)
    terms: dict = {}
    for tok, p in zip(toks, poss):
        e = terms.setdefault(tok, {"term_freq": 0, "positions": []})
        e["term_freq"] += 1
        e["positions"].append(int(p))
    if not positions:
        for e in terms.values():
            del e["positions"]
    if filter:
        terms = _apply_tv_filter(engine, terms, filter)
    if term_statistics:
        tl = sorted(terms)
        df = engine._global_stats(tl)
        ttf = engine._global_ttf(tl)
        for t in tl:
            terms[t]["doc_freq"] = int(df[t])
            terms[t]["ttf"] = int(ttf[t])
    out = {"doc_id": doc_id, "found": True, "terms": terms}
    if field_statistics:
        out["field_statistics"] = {
            "doc_count": int(engine.n_docs),
            "sum_ttf": int(engine.meta["sum_dl"]),
            "sum_doc_freq": _sum_doc_freq(engine),
        }
    return out


def mtermvectors(engine, doc_ids, **kw) -> list[dict]:
    """_mtermvectors: one termvectors() response per id, in order
    (MultiTermVectorsRequest is a flat fan-out of singles)."""
    return [termvectors(engine, doc_id=d, **kw) for d in doc_ids]


def termvectors_table(engine, doc_ids, **kw):
    """Tabular projection for oracle comparison: (doc_id, term, term_freq,
    positions) rows, positions comma-joined ascending, ordered (doc_id,
    term)."""
    import pyarrow as pa

    rows_doc, rows_term, rows_tf, rows_pos = [], [], [], []
    for d in doc_ids:
        tv = termvectors(engine, doc_id=d, positions=True, **kw)
        for term in sorted(tv["terms"]):
            e = tv["terms"][term]
            rows_doc.append(int(d))
            rows_term.append(term)
            rows_tf.append(int(e["term_freq"]))
            rows_pos.append(",".join(str(p) for p in sorted(e["positions"])))
    return pa.table({
        "doc_id": pa.array(rows_doc, pa.int64()),
        "term": pa.array(rows_term),
        "term_freq": pa.array(rows_tf, pa.int64()),
        "positions": pa.array(rows_pos),
    })
