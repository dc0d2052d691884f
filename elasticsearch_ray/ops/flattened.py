"""``flattened`` field type (x-pack flattened mapper).

Reference semantics (all public, ``x-pack/plugin/mapper-flattened`` —
``FlattenedFieldMapper.java``, ``FlattenedFieldParser.java``):

- one mapped field ingests a whole JSON object; every LEAF value is
  indexed twice as keywords: under the root field (value alone) and
  under the keyed form (``key\\0value``), so both ``field: v`` and
  ``field.key: v`` term queries work;
- keys of nested objects join with ``.`` (``a.b``); array elements index
  individually; ``null`` leaves are skipped; every value is indexed as
  its STRING form (numbers/booleans stringified — the field is a
  keyword family, so ranges order lexicographically);
- ``depth_limit`` caps object nesting (default 20), ``ignore_above``
  drops over-long values.

Ray-Data shape: parsing is a per-batch pass at INGEST granularity (JSON
decode is inherently per-object; the decoded leaf table is vectorized
from there on). Query helpers emit plain Dataset filters; the leaf
extraction can also be materialized once into a (row, key, value) leaf
table for repeated querying — the analog of the mapper's indexed terms.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ray.data import Dataset


def _leaves(obj, prefix: str, depth: int, depth_limit: int, out: list):
    if depth > depth_limit:
        raise ValueError(
            f"The provided object's depth exceeds the maximum allowed "
            f"[{depth_limit}]")
    if isinstance(obj, dict):
        for k, v in obj.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            _leaves(v, key, depth + 1, depth_limit, out)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _leaves(v, prefix, depth, depth_limit, out)
    elif obj is None:
        return
    elif isinstance(obj, bool):
        out.append((prefix, "true" if obj else "false"))
    else:
        # the reference indexes the source TOKEN text (parser.text()):
        # ints stay "87", floats keep their decimal form "5.0"
        out.append((prefix, str(obj)))


def parse_flattened(raw: str | dict | None, depth_limit: int = 20,
                    ignore_above: int | None = None) -> list[tuple[str, str]]:
    """One object → its (key, value-string) leaf pairs
    (FlattenedFieldParser#parse)."""
    if raw is None:
        return []
    obj = json.loads(raw) if isinstance(raw, str) else raw
    out: list[tuple[str, str]] = []
    _leaves(obj, "", 0, depth_limit, out)
    if ignore_above is not None:
        out = [(k, v) for k, v in out if len(v) <= ignore_above]
    return out


def flattened_leaf_table(ds: Dataset, col: str, id_col: str,
                         depth_limit: int = 20,
                         ignore_above: int | None = None) -> Dataset:
    """Materialize the indexed-terms analog: one (id, key, value) row per
    leaf. Repeated queries then run vectorized string compares over this
    table instead of re-parsing JSON."""
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, keys, vals = [], [], []
        for rid, raw in zip(df[id_col], df[col]):
            for k, v in parse_flattened(raw, depth_limit, ignore_above):
                ids.append(rid)
                keys.append(k)
                vals.append(v)
        return pd.DataFrame({id_col: np.asarray(ids),
                             "key": keys, "value": vals})

    return ds.map_batches(explode, batch_format="pandas")


def _match_mask(df: pd.DataFrame, col: str, key: str | None, pred,
                depth_limit: int, ignore_above: int | None) -> np.ndarray:
    mask = np.zeros(len(df), bool)
    for i, raw in enumerate(df[col]):
        for k, v in parse_flattened(raw, depth_limit, ignore_above):
            if (key is None or k == key) and pred(v):
                mask[i] = True
                break
    return mask


def flattened_filter(ds: Dataset, col: str, value: str | None = None,
                     key: str | None = None, op: str = "term",
                     to: str | None = None, depth_limit: int = 20,
                     ignore_above: int | None = None) -> Dataset:
    """Filter docs by a flattened-field predicate. ``key=None`` is the
    root-field form (any leaf value matches); ``op`` in:

    - ``term``  — value equality (keyword semantics)
    - ``prefix`` — value startswith
    - ``exists`` — any leaf present (keyed: that key present)
    - ``range`` — lexicographic [value, to] inclusive (keyword order,
      like the reference's flattened range queries)
    """
    if op == "term":
        def pred(v, q=str(value)):
            return v == q
    elif op == "prefix":
        def pred(v, q=str(value)):
            return v.startswith(q)
    elif op == "exists":
        def pred(v):
            return True
    elif op == "range":
        lo, hi = value, to

        def pred(v, lo=lo, hi=hi):
            return (lo is None or v >= lo) and (hi is None or v <= hi)
    else:
        raise ValueError(f"unknown op {op!r}")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[_match_mask(df, col, key, pred, depth_limit,
                              ignore_above)]

    return ds.map_batches(keep, batch_format="pandas")
