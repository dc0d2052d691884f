"""``frequent_item_sets`` aggregation (SURVEY beyond-§2 — x-pack ML:
``FrequentItemSetsAggregationBuilder.java``, ``mining/EclatMapper``; the
published agg contract: minimum_support, minimum_set_size, size, CLOSED
frequent item sets ranked by doc_count).

Distributed Apriori over a Ray Dataset whose ``items_col`` holds each
transaction's item list:

- pass 0: transaction count (streaming count);
- pass k: per-batch candidate generation RESTRICTED to the broadcast
  frequent (k-1)-sets (the Apriori downward-closure prune), emitting
  (itemset-key, 1) partials that one map-side-combined groupby-count
  reduces — the only shuffles are itemset-count-sized, never
  transaction-sized;
- survivors with support >= ceil(minimum_support * n) seed the next pass.

The reference returns CLOSED sets (no superset with equal doc_count) —
applied as a driver-side post-filter over the (small) frequent-set list.
``closed=False`` returns every frequent set (the SQL-oracle-friendly
shape — closedness is pinned by pytest instead).
"""

from __future__ import annotations

import math
from itertools import combinations

import pandas as pd
import pyarrow as pa

SEP = "\x1f"


def _pass_counts(ds, items_col: str, k: int, allowed: frozenset | None):
    """One Apriori pass: per-batch k-subset generation (pruned so every
    (k-1)-subset is frequent), then a map-side-combined groupby count.
    The ``allowed`` set and its item universe ride in the CLOSURE — Ray
    ships them once per worker with the function, a broadcast, not a
    per-batch re-send."""
    allowed_items = (frozenset(i for key in allowed
                               for i in key.split(SEP))
                     if allowed is not None else None)

    def gen(batch: pa.Table, _allowed=allowed,
            _items=allowed_items) -> pa.Table:
        keys: dict[str, int] = {}
        for items in batch[items_col].to_pylist():
            if not items:
                continue
            uniq = sorted(set(items))
            if _items is not None:
                # downward closure: only items that appear in SOME
                # frequent (k-1)-set can be part of a frequent k-set
                uniq = [i for i in uniq if i in _items]
            for combo in combinations(uniq, k):
                if _allowed is not None and any(
                        SEP.join(sub) not in _allowed
                        for sub in combinations(combo, k - 1)):
                    continue
                key = SEP.join(combo)
                keys[key] = keys.get(key, 0) + 1
        return pa.table({"key": pa.array(list(keys), pa.string()),
                         "n": pa.array(list(keys.values()), pa.int64())})

    from ray.data.aggregate import Sum

    out = (ds.select_columns([items_col])
           .map_batches(gen, batch_format="pyarrow")
           .groupby("key").aggregate(Sum("n", alias_name="support"))
           .to_pandas())
    if "key" not in out.columns:
        # a pass can generate zero candidates everywhere (frequent items
        # that never co-occur); Ray's hash groupby then reduces all-empty
        # typed blocks to a SCHEMA-LESS frame (dev-notes zero-schema
        # pitfall) — that's an empty level, not an error
        return {}
    return dict(zip(out["key"], out["support"].astype(int)))


def frequent_item_sets(ds, items_col: str, minimum_support: float = 0.1,
                       minimum_set_size: int = 1, max_set_size: int = 3,
                       size: int = 10, closed: bool = True
                       ) -> pd.DataFrame:
    """Returns ``(items, set_size, doc_count, support)`` ranked the way
    the reference ranks buckets: doc_count desc, then larger sets first,
    then items lexicographically; top ``size`` rows. ``items`` is the
    comma-joined sorted itemset."""
    if not 0 < minimum_support <= 1:
        raise ValueError("minimum_support must be in (0, 1]")
    n = ds.count()
    if n == 0:
        return pd.DataFrame(columns=["items", "set_size", "doc_count",
                                     "support"])
    thresh = max(1, math.ceil(minimum_support * n))
    frequent: dict[str, int] = {}
    allowed: frozenset | None = None
    for k in range(1, max_set_size + 1):
        counts = _pass_counts(ds, items_col, k, allowed)
        level = {key: c for key, c in counts.items() if c >= thresh}
        if not level:
            break
        frequent.update(level)
        allowed = frozenset(level)
    rows = [(key.split(SEP), c) for key, c in frequent.items()
            if len(key.split(SEP)) >= minimum_set_size]
    if closed:
        # closed = no strict superset with the SAME doc_count
        by_count: dict[int, list[frozenset]] = {}
        for its, c in rows:
            by_count.setdefault(c, []).append(frozenset(its))
        rows = [(its, c) for its, c in rows
                if not any(frozenset(its) < other
                           for other in by_count[c])]
    out = pd.DataFrame({
        "items": [",".join(its) for its, _c in rows],
        "set_size": [len(its) for its, _c in rows],
        "doc_count": [c for _its, c in rows],
    })
    out["support"] = out["doc_count"] / n
    out = out.sort_values(["doc_count", "set_size", "items"],
                          ascending=[False, False, True],
                          ignore_index=True)
    return out.head(size).reset_index(drop=True)
