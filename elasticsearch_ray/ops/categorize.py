"""``categorize_text`` aggregation (x-pack ML:
``aggs/categorization/CategorizationTokenTree.java``, ``TreeNode.java``,
``TextCategorization.java``, ``CategorizeTextAggregationBuilder.java`` —
the drain-algorithm variant described in the file header of
CategorizationTokenTree, https://arxiv.org/pdf/1806.04356.pdf).

Semi-structured text is tokenized and grouped into categories:

- a fixed-depth prefix tree keyed first by TOKEN COUNT, then by the
  first ``max_matched_tokens - 1`` token values; inner nodes cap their
  children at ``max_unique_tokens`` and overflow into a ``*`` (wildcard)
  child, evicting the smallest child when a newcomer is bigger
  (TreeNode.addChild);
- leaves hold TextCategorizations: matching a new text picks the
  category with the highest count-weighted similarity (wildcard
  positions excluded from both sides; ties prefer more wildcards) and
  merges when ``similarity * 100 >= similarity_threshold``, turning
  mismatched positions into wildcards (TextCategorization
  calculateSimilarity/addTokens);
- ``collapseTinyChildren`` folds children holding <= 1/max_children of
  a node's count into the wildcard child.

Defaults mirror the builder: ``similarity_threshold=50``,
``max_unique_tokens=50``, ``max_matched_tokens=5``.

Distributed shape (same as the reference's per-shard aggregator +
reduce): every Ray batch builds a LOCAL tree and emits its categories
as (token-pattern, count) partials — a batch-count-bounded frame — and
the driver re-inserts the partials into a final tree (the reduce path
re-parses intermediate buckets through parseTokens), collapses tiny
children, and ranks by doc_count.

Deliberate deviation: the reference tracks each inner node's smallest
child with a stale-tolerant priority queue; children are capped at
``max_unique_tokens`` (<= 100), so this implementation finds the
current smallest by linear scan — same eviction decisions without the
stale-entry corner cases.

Tokenizer: ``ml_standard``-like — tokens start with a letter and
continue over word characters (dots/dashes/underscores allowed);
purely numeric/symbolic tokens are dropped, case preserved.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

WILDCARD = "*"
_TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z0-9_.\-]*")


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text or "")


class TextCategory:
    __slots__ = ("tokens", "token_counts", "count")

    def __init__(self, tokens: list[str], count: int):
        self.tokens = list(tokens)
        self.token_counts = [count] * len(tokens)
        self.count = count

    def similarity(self, tokens: list[str]) -> tuple[float, int]:
        kept = total = 0
        wildcards = 0
        for i, t in enumerate(tokens):
            if t == self.tokens[i]:
                kept += self.token_counts[i]
                total += self.token_counts[i]
            elif self.tokens[i] == WILDCARD:
                wildcards += 1
            else:
                total += self.token_counts[i]
        return (kept / total if total else 1.0), wildcards

    def add(self, tokens: list[str], count: int) -> None:
        for i, t in enumerate(tokens):
            if t != self.tokens[i]:
                self.tokens[i] = WILDCARD
            else:
                self.token_counts[i] += count
        self.count += count


class _Leaf:
    __slots__ = ("count", "threshold", "categories")

    def __init__(self, count: int, threshold: int):
        if not 1 <= threshold <= 100:
            raise ValueError("similarity_threshold must be in [1, 100]")
        self.count = count
        self.threshold = threshold
        self.categories: list[TextCategory] = []

    is_leaf = True

    def inc(self, count: int) -> None:
        self.count += count

    def _best(self, tokens: list[str]):
        best, best_key = None, None
        for cat in self.categories:
            sim = cat.similarity(tokens)
            if best_key is None or sim > best_key:
                best_key, best = sim, cat
        return best, best_key

    def add_text(self, tokens: list[str], count: int, tree) -> None:
        best, key = self._best(tokens)
        if best is not None and key[0] * 100 >= self.threshold:
            best.add(tokens, count)
        else:
            self.categories.append(TextCategory(tokens, count))

    def merge_with(self, other: "_Leaf") -> None:
        # the node COUNT absorbs the sibling's too (TreeNode.mergeWith
        # incCount) — collapse_tiny_children ratios and smallest-child
        # eviction read it
        self.count += other.count
        for cat in other.categories:
            best, key = self._best(cat.tokens)
            if best is not None and key[0] * 100 >= self.threshold:
                best.add(cat.tokens, cat.count)
            else:
                self.categories.append(cat)

    def collapse_tiny_children(self) -> None:
        pass

    def all_categories(self) -> list[TextCategory]:
        return list(self.categories)


class _Inner:
    __slots__ = ("count", "pos", "max_children", "children")

    def __init__(self, count: int, pos: int, max_children: int):
        self.count = count
        self.pos = pos
        self.max_children = max_children
        self.children: dict[str, object] = {}

    is_leaf = False

    def inc(self, count: int) -> None:
        self.count += count

    def _smallest(self):
        """(token, node) of the smallest non-wildcard child."""
        best = None
        for tok, node in self.children.items():
            if tok == WILDCARD:
                continue
            if best is None or node.count < best[1].count:
                best = (tok, node)
        return best

    def add_text(self, tokens: list[str], count: int, tree) -> None:
        token = tokens[self.pos]
        child = self.children.get(token)
        if child is not None:
            child.inc(count)
        else:
            child = self._add_child(token, tree.new_node(count, self.pos + 1,
                                                         tokens))
        child.add_text(tokens, count, tree)

    def _add_child(self, token: str, node):
        existing = self.children.get(token)
        if existing is not None:
            existing.merge_with(node)
            return existing
        if len(self.children) == self.max_children:
            wild = self.children.get(WILDCARD)
            if wild is None:
                raise RuntimeError("missing wildcard child at capacity")
            smallest = self._smallest()
            if smallest is not None and node.count > smallest[1].count:
                evicted = self.children.pop(smallest[0])
                self.children[token] = node
                wild.merge_with(evicted)
                return node
            wild.merge_with(node)
            return wild
        if len(self.children) == self.max_children - 1 \
                and WILDCARD not in self.children and token != WILDCARD:
            smallest = self._smallest()
            if smallest is not None and node.count > smallest[1].count:
                self.children[WILDCARD] = self.children.pop(smallest[0])
                self.children[token] = node
                return node
            self.children[WILDCARD] = node
            return node
        self.children[token] = node
        return node

    def merge_with(self, other) -> None:
        if other.is_leaf:
            raise TypeError("cannot merge a leaf into an inner node")
        self.count += other.count
        wild = other.children.pop(WILDCARD, None)
        if wild is not None:
            self._add_child(WILDCARD, wild)
        for tok, node in list(other.children.items()):
            self._add_child(tok, node)

    def collapse_tiny_children(self) -> None:
        if len(self.children) > 1:
            wild = self.children.get(WILDCARD)
            if wild is None:
                smallest = self._smallest()
                if smallest is not None and \
                        smallest[1].count / self.count <= 1.0 / self.max_children:
                    wild = self.children.pop(smallest[0])
                    self.children[WILDCARD] = wild
            if wild is not None:
                while True:
                    smallest = self._smallest()
                    if smallest is None or \
                            smallest[1].count / self.count > 1.0 / self.max_children:
                        break
                    wild.merge_with(self.children.pop(smallest[0]))
        for node in self.children.values():
            node.collapse_tiny_children()

    def all_categories(self) -> list[TextCategory]:
        out = []
        for node in self.children.values():
            out.extend(node.all_categories())
        return out


class CategorizationTokenTree:
    """Fixed-depth prefix tree over token arrays, root keyed by token
    count (CategorizationTokenTree.java)."""

    def __init__(self, max_unique_tokens: int = 50,
                 max_matched_tokens: int = 5,
                 similarity_threshold: int = 50):
        if max_unique_tokens <= 0 or max_matched_tokens < 0:
            raise ValueError("max_unique_tokens must be > 0, "
                             "max_matched_tokens >= 0")
        self.max_unique_tokens = max_unique_tokens
        self.max_matched_tokens = max_matched_tokens
        self.similarity_threshold = similarity_threshold
        self.roots: dict[int, object] = {}

    def new_node(self, count: int, pos: int, tokens: list[str]):
        if pos < self.max_matched_tokens - 1 and pos < len(tokens):
            return _Inner(count, pos, self.max_unique_tokens)
        return _Leaf(count, self.similarity_threshold)

    def parse_tokens(self, tokens: list[str], count: int = 1) -> None:
        if not tokens:
            return
        root = self.roots.get(len(tokens))
        if root is None:
            root = self.new_node(count, 0, tokens)
            self.roots[len(tokens)] = root
        else:
            root.inc(count)
        root.add_text(tokens, count, self)

    def collapse_tiny_children(self) -> None:
        for root in self.roots.values():
            root.collapse_tiny_children()

    def buckets(self) -> list[tuple[list[str], int]]:
        out = []
        for root in self.roots.values():
            for cat in root.all_categories():
                out.append((list(cat.tokens), cat.count))
        return out


def categorize_text(ds, col: str, size: int = 10,
                    similarity_threshold: int = 50,
                    max_unique_tokens: int = 50,
                    max_matched_tokens: int = 5) -> pd.DataFrame:
    """Distributed categorize_text: per-batch local trees emit category
    partials; the driver reduce re-inserts them (count-weighted) into a
    final tree, collapses tiny children, and ranks by doc_count desc
    then key. Returns (key, doc_count)."""

    def partial(batch: pa.Table) -> pa.Table:
        tree = CategorizationTokenTree(max_unique_tokens,
                                       max_matched_tokens,
                                       similarity_threshold)
        for text in batch[col].to_pylist():
            tree.parse_tokens(tokenize(text))
        keys, counts = [], []
        for tokens, count in tree.buckets():
            keys.append(" ".join(tokens))
            counts.append(count)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    tree = CategorizationTokenTree(max_unique_tokens, max_matched_tokens,
                                   similarity_threshold)
    # insert big partials first: category token patterns then converge
    # the same way regardless of which partition emitted them first
    parts = parts.sort_values(["n", "key"], ascending=[False, True])
    for key, n in zip(parts["key"], parts["n"]):
        tree.parse_tokens(key.split(" "), int(n))
    tree.collapse_tiny_children()
    rows = [(" ".join(toks), cnt) for toks, cnt in tree.buckets()]
    out = pd.DataFrame(rows, columns=["key", "doc_count"])
    out = out.sort_values(["doc_count", "key"], ascending=[False, True],
                          ignore_index=True)
    out["doc_count"] = out["doc_count"].astype("int64")
    return out.head(size).reset_index(drop=True)
