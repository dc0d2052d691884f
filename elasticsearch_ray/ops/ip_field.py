"""``ip`` field type + ``ip_range`` aggregation.

Reference semantics:
- ``server/src/main/java/org/elasticsearch/index/mapper/IpFieldMapper.java``
  (:500-505): values are stored as the 16-byte ``InetAddressPoint``
  encoding — IPv4 addresses in their IPv4-mapped IPv6 form
  (``::ffff:a.b.c.d``) — so IPv4 and IPv6 sort and range together in one
  byte order. Term queries accept a single address OR a CIDR mask;
  ranges compare the encoded bytes.
- ``IpRangeAggregationBuilder.java:121-150``: a ``mask`` range becomes
  ``[network_lo, nextUp(network_hi))`` — the ``to`` bound is EXCLUSIVE
  (``BinaryRangeAggregator.Range``); explicit from/to ranges keep the
  same from-inclusive/to-exclusive contract; null bounds are open.

Ray-Data shape: the 128-bit encoding rides as a pair of uint64 lanes
(hi, lo) so every comparison is vectorized numpy (no per-row byte
compares); parsing has a vectorized dotted-quad fast path and an
``ipaddress`` fallback for IPv6/edge forms. ``ip_range_agg`` is per-batch
counts + a tiny driver combine; ranges may overlap (a doc can land in
several buckets, like the reference's range family).
"""

from __future__ import annotations

import ipaddress
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_V4 = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
_V4_PREFIX_HI = np.uint64(0)
_V4_PREFIX_LO = np.uint64(0xFFFF00000000)  # ::ffff:0:0


def encode_ips(values) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse an array of address strings → (hi, lo, valid) uint64/bool
    lanes of the 16-byte InetAddressPoint form (IPv4 mapped). Nulls and
    unparseable strings are invalid (skipped by queries/aggs)."""
    s = pd.Series(values, dtype="object")
    n = len(s)
    hi = np.zeros(n, np.uint64)
    lo = np.zeros(n, np.uint64)
    valid = np.zeros(n, bool)
    ext = s.str.extract(_V4, expand=True)
    v4 = ext.notna().all(axis=1).to_numpy()
    if v4.any():
        parts = ext[v4].astype(np.int64).to_numpy()
        ok = (parts <= 255).all(axis=1)
        idx = np.flatnonzero(v4)[ok]
        p = parts[ok].astype(np.uint64)
        addr = (p[:, 0] << np.uint64(24)) | (p[:, 1] << np.uint64(16)) \
            | (p[:, 2] << np.uint64(8)) | p[:, 3]
        hi[idx] = _V4_PREFIX_HI
        lo[idx] = _V4_PREFIX_LO | addr
        valid[idx] = True
    for i in np.flatnonzero(~valid):
        v = s.iloc[i]
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        try:
            a = ipaddress.ip_address(str(v))
        except ValueError:
            continue
        b = int(ipaddress.IPv6Address(f"::ffff:{a}")
                if a.version == 4 else a)
        hi[i] = np.uint64(b >> 64)
        lo[i] = np.uint64(b & 0xFFFFFFFFFFFFFFFF)
        valid[i] = True
    return hi, lo, valid


def _encode_one(value: str) -> tuple[int, int]:
    a = ipaddress.ip_address(value)
    b = int(ipaddress.IPv6Address(f"::ffff:{a}") if a.version == 4 else a)
    return b >> 64, b & 0xFFFFFFFFFFFFFFFF


def cidr_bounds(mask: str) -> tuple[tuple[int, int], tuple[int, int] | None]:
    """IpRangeAggregationBuilder.Range(mask): [network_lo, nextUp(hi)).
    Returns ((hi, lo) from-inclusive, (hi, lo) to-EXCLUSIVE or None for
    the address-space max)."""
    net = ipaddress.ip_network(mask, strict=False)
    lo_i = int(ipaddress.IPv6Address(f"::ffff:{net.network_address}")
               if net.version == 4 else net.network_address)
    hi_i = int(ipaddress.IPv6Address(f"::ffff:{net.broadcast_address}")
               if net.version == 4 else net.broadcast_address)
    upper = hi_i + 1
    if upper >= (1 << 128):
        to = None
    else:
        to = (upper >> 64, upper & 0xFFFFFFFFFFFFFFFF)
    return (lo_i >> 64, lo_i & 0xFFFFFFFFFFFFFFFF), to


def _ge(hi, lo, b) -> np.ndarray:
    bh, bl = np.uint64(b[0]), np.uint64(b[1])
    return (hi > bh) | ((hi == bh) & (lo >= bl))


def _lt(hi, lo, b) -> np.ndarray:
    bh, bl = np.uint64(b[0]), np.uint64(b[1])
    return (hi < bh) | ((hi == bh) & (lo < bl))


def ip_term_filter(ds, col: str, value: str):
    """ip term query: a bare address matches exactly; a CIDR mask matches
    the network (IpFieldMapper.termQuery)."""
    if "/" in value:
        frm, to = cidr_bounds(value)
    else:
        frm = _encode_one(value)
        nxt = (frm[0] << 64 | frm[1]) + 1
        # the maximum address has no successor — open upper bound
        # (the same wraparound cidr_bounds handles, review r5 #2)
        to = None if nxt >= (1 << 128) else \
            (nxt >> 64, nxt & 0xFFFFFFFFFFFFFFFF)

    def keep(batch: pa.Table) -> pa.Table:
        hi, lo, valid = encode_ips(batch[col].to_pylist())
        m = valid & _ge(hi, lo, frm)
        if to is not None:
            m &= _lt(hi, lo, to)
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def _resolve_ranges(ranges: list) -> list[tuple[str, tuple | None,
                                                tuple | None]]:
    out = []
    for r in ranges:
        if "mask" in r:
            frm, to = cidr_bounds(r["mask"])
            out.append((r.get("key", r["mask"]), frm, to))
            continue
        frm = _encode_one(r["from"]) if r.get("from") else None
        to = _encode_one(r["to"]) if r.get("to") else None
        key = r.get("key",
                    f"{r.get('from', '*')}-{r.get('to', '*')}")
        out.append((key, frm, to))
    return out


def ip_range_agg(ds, col: str, ranges: list) -> pd.DataFrame:
    """ip_range aggregation: from inclusive, to EXCLUSIVE, masks expand
    per the reference; invalid/null addresses never count; ranges may
    overlap. Per-batch vectorized counts, driver sum."""
    resolved = _resolve_ranges(ranges)

    def part(batch: pa.Table) -> pa.Table:
        hi, lo, valid = encode_ips(batch[col].to_pylist())
        counts = []
        for _key, frm, to in resolved:
            m = valid.copy()
            if frm is not None:
                m &= _ge(hi, lo, frm)
            if to is not None:
                m &= _lt(hi, lo, to)
            counts.append(int(m.sum()))
        return pa.table({"ridx": pa.array(range(len(resolved))),
                         "doc_count": pa.array(counts)})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:  # empty source: Ray skips empty blocks (schemaless)
        agg = pd.Series(dtype=np.int64)
    else:
        agg = parts.groupby("ridx")["doc_count"].sum()
    return pd.DataFrame({
        "key": [k for k, _f, _t in resolved],
        "doc_count": [int(agg.get(i, 0)) for i in range(len(resolved))],
    })


def ip_sort_key(ds, col: str, hi_col: str = "_ip_hi",
                lo_col: str = "_ip_lo"):
    """Attach the sortable (hi, lo) lanes — ``ds.sort([hi_col, lo_col])``
    then orders by the encoded bytes, IPv4 and IPv6 interleaved like the
    reference's SortedSetDocValues order. Invalid addresses sort last
    (max key), like missing _last."""
    def add(batch: pa.Table) -> pa.Table:
        hi, lo, valid = encode_ips(batch[col].to_pylist())
        hi = np.where(valid, hi, np.uint64(0xFFFFFFFFFFFFFFFF))
        lo = np.where(valid, lo, np.uint64(0xFFFFFFFFFFFFFFFF))
        return batch.append_column(hi_col, pa.array(hi)) \
                    .append_column(lo_col, pa.array(lo))

    return ds.map_batches(add, batch_format="pyarrow")
