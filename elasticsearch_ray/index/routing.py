"""Doc→shard routing parity with the reference.

``cluster/routing/IndexRouting.java:113,120`` routes a document by
``floorMod(murmur3_x86_32(utf16le(_id)), routingNumShards) / routingFactor``
(``Murmur3HashFunction.java:22-37`` hashes the id's UTF-16-LE bytes, seed 0).

Our default build uses contiguous doc ranges (dense partition-local ids →
better delta compression, trivial lineage); this module provides the exact
hash-routing function for placement parity when comparing against a sharded
reference index, plus a vectorized batch version for a routing map stage.
"""

from __future__ import annotations

import numpy as np


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Public MurmurHash3 x86 32-bit (Austin Appleby), returns signed int32."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def es_string_hash(s: str) -> int:
    """Murmur3HashFunction.hash: murmur3_x86_32 over UTF-16-LE bytes, seed 0."""
    return murmur3_x86_32(s.encode("utf-16-le"), 0)


def route_shard(doc_id: str, num_shards: int, routing_num_shards: int | None = None) -> int:
    """IndexRouting.shardId: floorMod(hash, routingNumShards) / routingFactor.

    With default settings routingNumShards == num_shards (factor 1)."""
    rns = routing_num_shards or num_shards
    factor = rns // num_shards
    return (es_string_hash(doc_id) % rns) // factor  # python % IS floorMod


def route_shard_batch(ids, num_shards: int) -> np.ndarray:
    """Vectorized-over-rows routing for a map_batches stage."""
    return np.fromiter(
        (route_shard(i, num_shards) for i in ids), dtype=np.int32, count=len(ids)
    )
