import numpy as np

from elasticsearch_ray.index.routing import es_string_hash, murmur3_x86_32, route_shard, route_shard_batch


def test_murmur3_public_vectors():
    # widely published murmur3_x86_32 test vectors
    assert murmur3_x86_32(b"", 0) == 0
    assert murmur3_x86_32(b"hello", 0) == 0x248BFA47
    assert murmur3_x86_32(b"hello, world", 0) == 0x149BBB7F
    assert murmur3_x86_32(b"The quick brown fox jumps over the lazy dog", 0) == 0x2E4FF723


def test_route_shard_range_and_determinism():
    ids = [f"https://example.com/page-{i}" for i in range(1000)]
    shards = route_shard_batch(ids, 16)
    assert shards.min() >= 0 and shards.max() < 16
    # roughly balanced (hash routing)
    counts = np.bincount(shards, minlength=16)
    assert counts.min() > 20
    assert route_shard(ids[0], 16) == shards[0]


def test_utf16le_hashing():
    # the reference hashes the UTF-16-LE encoding of the id string
    assert es_string_hash("abc") == murmur3_x86_32("abc".encode("utf-16-le"), 0)
    assert es_string_hash("abc") != murmur3_x86_32(b"abc", 0)
