"""ip field type + ip_range agg (IpFieldMapper 16-byte InetAddressPoint
encoding; IpRangeAggregationBuilder mask expansion, to-exclusive)."""

import ipaddress

import numpy as np
import pandas as pd
import pytest
import ray

from elasticsearch_ray.ops.ip_field import (
    cidr_bounds,
    encode_ips,
    ip_range_agg,
    ip_sort_key,
    ip_term_filter,
)


def test_encode_v4_mapped_and_v6():
    hi, lo, valid = encode_ips(["10.0.0.1", "255.255.255.255",
                                "2001:db8::1", "999.1.1.1", None,
                                "not-an-ip"])
    assert valid.tolist() == [True, True, True, False, False, False]
    assert hi[0] == 0 and lo[0] == 0xFFFF0A000001
    assert lo[1] == 0xFFFFFFFFFFFF
    want = int(ipaddress.IPv6Address("2001:db8::1"))
    assert (int(hi[2]) << 64 | int(lo[2])) == want
    # v4-mapped ordering: every IPv4 sorts below any real IPv6 > ::ffff
    assert (hi[0], lo[0]) < (hi[2], lo[2])


def test_cidr_bounds_reference_expansion():
    frm, to = cidr_bounds("10.3.0.0/16")
    assert (frm[0], frm[1]) == (0, 0xFFFF0A030000)
    assert (to[0], to[1]) == (0, 0xFFFF0A040000)  # nextUp(10.3.255.255)
    frm, to = cidr_bounds("::/0")
    assert frm == (0, 0)
    assert to is None  # address-space max -> open bound


def test_ip_term_filter_and_sort(ray_session):
    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "ip": ["10.1.2.3", "10.1.9.9", "10.2.0.1", "192.168.0.5",
               "2001:db8::1", None],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    got = ip_term_filter(ds, "ip", "10.1.0.0/16").to_pandas()
    assert sorted(got["id"]) == [0, 1]
    exact = ip_term_filter(ds, "ip", "192.168.0.5").to_pandas()
    assert exact["id"].tolist() == [3]
    # sort: v4 ascending first, v6 after, invalid last
    s = (ip_sort_key(ds, "ip").sort(["_ip_hi", "_ip_lo"])
         .to_pandas()["id"].tolist())
    assert s == [0, 1, 2, 3, 4, 5]


def test_ip_range_agg_mask_and_bounds(ray_session):
    rng = np.random.RandomState(5)
    ips = [f"10.{a}.{b}.{c}" for a, b, c in
           rng.randint(0, 256, (400, 3))] + ["2001:db8::7", None]
    df = pd.DataFrame({"ip": ips})
    ds = ray.data.from_pandas(df).repartition(3)
    out = ip_range_agg(ds, "ip", [
        {"mask": "10.0.0.0/9"},                      # second octet < 128
        {"from": "10.128.0.0", "to": "10.192.0.0"},  # to EXCLUSIVE
        {"from": "10.0.0.0"},                        # open upper: v6 too
        {"to": "10.0.0.0", "key": "below"},
    ])
    octets = np.array([int(i.split(".")[1]) for i in ips[:400]])
    assert out.loc[0, "doc_count"] == int((octets < 128).sum())
    assert out.loc[1, "doc_count"] == int(
        ((octets >= 128) & (octets < 192)).sum())
    assert out.loc[2, "doc_count"] == 401  # all valid v4 + the v6
    assert out.loc[3, "doc_count"] == 0
    assert out.loc[0, "key"] == "10.0.0.0/9"
    # boundary: to is exclusive
    one = pd.DataFrame({"ip": ["10.192.0.0"]})
    b = ip_range_agg(ray.data.from_pandas(one), "ip",
                     [{"from": "10.128.0.0", "to": "10.192.0.0"}])
    assert b.loc[0, "doc_count"] == 0


def test_max_address_and_empty_dataset(ray_session):
    """review r5: the maximum IPv6 address has no successor (open upper
    bound, no uint64 overflow); an empty source yields zero-count
    buckets, not a KeyError."""
    df = pd.DataFrame({"ip": ["ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
                              "10.0.0.1"]})
    got = ip_term_filter(
        ray.data.from_pandas(df), "ip",
        "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff").to_pandas()
    assert got["ip"].tolist() == ["ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff"]
    empty = ip_range_agg(ray.data.from_pandas(pd.DataFrame({"ip": []})),
                         "ip", [{"mask": "10.0.0.0/9"},
                                {"from": "10.0.0.0"}])
    assert empty["doc_count"].tolist() == [0, 0]
