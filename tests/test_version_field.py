"""version field type (x-pack mapper-version VersionEncoder semantics):
the encoded byte key's raw order IS semver precedence."""

import numpy as np
import pandas as pd
import pytest

import ray

from elasticsearch_ray.ops.version_field import (
    decode_version,
    encode_version,
    is_valid_version,
    sort_by_version,
    version_prefix,
    version_range,
    version_term,
    version_wildcard,
)

# semver.org §11's canonical precedence chain
SEMVER_CHAIN = [
    "1.0.0-alpha", "1.0.0-alpha.1", "1.0.0-alpha.beta", "1.0.0-beta",
    "1.0.0-beta.2", "1.0.0-beta.11", "1.0.0-rc.1", "1.0.0",
]


def test_semver_precedence_chain():
    keys = [encode_version(v) for v in SEMVER_CHAIN]
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)


def test_numeric_groups_compare_numerically():
    assert encode_version("1.2.3") < encode_version("1.2.10")
    assert encode_version("1.9.0") < encode_version("1.11.0")
    assert encode_version("2.0.0") > encode_version("1.99.99")
    # relaxed main version: more or fewer than 3 parts are legal
    assert encode_version("1.2") < encode_version("1.2.0")
    assert is_valid_version("1.2.3.4")


def test_prerelease_sorts_before_release():
    assert encode_version("1.0.0-rc.1") < encode_version("1.0.0")
    # numeric prerelease identifiers sort before alphanumeric ones
    assert encode_version("1.0.0-1") < encode_version("1.0.0-alpha")


def test_invalid_after_valid_and_empty():
    assert not is_valid_version("not_a_version")
    assert not is_valid_version("01.2.3")  # leading zero is illegal
    assert encode_version("99.99.99") < encode_version("banana")
    assert encode_version("99.99.99") < encode_version("01.2.3")
    # empty string sorts after all valid prereleases, before raw invalids
    assert encode_version("1.0.0-zz") < encode_version("")
    assert encode_version("") < encode_version("banana")


def test_build_suffix_is_ascii_tiebreak():
    a, b = encode_version("1.0.0+build.1"), encode_version("1.0.0+build.2")
    assert a < b
    # build suffix does not flip release-vs-prerelease ordering
    assert encode_version("1.0.0-rc.1+zzz") < encode_version("1.0.0+aaa")


def test_distributed_sort_and_range(ray_session):
    vers = ["1.10.0", "1.2.0", "1.0.0-alpha", "2.0.0", "1.0.0",
            "not_a_version", "1.0.0-beta", "1.9.9", ""]
    df = pd.DataFrame({"doc_id": np.arange(len(vers), dtype=np.int64),
                       "ver": vers})
    ds = ray.data.from_pandas(df).repartition(3)
    out = sort_by_version(ds, "ver").to_pandas()
    assert out["ver"].tolist() == [
        "1.0.0-alpha", "1.0.0-beta", "1.0.0", "1.2.0", "1.9.9",
        "1.10.0", "2.0.0", "", "not_a_version"]
    assert "_version_key" not in out.columns
    rng = version_range(ds, "ver", gte="1.2.0", lt="2.0.0").to_pandas()
    assert sorted(rng["ver"]) == ["1.10.0", "1.2.0", "1.9.9"]
    # encoded-space bound: "1.10.0" is inside [1.2.0, 2.0.0) numerically
    rng2 = version_range(ds, "ver", gt="1.0.0", lte="1.10.0").to_pandas()
    assert sorted(rng2["ver"]) == ["1.10.0", "1.2.0", "1.9.9"]


def test_digit_group_cap():
    with pytest.raises(ValueError, match="127"):
        encode_version("1" * 128 + ".0.0")


# every `<` pair from the reference VersionEncoderTests.testEncodingOrdering
REFERENCE_ORDER_PAIRS = [
    ("1", "1.0"), ("1.0", "1.0.0.0.0.0.0.0.0.1"),
    ("1.0.0", "1.0.0.0.0.0.0.0.0.1"), ("1.0.0", "2.0.0"),
    ("2.0.0", "11.0.0"), ("2.0.0", "2.1.0"), ("2.1.0", "2.1.1"),
    ("2.1.1", "2.1.1.0"), ("1.0.0", "2.0"),
    ("1.0.0-a", "1.0.0-b"), ("1.0.0-1.0.0", "1.0.0-2.0"),
    ("1.0.0-alpha", "1.0.0-alpha.1"),
    ("1.0.0-alpha.1", "1.0.0-alpha.beta"),
    ("1.0.0-alpha.beta", "1.0.0-beta"),
    ("1.0.0-beta", "1.0.0-beta.2"), ("1.0.0-beta.2", "1.0.0-beta.11"),
    ("1.0.0-beta11", "1.0.0-beta2"),  # non-numeric ids: raw ASCII
    ("1.0.0-beta.11", "1.0.0-rc.1"), ("1.0.0-rc.1", "1.0.0"),
    ("1.0.0", "2.0.0-pre127"), ("2.0.0-pre127", "2.0.0-pre128"),
    ("2.0.0-pre128", "2.0.0-pre128-somethingelse"),
    ("2.0.0-pre20201231z110026", "2.0.0-pre227"),
    ("99999.99999.99999", "1.invalid"),  # illegal sorts after legal
    ("", "a"),
]


def test_reference_encoding_order_pairs():
    for lo, hi in REFERENCE_ORDER_PAIRS:
        assert encode_version(lo) < encode_version(hi), (lo, hi)


def test_decode_roundtrip():
    for v in ["1", "1.0.0", "1.2.3-alpha.2+build.1", "11.222.3333",
              "1.0.0-beta11", "2.0.0-pre128-somethingelse", "1.invalid",
              "not_a_version", "1.2.3-some-Other-Pre.123", "-leading",
              "+plus"]:
        assert decode_version(encode_version(v)) == v


def test_leading_separator_is_not_a_separator():
    # VersionParts.extractSuffix: start > 0 — "-alpha"/"+b" keep the
    # separator in the main part (illegal -> raw bytes), like the Java
    assert not is_valid_version("-1")
    assert encode_version("-1") == b"-1"
    assert encode_version("+b") == b"+b"


def test_unicode_digit_is_illegal():
    # Java \d is ASCII: a Unicode digit makes the string illegal (raw
    # key), it must never reach the numeric-group encoder
    v = "1.١.3"
    assert not is_valid_version(v)
    assert encode_version(v) == v.encode("utf-8")


def test_term_wildcard_prefix(ray_session):
    vers = ["1.0.0", "1.0.0-alpha", "1.0.0-beta.2", "1.0.0-beta.11",
            "2.1.0", "2.1.1+build.5", "1.invalid"]
    df = pd.DataFrame({"doc_id": np.arange(len(vers), dtype=np.int64),
                       "ver": vers})
    ds = ray.data.from_pandas(df).repartition(2)
    assert version_term(ds, "ver", "1.0.0").to_pandas()["ver"].tolist() \
        == ["1.0.0"]
    w = set(version_wildcard(ds, "ver", "1.0.0-beta*").to_pandas()["ver"])
    assert w == {"1.0.0-beta.2", "1.0.0-beta.11"}
    p = set(version_prefix(ds, "ver", "2.1").to_pandas()["ver"])
    assert p == {"2.1.0", "2.1.1+build.5"}
    ci = set(version_wildcard(ds, "ver", "1.0.0-ALPHA*",
                              case_insensitive=True).to_pandas()["ver"])
    assert ci == {"1.0.0-alpha"}
