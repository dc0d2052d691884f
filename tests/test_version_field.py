"""version field type (x-pack mapper-version VersionEncoder semantics):
the encoded byte key's raw order IS semver precedence."""

import numpy as np
import pandas as pd
import pytest

import ray

from elasticsearch_ray.ops.version_field import (
    encode_version,
    is_valid_version,
    sort_by_version,
    version_range,
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
