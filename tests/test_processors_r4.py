"""Round-4 ingest processors: user_agent (modules/ingest-user-agent) and
geoip as a CIDR-table interface (modules/ingest-geoip)."""

import pandas as pd
import pytest


UA_GOLDENS = [
    # (ua, name, version, os.full, device)
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
     "Chrome", "120.0.0.0", "Windows 10.0", "Other"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
     "Edge", "120.0.2210.91", "Windows 10.0", "Other"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",
     "Safari", "17.1", "Mac OS X 10.15.7", "Mac"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
     "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 "
     "Safari/604.1",
     "Mobile Safari", "17.1", "iOS 17.1", "iPhone"),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
     "Firefox", "115.0", "Linux", "Other"),
    ("curl/8.4.0", "curl", "8.4.0", "Other", "Other"),
    ("Mozilla/5.0 (Linux; Android 13; SM-G991B) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36",
     "Chrome Mobile", "120.0.0.0", "Android 13", "Generic Smartphone"),
    ("Mozilla/5.0 (compatible; MSIE 10.0; Windows NT 6.1; Trident/6.0)",
     "IE", "10.0", "Windows 6.1", "Other"),
    ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
     "Googlebot", "2.1", "Other", "Other"),
    ("weird thing", "Other", "", "Other", "Other"),
]


def test_user_agent_processor_goldens():
    from elasticsearch_ray.ops.processors import UserAgentProcessor

    df = pd.DataFrame({"ua": [u for u, *_ in UA_GOLDENS]})
    out = UserAgentProcessor("ua")(df)
    for i, (_ua, name, ver, osf, dev) in enumerate(UA_GOLDENS):
        assert out["user_agent.name"][i] == name, i
        assert out["user_agent.version"][i] == ver, i
        assert out["user_agent.os.full"][i] == osf, i
        assert out["user_agent.device.name"][i] == dev, i
    assert (out["user_agent.original"] == df["ua"]).all()


def test_geoip_processor_cidr_lookup(tmp_path):
    from elasticsearch_ray.ops.processors import GeoIpProcessor

    # RFC 5737 documentation ranges as the public fixture
    db = [("192.0.2.0/24", {"country_iso_code": "US", "city_name": "Alpha"}),
          ("192.0.2.128/25", {"country_iso_code": "US", "city_name": "Beta"}),
          ("198.51.100.0/24", {"country_iso_code": "DE", "city_name": "Gamma"})]
    g = GeoIpProcessor("ip", db)
    df = pd.DataFrame({"ip": ["192.0.2.5", "192.0.2.200", "198.51.100.7",
                              "203.0.113.9", "not-an-ip", None]})
    out = g(df)
    assert out["geoip.city_name"].tolist() == [
        "Alpha", "Beta", "Gamma", None, None, None]  # longest prefix wins
    assert out["geoip.country_iso_code"].tolist()[:3] == ["US", "US", "DE"]

    # csv fixture path
    p = tmp_path / "geo.csv"
    p.write_text('192.0.2.0/24,"{""country_iso_code"": ""US""}"\n')
    g2 = GeoIpProcessor("ip", str(p), properties=("country_iso_code",))
    out2 = g2(pd.DataFrame({"ip": ["192.0.2.1"]}))
    assert out2["geoip.country_iso_code"].tolist() == ["US"]

    with pytest.raises(ValueError, match="bad CIDR"):
        GeoIpProcessor("ip", [("nonsense/8", {})])


def test_registered_domain_psl_subset():
    """PSL algorithm semantics on the curated subset: longest suffix wins,
    wildcard *.tld rules, ! exceptions, private-registry suffixes."""
    from elasticsearch_ray.ops.processors import RegisteredDomainProcessor

    cases = {
        "www.example.co.uk": "example.co.uk",
        "deep.sub.example.com.au": "example.com.au",
        "a.b.github.io": "b.github.io",          # private registry suffix
        "foo.blogspot.com": "foo.blogspot.com",
        "bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",  # 3-label
        "school.act.edu.au": "school.act.edu.au",
        "x.foo.ck": "x.foo.ck",                  # wildcard *.ck
        "www.ck": "www.ck",                      # !www.ck exception
        "sub.example.org": "example.org",
        "www.example.de": "example.de",          # unlisted ccTLD fallback
        "API.Example.COM.": "example.com",       # case + trailing dot
    }
    df = pd.DataFrame({"h": list(cases)})
    out = RegisteredDomainProcessor("h")(df)
    assert out["registered_domain"].tolist() == list(cases.values())


def test_ua_geoip_registered():
    from elasticsearch_ray.ops.processors import _REGISTRY

    assert "user_agent" in _REGISTRY and "geoip" in _REGISTRY
