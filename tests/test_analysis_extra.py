

def test_normalizers():
    """AnalysisRegistry normalizers: keyword-wide chain, no tokenizer;
    built-in lowercase; custom char_filter + filter; tokenizer rejected."""
    import pytest as _pytest

    from elasticsearch_ray.analysis.analyzers import get_normalizer

    low = get_normalizer("lowercase")
    assert low("HeLLo World") == "hello world"  # NOT tokenized
    custom = get_normalizer({"filter": ["lowercase", "asciifolding"]})
    assert custom("Façade Über") == "facade uber"
    cf = get_normalizer({"char_filter": [("mapping", (("&", "and"),))],
                         "filter": ["lowercase"]})
    assert cf("Fish & Chips") == "fish and chips"
    assert custom(None) == "" and custom("") == ""
    with _pytest.raises(ValueError, match="tokenizer"):
        get_normalizer({"tokenizer": "standard"})
    with _pytest.raises(ValueError, match="unknown normalizer"):
        get_normalizer("nope")
