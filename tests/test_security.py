"""DLS / FLS — document- and field-level security.

Reference semantics: DocumentPermissions.java (role queries OR'd as SHOULD
msm=1, limited-by scope as an independent FILTER), FieldPermissions.java
(grant/except simpleMatch globs, except ⊆ grant, multi-role union, metadata
always readable), FieldSubsetReader (denied field == unmapped: queries match
nothing, fetches omit it).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    BoolQuery,
    MatchNoneQuery,
    MatchQuery,
    MultiMatchQuery,
    TermFilter,
    TermQuery,
)
from elasticsearch_ray.search.security import (
    FieldPermissions,
    RoleDescriptor,
    _glob_covers,
    apply_fls,
    dls_filter,
    secured_search,
)


def test_glob_covers_subset_semantics():
    assert _glob_covers("*", "anything*here")
    assert _glob_covers("user.*", "user.name")
    assert _glob_covers("user.*", "user.*")
    assert not _glob_covers("user.*", "*")
    assert not _glob_covers("user.name", "user.*")
    assert _glob_covers("a*c", "ab*bc")
    assert not _glob_covers("a*c", "a*d")


def test_field_permissions_grant_except_union():
    fp = FieldPermissions([(("user.*", "title"), ("user.secret",))])
    assert fp.is_granted("user.name")
    assert fp.is_granted("title")
    assert not fp.is_granted("user.secret")
    assert not fp.is_granted("other")
    assert fp.is_granted("_id") and fp.is_granted("doc_id")  # metadata
    # multi-role union: second role re-grants what the first excepts
    fp2 = FieldPermissions.from_roles([
        RoleDescriptor("a", grant=("user.*",), except_=("user.secret",)),
        RoleDescriptor("b", grant=("user.secret",)),
    ])
    assert fp2.is_granted("user.secret")
    # limited-by intersects
    lim = fp2.limit(FieldPermissions([(("user.name",), ())]))
    assert lim.is_granted("user.name")
    assert not lim.is_granted("user.secret")


def test_except_must_be_subset_of_grant():
    with pytest.raises(ValueError, match="subset"):
        FieldPermissions([(("title",), ("user.*",))])


def test_apply_fls_rewrites_tree():
    fp = FieldPermissions([(("text", "lang"), ())])
    # denied leaf -> match_none; granted untouched
    q = BoolQuery(must=(MatchQuery("x"),),
                  should=(TermQuery("y", field="secret"),),
                  filter=(TermFilter(column="lang", value="en"),))
    out = apply_fls(q, fp, "text")
    assert isinstance(out.should[0], MatchNoneQuery)
    assert out.must == q.must and out.filter == q.filter
    # default field denied -> everything denied
    fp2 = FieldPermissions([(("lang",), ())])
    assert isinstance(apply_fls(MatchQuery("x"), fp2, "text"),
                      MatchNoneQuery)
    # multi-field leaves drop denied members (None = default field),
    # empty -> match_none
    mm = MultiMatchQuery(text="x", fields=(None, "secret"))
    assert apply_fls(mm, fp, "text").fields == (None,)
    assert isinstance(
        apply_fls(MultiMatchQuery(text="x", fields=("secret",)), fp, "text"),
        MatchNoneQuery)
    # default field denied -> the None member drops
    assert isinstance(
        apply_fls(MultiMatchQuery(text="x", fields=(None,)), fp2, "text"),
        MatchNoneQuery)
    # denied filter column -> match_none (docs would leak through ranges)
    assert isinstance(
        apply_fls(TermFilter(column="secret", value=1), fp, "text"),
        MatchNoneQuery)


def test_dls_filter_or_and_unrestricted():
    r1 = RoleDescriptor("a", query=TermFilter(column="lang", value="en"))
    r2 = RoleDescriptor("b", query=TermFilter(column="lang", value="de"))
    f = dls_filter([r1, r2])
    assert isinstance(f, BoolQuery) and len(f.should) == 2
    assert f.minimum_should_match == 1
    # any role without a DLS query grants unrestricted access
    assert dls_filter([r1, RoleDescriptor("open")]) is None
    assert dls_filter([]) is None


@pytest.fixture(scope="module")
def sec_engine(ray_session, tmp_path_factory):
    """Small index with TWO indexed fields (text + title) so FLS masking of
    an indexed field is observable in scores."""
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("secidx")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    n = 40
    rng = np.random.RandomState(7)
    words = ["spark", "join", "merge", "sort", "scan", "index"]
    texts = [" ".join(rng.choice(words, 12)) for _ in range(n)]
    titles = [("spark title" if i % 4 == 0 else "other title")
              for i in range(n)]
    langs = [("en" if i % 2 == 0 else "de") for i in range(n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "title": pa.array(titles),
        "lang": pa.array(langs),
    })
    pq.write_table(t, f"{corpus}/docs.parquet")
    idx = str(root / "index")
    spec = IndexSpec(use_html=False, text_column="text",
                     fields={"title": "title"},
                     doc_columns=("lang", "title"))
    build_index(corpus, idx, spec, concurrency=2,
                file_pattern="docs.parquet")
    return QueryEngine(idx, dtype="float64")


def test_secured_search_dls_equals_explicit_filter(sec_engine):
    roles = [RoleDescriptor("en", query=TermFilter(column="lang",
                                                   value="en"))]
    got = secured_search(sec_engine, roles, "spark join", k=40,
                         fetch=("doc_id", "lang")).to_pandas()
    want = sec_engine.search(
        BoolQuery(must=(MatchQuery("spark join"),),
                  filter=(TermFilter(column="lang", value="en"),)),
        k=40, fetch=("doc_id", "lang")).to_pandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"], want["score"])
    assert set(got["lang"]) == {"en"}
    # two roles OR
    roles2 = roles + [RoleDescriptor("de", query=TermFilter(column="lang",
                                                            value="de"))]
    both = secured_search(sec_engine, roles2, "spark join", k=40,
                          fetch=("doc_id", "lang")).to_pandas()
    assert set(both["lang"]) == {"en", "de"}
    assert len(both) > len(got)


def test_secured_search_fls_masks_indexed_field(sec_engine):
    q = MultiMatchQuery(text="spark", fields=(None, "title"))
    roles_all = [RoleDescriptor("full")]
    roles_fls = [RoleDescriptor("no-title", grant=("text", "lang"))]
    full = secured_search(sec_engine, roles_all, q, k=40).to_pandas()
    masked = secured_search(sec_engine, roles_fls, q, k=40).to_pandas()
    text_only = sec_engine.search(
        MultiMatchQuery(text="spark", fields=(None,)), k=40,
        fetch=("doc_id",)).to_pandas()
    assert masked["doc_id"].tolist() == text_only["doc_id"].tolist()
    assert np.allclose(masked["score"], text_only["score"])
    assert full["score"].max() > masked["score"].max()  # title leg real


def test_secured_search_fetch_and_sort_masking(sec_engine):
    roles = [RoleDescriptor("r", grant=("text", "lang"))]
    res = secured_search(sec_engine, roles, "spark", k=5,
                         fetch=("doc_id", "lang", "title")).to_pandas()
    assert "lang" in res.columns and "title" not in res.columns
    with pytest.raises(ValueError, match="title"):
        secured_search(sec_engine, roles, "spark", k=5,
                       sort=[("title", "asc")])
    with pytest.raises(ValueError, match="title"):
        secured_search(sec_engine, roles, "spark", k=5, collapse="title")


def test_secured_search_limited_by(sec_engine):
    roles = [RoleDescriptor("user", query=None)]  # unrestricted role
    limited = [RoleDescriptor("api-key",
                              grant=("text",),
                              query=TermFilter(column="lang", value="en"))]
    got = secured_search(sec_engine, roles, "spark join", k=40,
                         fetch=("doc_id", "lang"), limited_by=limited
                         ).to_pandas()
    # limited-by DLS applies even though the base role is unrestricted
    assert "lang" not in got.columns  # intersected FLS dropped lang
    ids = set(got["doc_id"])
    want = sec_engine.search(
        BoolQuery(must=(MatchQuery("spark join"),),
                  filter=(TermFilter(column="lang", value="en"),)),
        k=40, fetch=("doc_id",)).to_pandas()
    assert ids == set(want["doc_id"])


def test_apply_fls_keeps_parallel_weights_aligned():
    """review r5 #2: dropping a denied field must drop its positional
    weight too, or later fields inherit the wrong BM25F blend."""
    from elasticsearch_ray.search.query import CombinedFieldsQuery

    fp = FieldPermissions([(("title", "body"), ())])
    q = CombinedFieldsQuery(text="x", fields=("title", "secret", "body"),
                            weights=(3.0, 1.0, 0.5))
    out = apply_fls(q, fp, "text")
    assert out.fields == ("title", "body")
    assert out.weights == (3.0, 0.5)


def test_secured_search_masks_post_filter_and_rescore(sec_engine):
    """review r5 #1: query-carrying options pass through FLS — a
    post_filter on a denied column must not leak its values."""
    roles = [RoleDescriptor("r", grant=("text", "lang"))]
    # granted post_filter works normally
    ok = secured_search(sec_engine, roles, "spark", k=40,
                        post_filter=TermFilter(column="lang", value="en"),
                        fetch=("doc_id", "lang")).to_pandas()
    assert len(ok) and set(ok["lang"]) == {"en"}
    # denied post_filter column -> match_none -> zero hits leak
    leak = secured_search(sec_engine, roles, "spark", k=40,
                          post_filter=TermFilter(column="title",
                                                 value="spark title"),
                          fetch=("doc_id",)).to_pandas()
    assert len(leak) == 0
    # rescore query on a denied field contributes nothing
    base = secured_search(sec_engine, roles, "spark", k=10).to_pandas()
    rs = secured_search(sec_engine, roles, "spark", k=10,
                        rescore=(MultiMatchQuery(text="spark",
                                                 fields=("title",)),
                                 10, 1.0, 5.0)).to_pandas()
    assert rs["doc_id"].tolist() == base["doc_id"].tolist()
    assert np.allclose(rs["score"], base["score"])
