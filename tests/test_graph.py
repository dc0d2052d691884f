"""Graph explore API (x-pack graph TransportGraphExploreAction):
wave scoring, decay, self-join exclusion, trim-by-size, significance
mode, sampling determinism."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.graph import graph_explore

# crafted interaction log: users x products
ROWS = []
def _add(user, product, n):
    for _ in range(n):
        ROWS.append({"user": user, "product": product,
                     "ts": len(ROWS)})

# seed product "beatles": heavy users u1 (6 docs), u2 (4), u3 (1 — under
# min_doc_count)
_add("u1", "beatles", 6)
_add("u2", "beatles", 4)
_add("u3", "beatles", 1)
# u1 also listens to "stones" (5) and "kinks" (3); u2 to "stones" (4)
_add("u1", "stones", 5)
_add("u1", "kinks", 3)
_add("u2", "stones", 4)
# background noise from unrelated users
_add("u9", "noise", 8)
_add("u8", "stones", 1)
DF = pd.DataFrame(ROWS)


@pytest.fixture(scope="module")
def log_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(DF).repartition(3)


def test_hop0_vertices_and_weights(log_ds):
    out = graph_explore(log_ds, "product", ["beatles"],
                        hops=[[{"field": "user", "size": 5,
                                "min_doc_count": 3}]])
    v = out["vertices"]
    got = dict(zip(v["term"], v["weight"]))
    # u3 has only 1 seed doc -> below min_doc_count; weights are each
    # bucket's share of the total signal (6+4)
    assert set(got) == {"u1", "u2"}
    assert got["u1"] == pytest.approx(0.6)
    assert got["u2"] == pytest.approx(0.4)
    assert (v["depth"] == 0).all()
    assert out["connections"].empty  # hop 0 creates vertices only


def test_expansion_scoring_decay_and_self_join(log_ds):
    out = graph_explore(
        log_ds, "product", ["beatles"],
        hops=[[{"field": "user", "size": 5, "min_doc_count": 3}],
              [{"field": "product", "size": 5, "min_doc_count": 3}]])
    v = out["vertices"].set_index("term")
    c = out["connections"]
    # wave 2 buckets (per user, product co-occurrence, min_doc_count 3):
    # u1: beatles 6, stones 5, kinks 3; u2: beatles 4, stones 4
    # total signal = 22; signals decayed by min(0.95, from weight)
    tot = 6 + 5 + 3 + 4 + 4
    w_u1, w_u2 = 0.6, 0.4
    exp_beatles = 6 / tot * w_u1 + 4 / tot * w_u2
    exp_stones = 5 / tot * w_u1 + 4 / tot * w_u2
    exp_kinks = 3 / tot * w_u1
    # beatles is an existing vertex? no — it is a PRODUCT, hop-0 vertices
    # are users; beatles enters as a new vertex at depth 1
    assert v.loc["beatles", "weight"] == pytest.approx(exp_beatles)
    assert v.loc["stones", "weight"] == pytest.approx(exp_stones)
    assert v.loc["kinks", "weight"] == pytest.approx(exp_kinks)
    assert v.loc["kinks", "depth"] == 1
    # connections carry raw co-occurrence doc_counts
    key = c.set_index(["from_term", "to_term"])["doc_count"]
    assert key.loc[("u1", "stones")] == 5
    assert key.loc[("u2", "beatles")] == 4
    # same-field self joins (user->user term identity) can't occur here;
    # product->product next hop must skip them:
    out3 = graph_explore(
        log_ds, "product", ["beatles"],
        hops=[[{"field": "user", "size": 5, "min_doc_count": 3}],
              [{"field": "product", "size": 5, "min_doc_count": 3}],
              [{"field": "product", "size": 5, "min_doc_count": 1}]])
    c3 = out3["connections"]
    self_joins = c3[(c3["from_field"] == c3["to_field"])
                    & (c3["from_term"] == c3["to_term"])]
    assert self_joins.empty


def test_decay_caps_strong_sources(log_ds):
    # a from-vertex with weight > 0.95 is capped at 0.95
    out = graph_explore(log_ds, "product", ["noise"],
                        hops=[[{"field": "user", "size": 5,
                                "min_doc_count": 3}],
                              [{"field": "product", "size": 5,
                                "min_doc_count": 3}]])
    v = out["vertices"].set_index("term")
    # u9 is the only hop-0 vertex -> weight 1.0; expansion signal uses
    # min(0.95, 1.0) = 0.95; u9->noise is the only bucket -> signal .95
    assert v.loc["u9", "weight"] == pytest.approx(1.0)
    assert v.loc["noise", "weight"] == pytest.approx(0.95)


def test_trim_keeps_best_by_weight(log_ds):
    out = graph_explore(
        log_ds, "product", ["beatles"],
        hops=[[{"field": "user", "size": 5, "min_doc_count": 3}],
              [{"field": "product", "size": 2, "min_doc_count": 3}]])
    v = out["vertices"]
    prods = v[v["field"] == "product"]["term"].tolist()
    # kinks (weakest new product vertex) evicted with its connections
    assert set(prods) == {"beatles", "stones"}
    c = out["connections"]
    assert not (c["to_term"] == "kinks").any()


def test_significance_mode_prefers_lift(log_ds):
    out = graph_explore(log_ds, "product", ["beatles"],
                        hops=[[{"field": "user", "size": 5,
                                "min_doc_count": 1}]],
                        use_significance=True)
    v = out["vertices"]
    # u9 never touches beatles -> zero JLH, absent; u1/u2/u3 present
    assert "u9" not in set(v["term"])
    assert {"u1", "u2"} <= set(v["term"])


def test_sampling_deterministic(log_ds):
    a = graph_explore(log_ds, "product", ["beatles"],
                      hops=[[{"field": "user", "size": 5,
                              "min_doc_count": 1}]],
                      sample_size=5, sort_key="ts")
    b = graph_explore(log_ds, "product", ["beatles"],
                      hops=[[{"field": "user", "size": 5,
                              "min_doc_count": 1}]],
                      sample_size=5, sort_key="ts")
    pd.testing.assert_frame_equal(a["vertices"], b["vertices"])
    # first 5 beatles rows by ts are all u1
    assert a["vertices"]["term"].tolist() == ["u1"]
    with pytest.raises(ValueError):
        graph_explore(log_ds, "product", ["beatles"],
                      hops=[[{"field": "user"}]], sample_size=5)


def test_no_matches_empty_result(log_ds):
    out = graph_explore(log_ds, "product", ["nope"],
                        hops=[[{"field": "user", "size": 5}]])
    assert out["vertices"].empty and out["connections"].empty


def test_wave_total_spans_all_from_fields(log_ds):
    # hop-0 over TWO vertex fields -> hop-1 signals must be normalized by
    # the WAVE total (reference getExpandTotalSignalStrength spans every
    # lastHop vertex request), so all hop-1 signals sum to <= max decay
    out = graph_explore(
        log_ds, "product", ["beatles"],
        hops=[[{"field": "user", "size": 5, "min_doc_count": 3},
               {"field": "ts", "size": 2, "min_doc_count": 1}],
              [{"field": "product", "size": 10, "min_doc_count": 1}]])
    c = out["connections"]
    # signals are shares of ONE wave total, each decayed by <= 0.95
    assert c["weight"].sum() <= 0.95 + 1e-9


def test_significance_with_sampling_not_starved(log_ds):
    # sampled foreground counts must pair with sampled fg totals — mixing
    # sampled counts with full-table totals zeroes nearly every bucket
    out = graph_explore(log_ds, "product", ["beatles"],
                        hops=[[{"field": "user", "size": 5,
                                "min_doc_count": 1}]],
                        use_significance=True, sample_size=8,
                        sort_key="ts")
    assert not out["vertices"].empty
