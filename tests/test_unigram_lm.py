"""Unigram-LM tokenizer training (Kudo ACL'18 / SentencePiece unigram
trainer): EM likelihood monotonicity, segmentability guarantee,
pruning-to-size, Viterbi encoding."""

import math

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.unigram_lm import (
    _em_round,
    _forward_backward,
    seed_vocabulary,
    train_unigram,
    unigram_encode,
    viterbi_encode_word,
)


@pytest.fixture(scope="module")
def wf():
    # corpus where "ing" / "un" / "able" are productive subwords
    words = {"walking": 50, "talking": 40, "jumping": 30, "sing": 20,
             "unable": 25, "unfit": 15, "stable": 10, "able": 35,
             "walk": 22, "talk": 18, "a": 60, "to": 55}
    return pd.DataFrame({"word": list(words), "freq": list(words.values())})


def test_seed_contains_all_chars_and_frequent_substrings(wf):
    seed = seed_vocabulary(wf, max_piece_len=6, seed_size=200)
    chars = set("".join(wf["word"]))
    assert chars <= set(seed)
    assert "ing" in seed and "able" in seed
    # substring counts carry word frequency
    assert seed["ing"] >= 50 + 40 + 30 + 20


def test_forward_backward_matches_hand_lattice():
    # word "ab" with pieces a, b, ab: Z = log(e^{la+lb} + e^{lab})
    logp = {"a": math.log(0.5), "b": math.log(0.3), "ab": math.log(0.2)}
    exp, z = _forward_backward("ab", logp, 2)
    want_z = math.log(0.5 * 0.3 + 0.2)
    assert abs(z - want_z) < 1e-12
    p_split = 0.5 * 0.3 / (0.5 * 0.3 + 0.2)
    assert abs(exp["a"] - p_split) < 1e-12
    assert abs(exp["ab"] - (1 - p_split)) < 1e-12


def test_em_increases_likelihood(wf):
    seed = seed_vocabulary(wf, max_piece_len=6, seed_size=100)
    total = sum(seed.values())
    vocab = {p: math.log(c / total) for p, c in seed.items()}
    v1, ll1 = _em_round(vocab, wf, 6)
    v2, ll2 = _em_round(v1, wf, 6)
    _v3, ll3 = _em_round(v2, wf, 6)
    assert ll2 >= ll1 - 1e-9
    assert ll3 >= ll2 - 1e-9


def test_train_prunes_to_size_and_keeps_chars(wf):
    out = train_unigram(wf, vocab_size=30, max_piece_len=6, seed_size=150)
    assert len(out) <= 30
    chars = set("".join(wf["word"]))
    assert chars <= set(out["piece"])
    # the productive subwords survive pruning
    assert "ing" in set(out["piece"])
    # log-probs normalized-ish (sum of probs <= 1 + eps)
    assert np.exp(out["logp"].to_numpy()).sum() <= 1.0 + 1e-6


def test_viterbi_segments_with_learned_pieces(wf):
    out = train_unigram(wf, vocab_size=30, max_piece_len=6, seed_size=150)
    logp = dict(zip(out["piece"], out["logp"]))
    segs = viterbi_encode_word("walking", logp, 6)
    assert "".join(segs) == "walking"
    assert len(segs) < len("walking")  # better than char-level
    # unseen characters fall back to per-char segmentation
    assert viterbi_encode_word("xyz", logp, 6) == ["x", "y", "z"]


def test_unigram_encode_dataset(ray_session, wf):
    import ray.data as rd

    out = train_unigram(wf, vocab_size=30, max_piece_len=6, seed_size=150)
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["walking to sing", "unable a talk"],
    })
    enc = (unigram_encode(rd.from_pandas(docs), out, max_piece_len=6)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert (enc["n_pieces"] > 0).all()
    pieces = (unigram_encode(rd.from_pandas(docs), out, max_piece_len=6,
                             out="pieces")
              .to_pandas())
    # lossless: concatenating a doc's pieces rebuilds its words
    joined = pieces.groupby("doc_id")["piece"].apply("".join)
    assert joined[0] == "walkingtosing"
    assert int(enc.loc[0, "n_pieces"]) == (pieces["doc_id"] == 0).sum()
