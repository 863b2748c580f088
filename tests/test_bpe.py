"""Corpus-trained BPE (operators/bpe.py): classic-example merges
reproduced, an independent replay over a seeded corpus, unseen-word
generalization, distributed count consistency, determinism."""

from __future__ import annotations

import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.operators.bpe import (
    EOW,
    apply_merges,
    bpe_token_stats,
    piece_mapping,
    train_bpe,
    word_counts,
)

#: The Sennrich-paper-style teaching corpus: word frequencies
#: low:5 lower:2 newest:6 widest:3.
_CLASSIC = " ".join(
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def _replay_train(freqs: dict[str, int], n: int, min_count: int = 2):
    """Independent naive reimplementation of the trainer."""
    words = {}
    for w, c in freqs.items():
        sym = tuple(list(w[:-1]) + [w[-1] + EOW]) if w else ()
        words[sym] = words.get(sym, 0) + c
    merges = []
    for _ in range(n):
        pairs: dict = {}
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = pairs.get((sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        nxt = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


def test_classic_corpus_first_merges(spark):
    docs = spark.createDataFrame([(1, _CLASSIC)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=10)
    # 'es' occurs in newest(6)+widest(3)=9 — the classic first merge
    # (ties at 9 with ('s','t</w>'); lexicographic tie-break picks it)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", f"t{EOW}")
    # replay-check the whole list instead of hand-deriving deep merges
    assert merges == _replay_train(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10
    )


def test_encode_matches_training_segmentation(spark):
    docs = spark.createDataFrame([(1, _CLASSIC)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=10)
    # pieces of a trained word concatenate back to word + EOW marker
    for w in ("low", "lower", "newest", "widest"):
        pieces = apply_merges(w, merges)
        assert "".join(pieces) == w + EOW
    # UNSEEN word: generalizes via learned subwords, never fails
    pieces = apply_merges("lowest", merges)
    assert "".join(pieces) == "lowest" + EOW
    assert 1 < len(pieces) < len("lowest") + 1  # compressed but not whole


def test_bpe_token_stats_distributed_consistency(spark):
    docs = spark.createDataFrame(
        [(1, _CLASSIC), (2, "low lower"), (3, "newest")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=8)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in bpe_token_stats(docs, merges).collect()
    }
    # independent per-doc recompute through the pure encoder
    for did, text in [(1, _CLASSIC), (2, "low lower"), (3, "newest")]:
        words = text.split()
        want = sum(len(apply_merges(w, merges)) for w in words)
        assert got[did] == (len(words), want), did


def test_seeded_corpus_replay_and_determinism(spark):
    import random

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    text = " ".join(rng.choice(vocab) for _ in range(300))
    docs = spark.createDataFrame(
        [(i, text) for i in range(2)], "doc_id long, text string"
    ).repartition(5)
    freqs = {
        r["word"]: r["n"] for r in word_counts(docs).collect()
    }
    m1 = train_bpe(docs, n_merges=25)
    m2 = train_bpe(docs.repartition(2), n_merges=25)
    assert m1 == m2 == _replay_train(freqs, 25)  # partitioning-independent


def test_piece_mapping_runs_per_distinct_word(spark):
    docs = spark.createDataFrame([(1, _CLASSIC)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=5)
    words = word_counts(docs).select("word")
    mapped = {r["word"]: r["pieces"] for r in piece_mapping(words, merges).collect()}
    assert set(mapped) == {"low", "lower", "newest", "widest"}
    for w, pieces in mapped.items():
        assert pieces == apply_merges(w, merges)


def test_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_bpe(docs, n_merges=0)
    with pytest.raises(ValueError, match="max_vocab_rows"):
        train_bpe(docs, n_merges=1, max_vocab_rows=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        train_bpe(empty, n_merges=5)


#: Heavy-tail corpus: the classic head plus 50 distinct singleton
#: words all containing the bigram "zq" — uncapped, ("z", "q") has
#: count 50 and would be the FIRST merge; any cap/floor that excludes
#: the tail restores the classic ("e", "s") first merge. The learned
#: list therefore proves exactly which words reached the driver.
_TAIL = [f"zq{i:03d}" for i in range(50)]
_HEAVY = _CLASSIC + " " + " ".join(_TAIL)
_HEAD_FREQS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_max_vocab_rows_caps_the_driver_collect(spark):
    docs = spark.createDataFrame(
        [(1, _HEAVY)], "doc_id long, text string"
    ).repartition(4)
    # uncapped: the 50-singleton tail dominates pair counts — ("q","0")
    # and ("z","q") both hit 50, lexicographic tie-break picks the first
    assert train_bpe(docs, n_merges=3)[0] == ("q", "0")
    # capped to the 4 head words (counts 6,5,3,2 — all above any
    # singleton): tail never reaches the driver, classic merges return
    capped = train_bpe(docs, n_merges=10, max_vocab_rows=4)
    assert capped[0] == ("e", "s")
    assert capped == _replay_train(_HEAD_FREQS, 10)


def test_max_vocab_rows_tie_break_is_deterministic(spark):
    # 3 singleton words, cap 2: the top-N cut ties on count and must
    # resolve by word ascending whatever the partitioning
    docs = spark.createDataFrame(
        [(1, "ccc aaa bbb")], "doc_id long, text string"
    )
    for parts in (1, 3):
        m = train_bpe(
            docs.repartition(parts), n_merges=5,
            max_vocab_rows=2, min_pair_count=1,
        )
        assert m == _replay_train({"aaa": 1, "bbb": 1}, 5, min_count=1)


def test_min_word_count_floor(spark):
    docs = spark.createDataFrame([(1, _HEAVY)], "doc_id long, text string")
    floored = train_bpe(docs, n_merges=10, min_word_count=2)
    assert floored == _replay_train(_HEAD_FREQS, 10)


def test_token_stats_shuffle_fallback_above_broadcast_cap(spark):
    docs = spark.createDataFrame(
        [(1, _CLASSIC), (2, "low lower zq000")], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=8)
    want = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in bpe_token_stats(docs, merges).collect()
    }
    # cap of 1 forces the shuffle-join path (5 distinct words > 1);
    # results must be identical to the broadcast plan
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in bpe_token_stats(docs, merges, max_broadcast_vocab=1).collect()
    }
    assert got == want
