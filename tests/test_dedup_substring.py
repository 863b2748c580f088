"""Exact-substring dedup (operators/dedup_substring.py): planted
duplicated passages removed everywhere but the canonical copy, a
pure-Python replay oracle over a seeded synthetic corpus, order
preservation, thresholds, and the no-cartesian plan pin."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_substring import (
    remove_duplicate_spans,
    span_windows,
)


def _replay(docs: dict[int, str], span: int, min_occ: int) -> dict[int, str]:
    """Independent reimplementation: window fingerprints → global
    canonical per fingerprint → interval merge → token filter."""
    toks = {d: t.split() for d, t in docs.items()}
    occs: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        tk = [x.lower() for x in toks[d]]
        for i in range(len(tk) - span + 1):
            fp = hashlib.md5(" ".join(tk[i : i + span]).encode()).hexdigest()
            occs.setdefault(fp, []).append((d, i))
    removed: dict[int, set[int]] = {d: set() for d in toks}
    for fp, sites in occs.items():
        if len(sites) < min_occ:
            continue
        canon = min(sites)
        for d, i in sites:
            if (d, i) != canon:
                removed[d].update(range(i, i + span))
    return {
        d: " ".join(t for i, t in enumerate(toks[d]) if i not in removed[d])
        for d in toks
    }


def _run(spark, docs: dict[int, str], span: int, min_occ: int = 2) -> dict[int, str]:
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = remove_duplicate_spans(
        df, span_tokens=span, min_occurrences=min_occ
    )
    return {r["doc_id"]: r["text"] for r in out.collect()}


def test_planted_passage_kept_once(spark):
    """A passage shared by three documents survives only in the
    lowest-id document; surrounding text is untouched, order kept."""
    passage = " ".join(f"p{i}" for i in range(6))
    docs = {
        1: f"alpha beta {passage} gamma delta",
        2: f"one two three {passage} four",
        3: f"{passage} tail words here",
        4: "completely unrelated content with no repeats at all",
    }
    got = _run(spark, docs, span=6)
    assert got == _replay(docs, 6, 2)
    assert passage in got[1]
    assert passage not in got[2] and passage not in got[3]
    assert got[4] == docs[4]
    assert got[2] == "one two three four"  # order + surroundings kept


def test_whole_document_duplicate_empties_the_copy(spark):
    text = " ".join(f"w{i}" for i in range(10))
    docs = {5: text, 9: text}
    got = _run(spark, docs, span=5)
    assert got[5] == text  # canonical copy intact
    assert got[9] == ""  # every window duplicated → all tokens covered


def test_internal_repetition_within_one_document(spark):
    chunk = " ".join(f"r{i}" for i in range(5))
    docs = {1: f"{chunk} middle words {chunk}"}
    got = _run(spark, docs, span=5)
    assert got == _replay(docs, 5, 2)
    assert got[1].startswith(chunk)  # first occurrence kept
    assert got[1].count("r0") == 1  # second removed


def test_min_occurrences_threshold(spark):
    passage = " ".join(f"q{i}" for i in range(5))
    docs = {1: f"{passage} x", 2: f"{passage} y", 3: f"{passage} z"}
    # threshold 4 > 3 occurrences → nothing removed
    got = _run(spark, docs, span=5, min_occ=4)
    assert all(passage in t for t in got.values())
    # threshold 3 → only the canonical keeps it
    got = _run(spark, docs, span=5, min_occ=3)
    assert got == _replay(docs, 5, 3)
    assert passage in got[1]
    assert passage not in got[2] and passage not in got[3]


def test_case_insensitive_matching_preserves_original_case(spark):
    passage = "The Quick Brown Fox Jumps"
    docs = {1: f"{passage} ok", 2: f"{passage.lower()} no"}
    got = _run(spark, docs, span=5)
    assert got[1] == f"{passage} ok"  # canonical keeps ORIGINAL case
    assert got[2] == "no"


def test_replay_oracle_on_seeded_random_corpus(spark):
    """Seeded random corpus with planted cross-document and internal
    duplicates: the distributed result equals the independent Python
    replay exactly."""
    import random

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(200)]
    base = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 60)))
        for d in range(1, 25)
    }
    passage = " ".join(rng.choice(vocab) for _ in range(12))
    for d in (3, 7, 19):
        base[d] = f"{base[d]} {passage}"
    base[11] = f"{passage} {base[11]} {passage}"
    got = _run(spark, base, span=8)
    assert got == _replay(base, 8, 2)
    assert any(got[d] != base[d] for d in (3, 7, 11, 19))


def test_counts_and_untouched_passthrough(spark):
    passage = " ".join(f"c{i}" for i in range(5))
    docs = {1: f"{passage} a b", 2: f"{passage} c d"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, span_tokens=5).collect()
    }
    assert rows[1]["n_tokens"] == 7 and rows[1]["n_tokens_removed"] == 0
    assert rows[2]["n_tokens"] == 7 and rows[2]["n_tokens_removed"] == 5


def test_validation_and_short_docs(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, span_tokens=1)
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, min_occurrences=1)
    # shorter than the span → no windows, passthrough
    assert span_windows(df, "doc_id", "text", 5).count() == 0
    out = remove_duplicate_spans(df, span_tokens=5).collect()[0]
    assert out["text"] == "a b" and out["n_tokens_removed"] == 0


def test_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, "x y z w v u t s") for i in range(4)], "doc_id long, text string"
    )
    plan = (
        remove_duplicate_spans(df, span_tokens=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
