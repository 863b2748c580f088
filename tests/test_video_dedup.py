"""Frame-sampled video dedup (operators/video_dedup.py).

Planted variants are real container/codec transformations over the
repo AVI codec — a DIB → MJPEG-q85 re-encode (measured: ~83 % of
frames keep a bit-exact pHash, the rest drift ≤ 2 bits) and a head
trim (sampled hashes align at the exact negative frame offset) —
against independently generated footage.
"""

from __future__ import annotations

import numpy as np
import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
    decode_avi_frames,
    encode_avi,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.phash import (
    phash64_pixels,
    synth_image,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.video_dedup import (
    dedup_videos,
    video_candidates,
    video_candidates_cross,
    with_frame_phashes,
)


def make_video(seed: int, n: int = 12, h: int = 48, w: int = 64) -> np.ndarray:
    return np.stack([synth_image(seed * 1000 + i, h=h, w=w) for i in range(n)])


def test_frame_phashes_spark_matches_local(spark):
    vid = make_video(1)
    payload = encode_avi(vid, codec="dib")
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["frame_idx"]): r["phash"]
        for r in with_frame_phashes(df, "doc_id", "payload", every_n=4).collect()
    }
    frames, _ = decode_avi_frames(payload)
    want = {
        (7, fi): phash64_pixels(frames[fi]) for fi in range(0, 12, 4)
    }
    assert got == want


def test_video_candidates_reencode_and_trim(spark):
    """A MJPEG re-encode matches at offset 0 with a high frame
    fraction; a 4-frame head trim matches at offset −4 (sampled
    every_n=2 keeps the trim a sample-grid multiple); distinct
    footage is absent."""
    vid = make_video(1, n=16)
    rows = [
        (0, encode_avi(vid, codec="dib")),
        (1, encode_avi(vid, codec="mjpg", quality=85)),
        (2, encode_avi(vid[4:], codec="dib")),
        (3, encode_avi(make_video(9, n=16), codec="dib")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fh = with_frame_phashes(df, "doc_id", "payload", every_n=2)
    got = {
        (r["id_a"], r["id_b"]): r
        for r in video_candidates(fh, "doc_id", min_match_frac=0.5).collect()
    }
    assert (0, 1) in got and got[(0, 1)]["offset"] == 0
    assert got[(0, 1)]["match_frac"] >= 0.5
    assert (0, 2) in got and got[(0, 2)]["offset"] == 4
    assert got[(0, 2)]["match_frac"] == 1.0
    assert not any(3 in k for k in got)
    # plan: keyed equi-join, never a nested loop
    plan = (
        video_candidates(fh, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_video_candidates_hamming_mode_equivalent_here(spark):
    """max_hamming=2 (pigeonhole frame join) finds at least the exact
    mode's pairs on the fixture — the fuzzier probe is a superset."""
    vid = make_video(1, n=16)
    rows = [
        (0, encode_avi(vid, codec="dib")),
        (1, encode_avi(vid, codec="mjpg", quality=85)),
        (2, encode_avi(make_video(9, n=16), codec="dib")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fh = with_frame_phashes(df, "doc_id", "payload", every_n=2)
    exact = {
        (r["id_a"], r["id_b"])
        for r in video_candidates(fh, "doc_id").collect()
    }
    fuzzy = {
        (r["id_a"], r["id_b"])
        for r in video_candidates(fh, "doc_id", max_hamming=2).collect()
    }
    assert exact <= fuzzy
    assert (0, 1) in fuzzy and not any(2 in k for k in fuzzy)


def test_dedup_videos_end_to_end(spark):
    """Two planted clusters (footage + re-encode + trim) + 2 singles
    → survivors are the min-ids + singles."""
    rows, did, clusters = [], 0, []
    for seed in (1, 21):
        vid = make_video(seed, n=16)
        members = []
        for payload in (
            encode_avi(vid, codec="dib"),
            encode_avi(vid, codec="mjpg", quality=85),
            encode_avi(vid[4:], codec="dib"),
        ):
            rows.append((did, payload))
            members.append(did)
            did += 1
        clusters.append(members)
    singles = []
    for seed in (31, 41):
        rows.append((did, encode_avi(make_video(seed, n=16), codec="dib")))
        singles.append(did)
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    kept = sorted(
        r["doc_id"]
        for r in dedup_videos(df, "doc_id", "payload", every_n=2).collect()
    )
    assert kept == sorted([min(c) for c in clusters] + singles)


def test_video_rejections():
    with pytest.raises(ValueError, match="every_n"):
        with_frame_phashes(None, "doc_id", "payload", every_n=0)
    with pytest.raises(ValueError, match="min_match_frac"):
        video_candidates(None, min_match_frac=0.0)


@pytest.mark.parametrize("level", [0, 128, 255])
def test_constant_frames_do_not_merge_distinct_clips(spark, level):
    """Two UNRELATED clips that both contain constant frames at the
    same sampled positions (fades/title cards — offset-consistent
    constant content) must NOT merge — at ANY constant level, not
    just black (ADVICE r11: a constant 128/255 frame's pHash is an
    arbitrary stable value set by sub-median DCT float noise, so the
    old hash-value guard only ever caught black). Degeneracy is now
    detected at hash time by pixel variance; the match_frac
    denominator keeps the full frame count so mostly-constant clips
    can't qualify on what remains."""
    const = np.full((8, 48, 64, 3), level, dtype=np.uint8)
    v1 = np.concatenate([const, make_video(1, n=8)])
    v2 = np.concatenate([const, make_video(9, n=8)])
    rows = [
        (0, encode_avi(v1, codec="dib")),
        (1, encode_avi(v2, codec="dib")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fh = with_frame_phashes(df, "doc_id", "payload", every_n=1)
    got = video_candidates(fh, "doc_id", min_match_frac=0.5).collect()
    assert got == []
    kept = sorted(
        r["doc_id"]
        for r in dedup_videos(df, "doc_id", "payload", every_n=1).collect()
    )
    assert kept == [0, 1]


def test_constant_frames_survive_reencode_guard(spark):
    """The variance threshold absorbs codec noise: an MJPEG-q85
    re-encode of a clip with mid-gray constant frames still marks
    those frames degenerate (reconstruction lands within ±2 levels of
    constant), so the re-encode PAIR still matches on its live frames
    only — found at offset 0 with full-denominator match_frac — while
    the constant frames never enter the join."""
    gray = np.full((4, 48, 64, 3), 128, dtype=np.uint8)
    v = np.concatenate([gray, make_video(3, n=12)])
    rows = [
        (0, encode_avi(v, codec="dib")),
        (1, encode_avi(v, codec="mjpg", quality=85)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fh = with_frame_phashes(df, "doc_id", "payload", every_n=1)
    # degenerate frames emit NULL hashes but still count toward the
    # denominator: 16 sampled frames/clip, 4 NULL on the DIB side
    per_clip = {
        r["doc_id"]: r["n"]
        for r in fh.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert per_clip == {0: 16, 1: 16}
    nulls = fh.filter("phash is null").groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in nulls}[0] == 4
    got = {
        (r["id_a"], r["id_b"]): r
        for r in video_candidates(fh, "doc_id", min_match_frac=0.4).collect()
    }
    assert (0, 1) in got and got[(0, 1)]["offset"] == 0
    # the denominator stays 16 (degenerates counted, never matched):
    # 7 of the 12 live frames survive q85 bit-exact here, so the pair
    # sits BELOW the 0.5 it would show under a live-only denominator
    assert got[(0, 1)]["match_frac"] <= 12 / 16


# ----------------------------- cross-table path / decontamination (r12)


def test_video_candidates_cross_matches_self_join_pairs(spark):
    """The cross-table frame-match → offset-vote chain finds exactly
    the a-side↔b-side pairs the self-join finds (same match_frac,
    negated offset) when the two tables partition one corpus."""
    vid = make_video(1, n=16)
    rows = [
        (0, encode_avi(vid, codec="dib")),
        (1, encode_avi(vid, codec="mjpg", quality=85)),
        (2, encode_avi(vid[4:], codec="dib")),
        (3, encode_avi(make_video(9, n=16), codec="dib")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fh = with_frame_phashes(df, "doc_id", "payload", every_n=2)
    cross = {
        (r["id_a"], r["id_b"]): (r["match_frac"], r["offset"])
        for r in video_candidates_cross(
            fh.filter("doc_id > 0"), fh.filter("doc_id = 0"),
            "doc_id", min_match_frac=0.5,
        ).collect()
    }
    selfj = {
        (r["id_b"], r["id_a"]): (r["match_frac"], r["offset"])
        for r in video_candidates(fh, "doc_id", min_match_frac=0.5).collect()
        if r["id_a"] == 0
    }
    assert set(cross) == set(selfj)
    for k, (frac, off) in cross.items():
        assert frac == selfj[k][0]
        assert off == -selfj[k][1]


def test_video_candidates_cross_plan_no_cartesian(spark):
    vid = make_video(1, n=8)
    fh = with_frame_phashes(
        spark.createDataFrame(
            [(0, encode_avi(vid, codec="dib"))], "doc_id long, payload binary"
        ),
        "doc_id", "payload", every_n=2,
    )
    for mh in (0, 2):
        plan = (
            video_candidates_cross(fh, fh, "doc_id", max_hamming=mh)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_videos(spark):
    """Video decontamination: corpus clips that are re-encodes /
    head-trims of EVAL footage drop; unrelated clips survive; the
    session CacheManager is left clean."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.video_dedup import (
        decontaminate_videos,
    )

    v1, v2 = make_video(1, n=16), make_video(2, n=16)
    eval_videos = spark.createDataFrame(
        [(100, encode_avi(v1, codec="dib")), (101, encode_avi(v2, codec="dib"))],
        "doc_id long, payload binary",
    )
    corpus = spark.createDataFrame(
        [
            (0, encode_avi(v1, codec="mjpg", quality=85)),  # eval twin
            (1, encode_avi(v2[4:], codec="dib")),           # eval twin (trim)
            (2, encode_avi(make_video(7, n=16), codec="dib")),  # clean
            (3, encode_avi(make_video(8, n=16), codec="dib")),  # clean
        ],
        "doc_id long, payload binary",
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    kept = sorted(
        r["doc_id"]
        for r in decontaminate_videos(corpus, eval_videos, every_n=2).collect()
    )
    assert kept == [2, 3]
    assert cm.isEmpty(), "decontaminate_videos leaked persisted frames"


def test_ingest_video_batch_incremental(spark, tmp_path):
    """Incremental video ingest: within-batch near-dup clusters
    collapse to min-id; a later batch re-delivering a re-encode or
    head-trim of ACCEPTED footage accepts nothing for it (history
    wins); genuinely new clips accept; resuming a committed batch_id
    returns the staged survivors without recompute."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_incremental import (
        ingest_video_batch,
        read_video_state,
    )

    sdir = str(tmp_path / "vidstate")
    v_a, v_b, v_c = make_video(1, n=16), make_video(2, n=16), make_video(3, n=16)
    b1 = spark.createDataFrame(
        [
            (0, encode_avi(v_a, codec="dib")),
            (1, encode_avi(v_a, codec="mjpg", quality=85)),  # in-batch dup of 0
            (2, encode_avi(v_b, codec="dib")),
        ],
        "doc_id long, payload binary",
    )
    a1 = sorted(
        r["doc_id"]
        for r in ingest_video_batch(
            spark, b1, sdir, every_n=2, batch_id="b1"
        ).collect()
    )
    assert a1 == [0, 2]
    assert read_video_state(spark, sdir).select("doc_id").distinct().count() == 2

    b2 = spark.createDataFrame(
        [
            (10, encode_avi(v_a[4:], codec="dib")),  # head-trim of accepted 0
            (11, encode_avi(v_c, codec="dib")),       # new
            (12, encode_avi(v_c, codec="mjpg", quality=85)),  # dup of 11
        ],
        "doc_id long, payload binary",
    )
    a2 = sorted(
        r["doc_id"]
        for r in ingest_video_batch(
            spark, b2, sdir, every_n=2, batch_id="b2"
        ).collect()
    )
    assert a2 == [11]
    assert read_video_state(spark, sdir).select("doc_id").distinct().count() == 3

    # resume: committed batch returns staged rows, state unchanged
    again = sorted(
        r["doc_id"]
        for r in ingest_video_batch(
            spark, b2, sdir, every_n=2, batch_id="b2"
        ).collect()
    )
    assert again == [11]

    # pure content semantics: re-delivering accepted content under a
    # fresh id accepts nothing
    b3 = spark.createDataFrame(
        [(20, encode_avi(v_b, codec="dib"))], "doc_id long, payload binary"
    )
    assert ingest_video_batch(spark, b3, sdir, every_n=2).collect() == []


def test_decontaminate_videos_empty_eval_keeps_all(spark):
    """Empty eval set → every corpus clip survives."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.video_dedup import (
        decontaminate_videos,
    )

    corpus = spark.createDataFrame(
        [(0, encode_avi(make_video(1, n=8), codec="dib"))],
        "doc_id long, payload binary",
    )
    empty = spark.createDataFrame([], "doc_id long, payload binary")
    kept = [
        r["doc_id"]
        for r in decontaminate_videos(corpus, empty, every_n=2).collect()
    ]
    assert kept == [0]


def test_decontaminate_videos_plan_broadcasts_id_antijoin(spark):
    """Video twin of the r13 anti-join fix pin: the contaminated-ID
    set broadcasts, so pixels never ride an exchange (the r12 plain
    join measured ~300 MB of payload shuffle at sf0.1)."""
    import numpy as np

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        encode_avi,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.phash import (
        synth_image,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.video_dedup import (
        decontaminate_videos,
    )

    def vid(seed):
        return encode_avi(
            np.stack([synth_image(seed * 100 + i, h=16, w=16) for i in range(4)]),
            codec="dib",
        )

    corpus = spark.createDataFrame(
        [(i, vid(i)) for i in range(3)], "doc_id long, payload binary"
    )
    ev = spark.createDataFrame([(100, vid(0))], "doc_id long, payload binary")
    plan = (
        decontaminate_videos(corpus, ev, every_n=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti, BuildRight" in plan
    left_anti_pos = plan.index("LeftAnti")
    assert "hashpartitioning(doc_id" not in plan[left_anti_pos:].split(
        "BroadcastExchange", 1
    )[0]
    # broadcast_ids=False (r14): the extreme-contamination escape
    # drops the forced hint so the planner can shuffle instead of
    # OOMing the driver on a corpus-sized ID set
    plain = decontaminate_videos(
        corpus, ev, every_n=1, broadcast_ids=False
    )
    assert "ResolvedHint" not in plain._jdf.queryExecution().analyzed().toString()
    assert {r["doc_id"] for r in plain.collect()} == {1, 2}
