"""MERGE upsert + SCD2 (sources/merge.py): partition-pruned upsert
into parquet, DuckDB-oracled SCD2 version chains, point-in-time
snapshots."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.sources.merge import (
    SCD2_OPEN_END,
    asof_snapshot,
    merge_upsert,
    scd2_apply,
    scd2_init,
)

# ------------------------------------------------------------- upsert


def _seed(spark, path):
    rows = [
        (1, "a", 10.0, "p1"),
        (2, "b", 20.0, "p1"),
        (3, "c", 30.0, "p2"),
        (4, "d", 40.0, "p3"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, val double, pc string")
    merge_upsert(spark, path, df, ["id"], "pc")  # create-on-first-merge
    return df


def _read(spark, path):
    return {
        (r["id"]): (r["name"], r["val"], r["pc"])
        for r in spark.read.parquet(path).collect()
    }


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    upd = spark.createDataFrame(
        [(2, "B2", 22.0, "p1"), (5, "e", 50.0, "p2")],
        "id long, name string, val double, pc string",
    )
    merge_upsert(spark, path, upd, ["id"], "pc")
    got = _read(spark, path)
    assert got == {
        1: ("a", 10.0, "p1"),
        2: ("B2", 22.0, "p1"),
        3: ("c", 30.0, "p2"),
        4: ("d", 40.0, "p3"),
        5: ("e", 50.0, "p2"),
    }


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    before = set(glob.glob(os.path.join(path, "pc=p3", "*.parquet")))
    upd = spark.createDataFrame(
        [(1, "A", 11.0, "p1")], "id long, name string, val double, pc string"
    )
    merge_upsert(spark, path, upd, ["id"], "pc")
    after = set(glob.glob(os.path.join(path, "pc=p3", "*.parquet")))
    assert before == after  # untouched partition: same physical files
    assert _read(spark, path)[1] == ("A", 11.0, "p1")
    assert _read(spark, path)[4] == ("d", 40.0, "p3")


def test_merge_upsert_moving_key_contract(spark, tmp_path):
    """Default contract: keys do not move partitions (a moved key's
    stale copy survives — asserted, it IS the documented behavior);
    keys_move_partitions=True also rewrites the key's old home."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    moved = spark.createDataFrame(
        [(3, "c3", 33.0, "p1")], "id long, name string, val double, pc string"
    )
    merge_upsert(spark, path, moved, ["id"], "pc")
    rows = spark.read.parquet(path).filter(F.col("id") == 3).collect()
    assert len(rows) == 2  # stale p2 copy + new p1 copy

    path2 = str(tmp_path / "t2")
    _seed(spark, path2)
    merge_upsert(spark, path2, moved, ["id"], "pc", keys_move_partitions=True)
    rows = spark.read.parquet(path2).filter(F.col("id") == 3).collect()
    assert [(r["name"], r["val"], r["pc"]) for r in rows] == [("c3", 33.0, "p1")]


def test_merge_upsert_rejects_partition_col_in_keys(spark, tmp_path):
    df = spark.createDataFrame([(1, "p")], "id long, pc string")
    with pytest.raises(ValueError):
        merge_upsert(spark, str(tmp_path / "x"), df, ["id", "pc"], "pc")


# --------------------------------------------------------------- scd2

SNAP = [
    (1, "sensor-a", "site-1", "2024-01-01 00:00:00"),
    (2, "sensor-b", "site-1", "2024-01-01 00:00:00"),
    (3, "sensor-c", "site-2", "2024-01-01 00:00:00"),
]
BATCH1 = [
    (1, "sensor-a", "site-2", "2024-02-01 00:00:00"),  # moved site
    (2, "sensor-b", "site-1", "2024-02-01 00:00:00"),  # unchanged -> no-op
    (4, "sensor-d", "site-3", "2024-02-01 00:00:00"),  # new key
]
BATCH2 = [
    (1, "sensor-a2", "site-2", "2024-03-01 00:00:00"),  # renamed
    (3, "sensor-c", None, "2024-03-01 00:00:00"),  # attr -> NULL (a change)
]
SCHEMA_SNAP = "k long, name string, site string, eff string"
KEYS, ATTRS = ["k"], ["name", "site"]

_SCD2_APPLY_SQL = f"""
WITH cur AS (SELECT * FROM {{dim}} WHERE is_current),
closed AS (SELECT * FROM {{dim}} WHERE NOT is_current),
u AS (SELECT k, name AS u_name, site AS u_site, CAST(eff AS TIMESTAMP) AS eff
      FROM {{upd}}),
j AS (SELECT * FROM cur FULL OUTER JOIN u USING (k)),
keep_cur AS (
  SELECT k, name, site, valid_from, valid_to, is_current FROM j
  WHERE valid_from IS NOT NULL AND (eff IS NULL OR
        (name IS NOT DISTINCT FROM u_name AND site IS NOT DISTINCT FROM u_site))
),
close_old AS (
  SELECT k, name, site, valid_from, eff AS valid_to, FALSE AS is_current FROM j
  WHERE eff IS NOT NULL AND valid_from IS NOT NULL AND NOT
        (name IS NOT DISTINCT FROM u_name AND site IS NOT DISTINCT FROM u_site)
),
open_new AS (
  SELECT k, u_name AS name, u_site AS site, eff AS valid_from,
         CAST('{SCD2_OPEN_END}' AS TIMESTAMP) AS valid_to, TRUE AS is_current
  FROM j
  WHERE eff IS NOT NULL AND (valid_from IS NULL OR NOT
        (name IS NOT DISTINCT FROM u_name AND site IS NOT DISTINCT FROM u_site))
)
SELECT * FROM closed UNION ALL SELECT * FROM keep_cur
UNION ALL SELECT * FROM close_old UNION ALL SELECT * FROM open_new
"""


def _rowset(df):
    return {
        (
            r["k"],
            r["name"],
            r["site"],
            str(r["valid_from"]),
            str(r["valid_to"]),
            r["is_current"],
        )
        for r in (df.collect() if hasattr(df, "collect") else df.itertuples())
    }


def _duck_oracle(tmp_path):
    """Replay snapshot + both batches in DuckDB with the mirrored SQL."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE snap (k BIGINT, name TEXT, site TEXT, eff TEXT)"
    )
    con.executemany("INSERT INTO snap VALUES (?,?,?,?)", SNAP)
    con.execute(
        f"""CREATE TABLE dim0 AS
        SELECT k, name, site, CAST(eff AS TIMESTAMP) AS valid_from,
               CAST('{SCD2_OPEN_END}' AS TIMESTAMP) AS valid_to,
               TRUE AS is_current FROM snap"""
    )
    for i, batch in enumerate([BATCH1, BATCH2]):
        con.execute(f"CREATE TABLE upd{i} (k BIGINT, name TEXT, site TEXT, eff TEXT)")
        con.executemany(f"INSERT INTO upd{i} VALUES (?,?,?,?)", batch)
        con.execute(
            f"CREATE TABLE dim{i + 1} AS "
            + _SCD2_APPLY_SQL.format(dim=f"dim{i}", upd=f"upd{i}")
        )
    return con


def _spark_dim(spark):
    snap = spark.createDataFrame(SNAP, SCHEMA_SNAP)
    dim = scd2_init(snap, KEYS, ATTRS, "eff")
    for batch in [BATCH1, BATCH2]:
        upd = spark.createDataFrame(batch, SCHEMA_SNAP)
        dim = scd2_apply(dim, upd, KEYS, ATTRS, "eff")
    return dim


def test_scd2_chain_matches_duckdb_oracle(spark, tmp_path):
    got = {
        (r["k"], r["name"], r["site"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in _spark_dim(spark).collect()
    }
    con = _duck_oracle(tmp_path)
    want = {
        (k, n, s, str(vf), str(vt), ic)
        for k, n, s, vf, vt, ic in con.execute(
            "SELECT k, name, site, valid_from, valid_to, is_current FROM dim2"
        ).fetchall()
    }
    assert got == want
    # structural sanity: exactly one current row per live key, version
    # intervals abut (closed row's valid_to == successor's valid_from)
    cur = [t for t in got if t[5]]
    assert sorted(t[0] for t in cur) == [1, 2, 3, 4]
    k1 = sorted((t for t in got if t[0] == 1), key=lambda t: t[3])
    assert [t[1] for t in k1] == ["sensor-a", "sensor-a", "sensor-a2"]
    assert k1[0][4] == k1[1][3] and k1[1][4] == k1[2][3]


def test_scd2_idempotent_reapply(spark):
    dim = _spark_dim(spark)
    upd = spark.createDataFrame(BATCH2, SCHEMA_SNAP)
    again = scd2_apply(dim, upd, KEYS, ATTRS, "eff")
    assert again.count() == dim.count()  # identical attrs -> no versions


def test_asof_snapshot_boundaries(spark):
    dim = _spark_dim(spark)

    def site_of(at, k):
        rows = asof_snapshot(dim, at).filter(F.col("k") == k).collect()
        return rows[0]["site"] if rows else None

    assert site_of("2024-01-15 00:00:00", 1) == "site-1"
    # boundary instant: from inclusive, to exclusive -> the NEW row
    assert site_of("2024-02-01 00:00:00", 1) == "site-2"
    assert site_of("2024-06-01 00:00:00", 1) == "site-2"
    assert site_of("2023-12-01 00:00:00", 1) is None
    assert site_of("2024-01-15 00:00:00", 4) is None
    assert site_of("2024-04-01 00:00:00", 3) is None  # NULL site is current


def test_merge_upsert_existence_probe_not_string_match(spark, tmp_path):
    """Create-on-first-merge is decided by a FileSystem existence
    probe, not exception-string matching (r7 verdict #5): a missing
    path bootstraps; an EXISTING but unreadable path (empty dir — no
    parquet to infer from) propagates the real error instead of being
    silently treated as a fresh table."""
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.merge import (
        _path_exists,
    )

    missing = str(tmp_path / "nope")
    assert not _path_exists(spark, missing)
    upd = spark.createDataFrame(
        [(1, "a", 1.0, "p1")], "id long, name string, val double, pc string"
    )
    merge_upsert(spark, missing, upd, ["id"], "pc")  # bootstraps
    assert _path_exists(spark, missing)

    empty = str(tmp_path / "existing_empty")
    os.makedirs(empty)
    with pytest.raises(Exception) as exc:
        merge_upsert(spark, empty, upd, ["id"], "pc")
    assert "UNABLE_TO_INFER" in str(exc.value) or "infer" in str(exc.value).lower()
