"""S2/S3 executed-path integration test: the engine's JDBC face
against an embedded DuckDB database over the public
``org.duckdb:duckdb_jdbc`` driver.

Covers the reference's live-database path end-to-end
(main_pipeline.py:147-169, 283-286): information_schema catalog scan →
driver-side month-table pruning → per-table pushed-query JDBC scans →
``unionByName`` fold → range-partitioned parallel read.

Runs in a subprocess because the driver jar must be on the JVM
classpath at session creation, and the shared test session is already
running. Skips (with reason) when no cached driver jar is present —
the option-dict unit tests still cover the declarative surface.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import textwrap

import pytest


def _find_driver_jar() -> str | None:
    for root in ("~/.cache/coursier", "~/.m2", "~/.ivy2"):
        hits = glob.glob(
            os.path.join(os.path.expanduser(root), "**", "duckdb_jdbc*.jar"),
            recursive=True,
        )
        if hits:
            return hits[0]
    return None


_CHILD = textwrap.dedent(
    """
    import datetime as dt, json, os, sys
    sys.path.insert(0, sys.argv[1])
    jar, db = sys.argv[2], sys.argv[3]

    import duckdb
    con = duckdb.connect(db)
    for ym, n in (("2023_12", 40), ("2024_01", 100), ("2024_02", 50)):
        con.execute(
            f"CREATE TABLE sensor_raw_{ym} AS "
            f"SELECT range AS tagid, range * 1000 AS t_stamp, "
            f"range * 1.5 AS value, 1 AS dataintegrity FROM range({n})"
        )
    con.execute(
        "CREATE TABLE tags AS SELECT range AS id, "
        "CASE WHEN range % 3 = 0 THEN 'plant/temp_' || range "
        "     WHEN range % 3 = 1 THEN 'plant/pressure_' || range "
        "     ELSE 'office/hvac_' || range END AS tagpath "
        "FROM range(30)"
    )
    con.close()

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[4]").appName("jdbc-it")
        .config("spark.jars", jar)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sensorstream_scalable_sensor_data_pipeline_spark.sources.catalog import (
        prune_month_tables, regex_predicate_sql, union_month_tables,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.readers import (
        jdbc_read_options, read_jdbc,
    )

    url = f"jdbc:duckdb:{db}"

    def jdbc(query, **kw):
        opts = jdbc_read_options(url, query, user="", password="",
                                 partition_column=None, **kw)
        opts["driver"] = "org.duckdb.DuckDBDriver"
        return read_jdbc(spark, **opts)

    # S4 over JDBC: catalog scan exactly like main_pipeline.py:283-286.
    names = [
        r[0] for r in jdbc(
            "SELECT table_name FROM information_schema.tables"
        ).collect()
    ]
    # F7: prune by cutoff month (2024-01-15 keeps 2024_01 + 2024_02).
    keep = prune_month_tables(names, "sensor_raw", dt.datetime(2024, 1, 15))
    # S2 + U1: pushed per-table query, fold of unionByName.
    scans = [
        jdbc(f"SELECT tagid, value FROM {t} WHERE dataintegrity <> 0")
        for t in keep
    ]
    unioned = union_month_tables(scans)

    # P8/J3 over JDBC: the reference's _get_matching_ids flow
    # (main_pipeline.py:343-350) — regex predicate PUSHED to the
    # database (Postgres dialect: `tagpath ~ 'p'`; DuckDB spelling
    # used here), matching ids collected, then the IN-list pushed
    # into the extraction query.
    pred = regex_predicate_sql(
        "tagpath", ["temp_[0-9]+", "pressure_"], dialect="duckdb"
    )
    ids = sorted(
        int(r[0]) for r in jdbc(f"SELECT id FROM tags WHERE {pred}").collect()
    )
    id_csv = ",".join(str(i) for i in ids)
    matched = jdbc(
        f"SELECT tagid FROM sensor_raw_2024_01 WHERE tagid IN ({id_csv})"
    )

    # S3: range-partitioned parallel read of one month table.
    popts = jdbc_read_options(
        url, "", user="", password="",
        partition_column="tagid", lower_bound=0, upper_bound=100,
        num_partitions=4,
    )
    del popts["query"]
    popts.update(dbtable="sensor_raw_2024_01", driver="org.duckdb.DuckDBDriver")
    part = read_jdbc(spark, **popts)

    print(json.dumps({
        "names": sorted(names),
        "keep": keep,
        "union_rows": unioned.count(),
        "part_rows": part.count(),
        "part_n": part.rdd.getNumPartitions(),
        "regex_ids": ids,
        "matched_rows": matched.count(),
    }))
    spark.stop()
    """
)


@pytest.mark.skipif(
    _find_driver_jar() is None,
    reason="no duckdb_jdbc driver jar in local maven/coursier cache",
)
def test_jdbc_month_table_flow(tmp_path):
    jar = _find_driver_jar()
    db = str(tmp_path / "it.db")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, jar, db],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(out["names"]) >= {
        "sensor_raw_2023_12", "sensor_raw_2024_01", "sensor_raw_2024_02"
    }
    assert out["keep"] == ["sensor_raw_2024_01", "sensor_raw_2024_02"]
    assert out["union_rows"] == 150  # 100 + 50; 2023_12 pruned
    assert out["part_rows"] == 100
    assert out["part_n"] == 4
    # regex pushdown matched temp_* (ids ≡ 0 mod 3) and pressure_*
    # (ids ≡ 1 mod 3) of 30 tags, and the IN-list extraction hit
    # exactly those sensors
    assert out["regex_ids"] == sorted(
        i for i in range(30) if i % 3 in (0, 1)
    )
    assert out["matched_rows"] == 20


def test_regex_predicate_sql_dialects():
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.catalog import (
        regex_predicate_sql,
    )

    pg = regex_predicate_sql("tagpath", ["temp_[0-9]+", "^plant/"])
    assert pg == "(tagpath ~ 'temp_[0-9]+' OR tagpath ~ '^plant/')"
    dk = regex_predicate_sql("tagpath", ["temp_[0-9]+"], dialect="duckdb")
    assert dk == "(regexp_matches(tagpath, 'temp_[0-9]+'))"
    with pytest.raises(ValueError, match="quotes"):
        regex_predicate_sql("t", ["bad'pattern"])
    with pytest.raises(ValueError, match="pattern required"):
        regex_predicate_sql("t", [])
    with pytest.raises(ValueError, match="dialect"):
        regex_predicate_sql("t", ["x"], dialect="oracle")


def test_regex_predicate_sql_matches_reference_where_shape():
    """Pin the generated Postgres condition to the reference's exact
    WHERE shape (main_pipeline.py:347-349):
    ``" OR ".join(f"tagpath ~ '{pattern}'" for pattern in patterns)``.
    Our helper only adds one enclosing paren pair (safe inside any
    WHERE); each ``col ~ 'pat'`` term and the `` OR `` joiner must be
    byte-identical to what the reference pushes to PostgreSQL."""
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.catalog import (
        regex_predicate_sql,
    )

    patterns = ["sensor/temp_.*", "sensor/pressure_.*", "^plant/energy"]
    reference_condition = " OR ".join(f"tagpath ~ '{p}'" for p in patterns)
    got = regex_predicate_sql("tagpath", patterns, dialect="postgres")
    assert got == f"({reference_condition})"
    # and it drops into the reference's query template unchanged
    assert (
        f"SELECT id FROM your_tags_table WHERE {got}"
        == f"SELECT id FROM your_tags_table WHERE ({reference_condition})"
    )


_WRITE_CHILD = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, sys.argv[1])
    jar, db = sys.argv[2], sys.argv[3]

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[4]").appName("jdbc-write-it")
        .config("spark.jars", jar)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sensorstream_scalable_sensor_data_pipeline_spark.sources.readers import (
        jdbc_read_options, read_jdbc,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.writers import write_jdbc

    # Pre-create the sink: Spark's JDBC relation probes table
    # existence with a prepared SELECT, which the DuckDB driver
    # fails hard on for a MISSING table (instead of returning
    # empty) — the realistic deployment writes into a provisioned
    # table anyway.
    import duckdb
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE sink_test (tagid BIGINT, value DOUBLE, bucket INT)"
    )
    con.close()

    url = f"jdbc:duckdb:{db}"
    df = spark.range(500).selectExpr(
        "id AS tagid", "id * 1.5 AS value", "CAST(id % 7 AS INT) AS bucket"
    ).repartition(8)

    write_jdbc(
        df, url, "sink_test", driver="org.duckdb.DuckDBDriver",
        max_connections=2, batch_size=100,
    )
    # overwrite is idempotent: second write replaces, not appends
    write_jdbc(
        df, url, "sink_test", driver="org.duckdb.DuckDBDriver",
        max_connections=2,
    )

    opts = jdbc_read_options(url, "SELECT count(*) AS n, CAST(sum(tagid) AS BIGINT) AS s FROM sink_test",
                             user="", password="", partition_column=None)
    opts["driver"] = "org.duckdb.DuckDBDriver"
    row = read_jdbc(spark, **opts).collect()[0]
    print(json.dumps({"n": int(row["n"]), "s": int(row["s"])}))
    spark.stop()
    """
)


@pytest.mark.skipif(
    _find_driver_jar() is None,
    reason="no duckdb_jdbc driver jar in local maven/coursier cache",
)
def test_jdbc_write_roundtrip(tmp_path):
    jar = _find_driver_jar()
    db = str(tmp_path / "sink.db")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _WRITE_CHILD, repo, jar, db],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out == {"n": 500, "s": 500 * 499 // 2}
    # the written database is a plain DuckDB file: native read agrees
    import duckdb

    con = duckdb.connect(db)
    n, s = con.execute("SELECT count(*), sum(tagid) FROM sink_test").fetchone()
    con.close()
    assert (int(n), int(s)) == (500, 500 * 499 // 2)
