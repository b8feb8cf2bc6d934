"""Driver-contract consistency checks + a fast oracle-parity smoke on a
few representative queries at sf0.001 (the full gate is
tools/verify_local.py)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from flink_wikipedia_spark.schemas import ALL_TABLES
from tests.conftest import SF_SMOKE

SMOKE_QUERIES = ["q_windowed_edit_size", "q_tpch_q1_pricing_summary", "q_minhash_signatures"]


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"domain", "edit_size", "window_start", "window_end"}


def test_entry_time_invariants(spark):
    """The round-4 regression: a 1000x-compressed ts column still passed
    the driver's rows>0 smoke with 45 plausible rows. The flagship's
    windows must span the fixture's real date range (2024-01) with a
    window count only un-corrupted timestamps can produce."""
    from pyspark.sql import functions as F

    df = entrymod.entry(spark)  # entry() itself asserts; re-check here
    lo, hi, nwin = df.select(
        F.min("window_start"), F.max("window_start"),
        F.countDistinct("window_start"),
    ).first()
    assert lo.year == 2024 and hi.year == 2024
    assert (hi - lo).days >= 20  # a month of events, not 45 minutes
    assert nwin > 100


def test_entry_detects_collapsed_timestamps(spark, monkeypatch):
    """entry() must raise, not return, when timestamps collapse — the
    exact failure mode of round 4 (micros misread as nanos => every ts
    divided by 1000 => all rows in a few windows)."""
    from pyspark.sql import functions as F

    real = entrymod.REGISTRY["q_windowed_edit_size"].fn

    def corrupted(spark_, sf_dir):
        df = real(spark_, sf_dir)
        # simulate the 1000x compression on the output windows
        return df.withColumn(
            "window_start",
            F.timestamp_seconds(F.unix_timestamp("window_start") / 1000),
        )

    qd = entrymod.REGISTRY["q_windowed_edit_size"]
    monkeypatch.setattr(qd, "fn", corrupted)
    with pytest.raises(AssertionError, match="corrupt|collapsed"):
        entrymod.entry(spark).count()


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40


def test_oracles_are_valid_duckdb_sql():
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    for name, sql in entrymod.oracle_sql().items():
        con.sql(sql)  # raises on syntax/semantic errors


@pytest.mark.parametrize("name", SMOKE_QUERIES)
def test_oracle_parity_smoke(spark, name):
    import pandas as pd

    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    sdf = entrymod.queries()[name](spark, SF_SMOKE).toPandas()
    odf = con.sql(entrymod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)


def test_oracle_value_parity_registry_tail(spark):
    """ADVICE r5: queries outside the 50-slot driver window never get a
    driver-recorded VALUE check, so a wrong oracle would lurk until the
    query rotates in. Mirror the driver's order-insensitive value
    comparison (via tools/verify_local.normalize) for every oracle-
    bearing tail query at sf0.001. One test, one loop — per-query
    parametrization would pay Spark-session overhead 70+ times."""
    from tools.verify_local import normalize, tz_kind

    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    tail = [n for n in list(qs)[50:] if n in oracles]
    assert len(tail) > 60  # the tail exists; a registry shrink is a bug
    failures = []
    for name in tail:
        try:
            sdf = qs[name](spark, SF_SMOKE).toPandas()
            odf = con.sql(oracles[name]).df()
            if len(sdf) != len(odf):
                failures.append(f"{name}: rows {len(sdf)} != {len(odf)}")
                continue
            if sorted(sdf.columns) != sorted(odf.columns):
                failures.append(f"{name}: columns differ")
                continue
            tz_bad = [
                c for c in sdf.columns if tz_kind(sdf[c]) != tz_kind(odf[c])
            ]
            if tz_bad:
                failures.append(f"{name}: tz-awareness differs on {tz_bad}")
                continue
            if not normalize(sdf).equals(normalize(odf)):
                failures.append(f"{name}: values differ")
        except Exception as exc:  # keep sweeping; report all at the end
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)


def test_cli_arg_parsing():
    from flink_wikipedia_spark.__main__ import parse_args

    a = parse_args(
        [
            "--source", "kafka", "--brokers", "b:9092", "--sink", "upsert",
            "--out", "/o", "--checkpoint", "/c", "--window", "10 minutes",
            "--mode", "update",
        ]
    )
    assert a.source == "kafka" and a.brokers == "b:9092"
    assert a.sink == "upsert" and a.window == "10 minutes" and a.mode == "update"

    b = parse_args(["--source", "file", "--path", "/p", "--checkpoint", "/c", "--once"])
    assert b.once and b.sink == "console"


def test_cli_curation_and_alignment_args():
    from flink_wikipedia_spark.__main__ import parse_args

    a = parse_args(
        [
            "--job", "curation", "--source", "file", "--path", "/docs",
            "--checkpoint", "/c", "--benchmark-fps", "/fps.parquet",
        ]
    )
    assert a.job == "curation" and a.benchmark_fps == "/fps.parquet"

    b = parse_args(
        [
            "--source", "wikipedia_sim", "--checkpoint", "/c",
            "--splits", "4", "--split-rates", "10,1,1,1",
            "--max-drift-seconds", "30",
        ]
    )
    assert b.splits == 4 and b.split_rates == "10,1,1,1"
    assert b.max_drift_seconds == 30 and b.job == "flagship"


def test_cli_query_job(spark, tmp_path, capsys):
    """--job query runs a registered batch query end-to-end: unknown
    names exit 2 with the hint, list mode prints the registry, --out
    writes parquet (in-process — a subprocess would pay a second JVM)."""
    from flink_wikipedia_spark.__main__ import main, parse_args

    a = parse_args(["--job", "query", "--query", "q_keyby_agg_edit_size"])
    assert a.job == "query" and a.sf_dir == "/root/testdata/sf0.001"

    assert main(["--job", "query", "--query", "nope"]) == 2
    assert main(["--job", "query"]) == 2          # missing --query lists + errors
    assert main(["--job", "query", "--query", "list"]) == 0
    assert "q_windowed_edit_size" in capsys.readouterr().out

    out = str(tmp_path / "q_out")
    rc = main(
        ["--job", "query", "--query", "q_keyby_agg_edit_size",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() == 5

    # streaming jobs still demand their required args
    assert main(["--source", "rate"]) == 2  # no checkpoint
    assert main(["--sink", "console"]) == 2  # no source
