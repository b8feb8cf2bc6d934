"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF and
compares row count, column names/order-insensitive values against the
DuckDB oracle. Usage:

    python tools/verify_local.py [sf_dir] [query ...]

Exit code 0 iff every compared query matches.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from flink_wikipedia_spark.schemas import ALL_TABLES  # noqa: E402
from flink_wikipedia_spark.session import get_spark  # noqa: E402


def tz_kind(s: pd.Series) -> str | None:
    """'aware' / 'naive' for datetime columns, None otherwise. The
    driver's schema hash distinguishes TIMESTAMP from TIMESTAMPTZ —
    round 1's flagship failed exactly there — so the local gate must
    treat the difference as FAIL, never normalize it away."""
    if not pd.api.types.is_datetime64_any_dtype(s):
        return None
    return "aware" if getattr(s.dtype, "tz", None) is not None else "naive"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, value-normalized, row-sorted frame for
    order-insensitive comparison (approximates the driver's hash).
    Deliberately does NOT touch timezones — a tz mismatch must surface
    as a failure, exactly as the driver's hash would see it."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # unify storage unit only (Spark→pandas is ns, DuckDB→pandas
            # is us) — tz-awareness is checked strictly before this
            df[c] = s.dt.floor("s").dt.as_unit("us")
        elif pd.api.types.is_float_dtype(s):
            # exact bit equality — the engine's determinism rules
            # (decimal sums, mirrored folds) promise it, so hold them to it
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    def build_spark():
        if vanilla:
            # Driver fidelity: the driver builds its OWN SparkSession
            # without our factory configs — every per-query conf the
            # engine needs must come from ensure_session_conf at query
            # build time.
            from pyspark.sql import SparkSession

            return SparkSession.builder.master("local[8]").appName(
                "verify-vanilla"
            ).getOrCreate()
        return get_spark("verify-local")

    spark = build_spark()
    def fresh_con():
        # drop any buffers the previous (possibly OOM-wedged) connection
        # still pins — without this a single runaway oracle cascaded
        # "bad allocation" into every later fresh_con at sf10
        import gc

        gc.collect()
        c = duckdb.connect()
        # bound the spill: a pathological oracle plan once wrote >80 GB
        # of temp before dying — fail it fast instead of filling the disk
        c.sql(
            "SET max_temp_directory_size="
            f"'{os.environ.get('SPARK_GRAFT_ORACLE_TEMP_CAP', '24GB')}'"
        )
        # Big-SF gauntlets can point the oracle's spill at a roomier
        # (or RAM-backed, e.g. /dev/shm) location: the default .tmp
        # shares the repo filesystem with Spark's blockmgr, and on a
        # ~60 GB-headroom box the pagerank oracle's ~25 GB spill
        # ENOSPC'd whenever any Spark shuffle residue was still live.
        tmp = os.environ.get("SPARK_GRAFT_ORACLE_TMP")
        if tmp:
            os.makedirs(tmp, exist_ok=True)
            c.sql(f"SET temp_directory='{tmp}'")
        # bound RAM per connection too: DuckDB's default (80% of the
        # box) ignores the Spark driver JVM sharing this process space.
        # 48 GB, not 24: the unrolled-pagerank oracle at sf10 legitimately
        # holds ~23 GB of materialized stages — under a 24 GB cap it
        # spills all of it and then blows the temp cap instead.
        # Env-overridable for the one oracle that outgrows even that:
        # the sf100 part↔supplier graph is FACT-sized (599,991,075
        # distinct pairs from 600 M lineitems → 1.2 B mirrored edges),
        # so its materialized stages need ~70 GB once the Spark side
        # has released the box.
        c.sql(
            "SET memory_limit="
            f"'{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '48GB')}'"
        )
        for t in ALL_TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    def map_count() -> int:
        """Current number of memory mappings (Linux). The kernel's
        vm.max_map_count default is 65530; a long gate at sf10 walks
        into it — DuckDB + JVM + glibc arenas accumulate mappings until
        EVERY allocator in the process fails with OOM-shaped errors
        (std::bad_alloc at 4 KB, numpy MemoryError at 11 MB) while the
        box has 100+ GB free. Diagnosed round 7 from /proc/self/maps
        sitting at exactly 65532 lines."""
        try:
            with open("/proc/self/maps") as fh:
                return sum(1 for _ in fh)
        except OSError:
            return 0

    con = fresh_con()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # recycle the oracle connection before the map table fills:
        # closing + gc releases DuckDB's buffer mappings (verified — the
        # gate recovers after a rebuild), so proactive recycling keeps
        # the whole 130-query sf10 gate inside one process
        if map_count() > 40_000:
            print("  [recycling DuckDB connection: map count high]")
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
            con = fresh_con()
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            # Isolate the engine failure like the oracle path isolates
            # DuckDB's: one heap-OOMed query left the local JVM wedged
            # and cascaded spurious getResult errors into all 20 later
            # queries of an sf100 batch. stop() + getOrCreate() builds
            # a fresh context in the same process — best-effort, but it
            # restores service after task-level OOMs.
            try:
                spark.stop()
            except Exception:  # noqa: BLE001
                pass
            spark = build_spark()
            continue
        el = time.time() - t0
        # The engine result is fully in pandas now — release Spark's
        # caches and shuffle files BEFORE the oracle runs, not after
        # the compare: the ContextCleaner only deletes shuffle spill
        # when the driver JVM GCs the handles, and a heavy query's
        # ~40 GB of live blockmgr spill twice ENOSPC'd the pagerank
        # oracle's own DuckDB temp on this 60 GB-headroom box.
        try:
            # drop builder-tracked persisted frames first: the registry
            # list holds py4j handles that would otherwise pin JVM plans
            # across the whole gate (and grow per pagerank call)
            from flink_wikipedia_spark.plans.registry import release_caches

            release_caches()
            spark.catalog.clearCache()
            # Python first: the query's DataFrame objects hold py4j
            # bindings that keep the JVM-side plans (and their shuffle
            # handles) strongly referenced until Python GC detaches
            # them — System.gc() alone frees nothing while they live.
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {el:.1f}s)")
            continue
        # Per-oracle wall cap (SPARK_GRAFT_ORACLE_TIMEOUT seconds, off by
        # default): at 100× the CHECKER is the scaling risk before the
        # engine (see SCALE.md) — a runaway oracle plan should fail that
        # one query, not stall the whole gate.
        cap = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0") or 0)
        timer = None
        fired = [False]
        if cap > 0:
            import threading

            guard = threading.Lock()
            settled = [False]

            # ADVICE r7: a bare Timer(cap, con.interrupt) can fire in
            # the window between con.sql() returning and timer.cancel(),
            # leaving an interrupt PENDING on the shared connection that
            # spuriously aborts the NEXT oracle. Guard the callback with
            # a flag set under a lock, and record whether it actually
            # interrupted so the caller can recycle the connection.
            def _interrupt(guard=guard, settled=settled, fired=fired, con=con):
                with guard:
                    if not settled[0]:
                        fired[0] = True
                        con.interrupt()

            def _settle(guard=guard, settled=settled):
                with guard:
                    settled[0] = True

            timer = threading.Timer(cap, _interrupt)
            timer.start()
        else:

            def _settle():
                pass

        t1 = time.time()
        try:
            odf = con.sql(oracles[name]).df()
            _settle()
        except Exception as e:  # noqa: BLE001
            _settle()
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            # a resource failure (temp-disk fill, OOM) can wedge the
            # shared connection and cascade spurious OOMs into every
            # later oracle (seen in the sf1 gauntlet) — isolate it
            if timer is not None:
                timer.cancel()
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
            con = fresh_con()
            continue
        if timer is not None:
            timer.cancel()
            if fired[0]:
                # the timer interrupted AFTER the query completed (the
                # race window hit): the interrupt may still be pending on
                # the shared connection — recycle it so the next oracle
                # can't be spuriously aborted
                try:
                    con.close()
                except Exception:  # noqa: BLE001
                    pass
                con = fresh_con()
        oel = time.time() - t1
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(
                f"FAIL {name}: columns differ spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        tz_mismatch = [
            c
            for c in sdf.columns
            if tz_kind(sdf[c]) is not None and tz_kind(sdf[c]) != tz_kind(odf[c])
        ]
        if tz_mismatch:
            failures.append(name)
            print(
                f"FAIL {name}: timestamp tz-awareness differs in {tz_mismatch} "
                f"(spark={[tz_kind(sdf[c]) for c in tz_mismatch]} "
                f"oracle={[tz_kind(odf[c]) for c in tz_mismatch]}) — "
                "driver schema hash distinguishes TIMESTAMP vs TIMESTAMPTZ"
            )
            continue
        a, b = normalize(sdf), normalize(odf)
        if not a.equals(b):
            failures.append(name)
            diff_cols = [
                c for c in a.columns if not a[c].equals(b[c])
            ]
            print(f"FAIL {name}: values differ in {diff_cols}")
            mask = ~(a[diff_cols].eq(b[diff_cols]).all(axis=1))
            print("  spark:", a[mask].head(3).to_dict("records"))
            print("  oracle:", b[mask].head(3).to_dict("records"))
            continue
        dbg = (
            f" maps={map_count()}" if os.environ.get("SPARK_GRAFT_DEBUG_MAPS") else ""
        )
        print(
            f"ok   {name}: {len(sdf)} rows match ({el:.1f}s, oracle {oel:.1f}s){dbg}"
        )
    print(f"\n{attempted - len(failures)}/{attempted} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
