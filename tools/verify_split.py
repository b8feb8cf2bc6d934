"""Two-phase oracle verification for queries whose ENGINE run and
ORACLE run cannot share the box.

verify_local runs Spark and DuckDB in one process; between-query GC
(verify_local.py) reclaims most Spark disk, but a query over a
FACT-sized graph leaves tens of GB of blockmgr spill live until the
JVM exits — and the same query's oracle needs the same disk for its
own temp. At sf100 the pagerank oracle (1.2 B mirrored edges from
599,991,075 distinct part-supplier pairs) ENOSPC'd three times against
Spark's residue on a ~60 GB-headroom box.

Phase `spark` runs the engine and writes the result as parquet — an
executor-side write, no driver collect at all — then EXITS, so the OS
reclaims every byte of shuffle/persist spill with the JVM. Phase
`oracle` then owns the whole disk: it evaluates the DuckDB oracle
(caps via SPARK_GRAFT_ORACLE_MEM / _TEMP_CAP / _TMP, same envs as
verify_local) and compares against the parquet with verify_local's
normalize — identical pass criteria, different process layout.

    python tools/verify_split.py spark  <sf_dir> <query> <result.parquet>
    python tools/verify_split.py oracle <sf_dir> <query> <result.parquet>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    phase, sf_dir, name, result_path = sys.argv[1:5]
    import __spark_entry__ as entrymod

    if phase == "spark":
        from flink_wikipedia_spark.session import get_spark

        spark = get_spark("verify-split")
        df = entrymod.queries()[name](spark, sf_dir)
        df.write.mode("overwrite").parquet(result_path)
        print(f"spark phase done: {result_path}")
        return 0

    import importlib.util

    import duckdb

    from flink_wikipedia_spark.schemas import ALL_TABLES

    spec = importlib.util.spec_from_file_location(
        "verify_local", os.path.join(os.path.dirname(__file__), "verify_local.py")
    )
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)
    normalize = vl.normalize

    con = duckdb.connect()
    con.sql(
        "SET max_temp_directory_size="
        f"'{os.environ.get('SPARK_GRAFT_ORACLE_TEMP_CAP', '24GB')}'"
    )
    con.sql(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '48GB')}'"
    )
    tmp = os.environ.get("SPARK_GRAFT_ORACLE_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    odf = con.sql(entrymod.oracle_sql()[name]).df()
    sdf = con.sql(f"SELECT * FROM '{result_path}/*.parquet'").df()
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"FAIL {name}: columns differ")
        return 1
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
        return 1
    a, b = normalize(sdf), normalize(odf)
    if not a.equals(b):
        bad = [c for c in a.columns if not a[c].equals(b[c])]
        print(f"FAIL {name}: values differ in {bad}")
        return 1
    print(f"ok   {name}: {len(sdf)} rows match (two-phase)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
