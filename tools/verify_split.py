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


def split_ctes(sql: str):
    """Parse a top-level ``WITH name AS [MATERIALIZED] (body), ...
    <final query>`` into ([(name, body), ...], final_query).

    A single statement keeps EVERY materialized CTE live until the
    statement finishes — at sf100 the pagerank oracle's cumulative
    stages plus the running operator's own spill exceeded 100 GB RAM +
    ~48 GiB temp (four failures). Statement-at-a-time staging lets the
    allocator reclaim each stage's working memory before the next
    starts.

    Supported SQL subset (oracle authors stay inside it; violations
    raise, never silently mis-split): the statement either STARTS with
    ``WITH`` (after leading whitespace / ``--`` / ``/* */`` comments) or
    is passed through untouched — a ``WITH`` buried in a subquery,
    string, or comment is NOT treated as a CTE header (ADVICE r8). The
    scanner understands ``--`` line comments, ``/* */`` block comments
    (non-nesting, per the SQL standard), and ``'...'`` literals with
    ``''`` escape doubling; it does NOT understand e'...' escape
    strings or $$ dollar quoting — don't use them in staged oracles.
    """
    import re

    s = sql
    n = len(s)

    def skip_noise(j: int) -> int:
        while j < n:
            if s[j].isspace():
                j += 1
            elif s.startswith("--", j):
                j = s.find("\n", j)
                j = n if j == -1 else j + 1
            elif s.startswith("/*", j):
                j = s.find("*/", j + 2)
                if j == -1:
                    raise ValueError("unterminated /* comment")
                j += 2
            else:
                break
        return j

    # WITH must be the statement's first token — anywhere else it is a
    # nested CTE / string content / comment word and staging must not
    # touch the statement (ADVICE r8: the old first-\bWITH\b-anywhere
    # anchor misparsed `SELECT ... FROM (WITH ...)`).
    start = skip_noise(0)
    m = re.match(r"WITH\b", s[start:], re.IGNORECASE)
    if not m:
        return [], sql
    i = start + m.end()
    ctes = []

    while True:
        i = skip_noise(i)
        mm = re.match(r"([A-Za-z_][A-Za-z0-9_]*)", s[i:])
        if not mm:
            raise ValueError(f"expected CTE name at …{s[i:i+40]!r}")
        cname = mm.group(1)
        i = skip_noise(i + mm.end())
        if not re.match(r"AS\b", s[i:], re.IGNORECASE):
            raise ValueError(f"expected AS after CTE {cname}")
        i = skip_noise(i + 2)
        mat = re.match(r"MATERIALIZED\b", s[i:], re.IGNORECASE)
        if mat:
            i = skip_noise(i + mat.end())
        if i >= n or s[i] != "(":  # i==n: statement truncated after AS
            raise ValueError(f"expected ( for CTE {cname} body")
        depth, j = 1, i + 1
        while j < n and depth:
            c = s[j]
            if c == "-" and s.startswith("--", j):
                j = s.find("\n", j)
                j = n if j == -1 else j
            elif c == "/" and s.startswith("/*", j):
                e = s.find("*/", j + 2)
                if e == -1:
                    raise ValueError(f"unterminated /* comment in CTE {cname}")
                j = e + 1  # land on '/', the j += 1 below steps past it
            elif c == "'":
                # '' doubling: each pair scans as close-then-reopen, so the
                # generic loop already handles it; scan to the next quote.
                j += 1
                while j < n and s[j] != "'":
                    j += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError(f"unbalanced parens in CTE {cname}")
        ctes.append((cname, s[i + 1 : j - 1]))
        i = skip_noise(j)
        if i < n and s[i] == ",":
            i += 1
            continue
        return ctes, s[i:]


def run_staged(con, sql: str):
    """Execute a WITH-query one stage at a time: each CTE becomes a
    TEMP TABLE, and a table is dropped as soon as no later stage (or
    the final query) references its name. Same math, bounded peak.

    Liveness is a textual scan, deliberately conservative in both
    ADVICE-r8 directions: DuckDB identifiers are case-insensitive, so
    the match is too (a case-mismatched reference must keep its table
    alive), and a CTE whose name shadows a base view is NEVER dropped
    early — a premature drop would silently rebind later references to
    the base view instead of failing loudly."""
    import re

    from flink_wikipedia_spark.schemas import ALL_TABLES

    shadowing = {t.lower() for t in ALL_TABLES}
    ctes, final = split_ctes(sql)
    bodies = [b for _, b in ctes] + [final]
    live = set()
    for k, (cname, body) in enumerate(ctes):
        print(f"  stage {k + 1}/{len(ctes)}: {cname}", flush=True)
        con.sql(f'CREATE TEMP TABLE "{cname}" AS {body}')
        live.add(cname)
        for t in sorted(live):
            if t.lower() in shadowing:
                continue
            needed = any(
                re.search(rf"\b{re.escape(t)}\b", later, re.IGNORECASE)
                for later in bodies[k + 1 :]
            )
            if not needed:
                con.sql(f'DROP TABLE "{t}"')
                live.discard(t)
    return con.sql(final).df()


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
    # Fewer threads = fewer concurrent per-thread operator states (hash
    # builds, sort runs) = lower peak memory AND spill, at some wall
    # cost — the trade a box-sized oracle on a fact-sized graph needs.
    threads = os.environ.get("SPARK_GRAFT_ORACLE_THREADS")
    if threads:
        con.sql(f"SET threads={int(threads)}")
    # The compare is order-insensitive (normalize sorts), so let DuckDB
    # drop insertion-order preservation: with it on, wide scans and
    # aggregations buffer ordered batches and the pagerank oracle's
    # 600 M-row stages OOMed; with it off they stream.
    con.sql("SET preserve_insertion_order=false")
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
    sql = entrymod.oracle_sql()[name]
    if os.environ.get("SPARK_GRAFT_ORACLE_STAGED"):
        odf = run_staged(con, sql)
    else:
        odf = con.sql(sql).df()
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
