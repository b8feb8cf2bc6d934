"""Generator contract (tools/gen_sf.py): the synthesized tables must be
drop-in replacements for the driver fixtures — same schemas, scaled row
counts, deterministic bytes — so verify_local/bench conclusions at sf1+
transfer. (Value-level validation is the full oracle harness run on a
generated sf0.01 — 129/129 recorded in round 6; these tests are the
cheap per-commit guard.)
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo/tools")

from gen_sf import _counts, generate  # noqa: E402

FIXTURE = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gen") / "sf0.002")
    generate(0.002, out)
    return out


def test_schemas_match_fixtures(gen_dir):
    for t in TABLES:
        got = pq.ParquetFile(f"{gen_dir}/{t}.parquet").schema_arrow
        want = pq.ParquetFile(f"{FIXTURE}/{t}.parquet").schema_arrow
        # field names + types must agree exactly (metadata may differ:
        # fixtures carry a pandas blob, the generator writes clean arrow)
        assert [(f.name, f.type) for f in got] == [
            (f.name, f.type) for f in want
        ], t


def test_row_counts_scale(gen_dir):
    counts = _counts(0.002)
    for t, n in counts.items():
        assert pq.ParquetFile(f"{gen_dir}/{t}.parquet").metadata.num_rows == n, t
    # fixed dims copied verbatim
    assert pq.ParquetFile(f"{gen_dir}/nation.parquet").metadata.num_rows == 25
    assert pq.ParquetFile(f"{gen_dir}/region.parquet").metadata.num_rows == 5


def test_generation_is_deterministic(gen_dir, tmp_path):
    again = str(tmp_path / "again")
    generate(0.002, again)
    for t in ("events", "lineitem", "documents", "embeddings"):
        a = pq.read_table(f"{gen_dir}/{t}.parquet")
        b = pq.read_table(f"{again}/{t}.parquet")
        assert a.equals(b), t


def test_foreign_keys_resolve(gen_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{gen_dir}/{t}.parquet')"
        )
    dangling = con.execute(
        """
        SELECT
          (SELECT count(*) FROM lineitem l WHERE l.l_orderkey NOT IN
             (SELECT o_orderkey FROM orders)) +
          (SELECT count(*) FROM lineitem l WHERE l.l_partkey NOT IN
             (SELECT p_partkey FROM part)) +
          (SELECT count(*) FROM orders o WHERE o.o_custkey NOT IN
             (SELECT c_custkey FROM customer)) +
          (SELECT count(*) FROM customer c WHERE c.c_nationkey NOT IN
             (SELECT n_nationkey FROM nation))
        """
    ).fetchone()[0]
    assert dangling == 0
