"""Deduplication queries (north star E1 family) over `events` and
`documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_wikipedia_spark.operators.dedup import (
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_dedup_clusters,
    minhash_signatures,
    simhash_fingerprints,
    sql_jaccard_pairs_duckdb,
    sql_minhash_clusters_duckdb,
    sql_minhash_pairs_duckdb,
    sql_minhash_signatures_duckdb,
    sql_simhash_duckdb,
)
from flink_wikipedia_spark.operators.graph import sql_components_duckdb
from flink_wikipedia_spark.operators.text import fingerprint_cols
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table, load_table_spread


@query(
    "q_dedup_events",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (exact): distinct on a column subset — one hash shuffle on the
    projected key; in streaming the same op is
    dropDuplicatesWithinWatermark (streaming/pipeline.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates()


@query(
    "q_dedup_docs_exact",
    oracle="""
    SELECT fp_md5, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM (
        SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_md5
        FROM documents
    )
    GROUP BY fp_md5
    """,
)
def q_dedup_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (exact, content-addressed): group documents by normalized-text
    md5, keep min doc_id — the canonical exact-dedup reduce. At 100 TB
    the md5 groupBy shuffles 16-byte keys, not documents."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", *fingerprint_cols())
        .groupBy("fp_md5")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query("q_minhash_signatures", oracle=sql_minhash_signatures_duckdb())
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (MinHash): 8-slot signature per doc from md5-derived token
    hashes — the corpus compressed to 64 bytes/doc before any pairwise
    work (operators/dedup.minhash_signatures)."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return minhash_signatures(docs)


@query("q_minhash_dedup_pairs", oracle=sql_minhash_pairs_duckdb())
def q_minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (MinHash+LSH banding): candidate near-dup pairs = docs sharing
    any band bucket, enumerated only inside buckets ≤64 docs (dense
    buckets → q_minhash_dedup_clusters). The join is equi on
    (band, bucket) over the signature table — no document ever meets
    another document (operators/dedup.minhash_candidate_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(minhash_signatures(docs))


@query("q_minhash_dedup_clusters", oracle=sql_minhash_clusters_duckdb())
def q_minhash_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (MinHash cluster dedup): band-0 buckets as whole dup-clusters
    (keeper = min doc_id) — linear in corpus size however large the
    clusters; the scale path when pair enumeration is quadratic
    (operators/dedup.minhash_dedup_clusters)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_clusters(minhash_signatures(docs))


@query("q_simhash", oracle=sql_simhash_duckdb())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (SimHash): 16-bit frequency-weighted fingerprint per doc;
    equal fingerprints ⇒ near-dup candidates
    (operators/dedup.simhash_fingerprints)."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return simhash_fingerprints(docs)


from flink_wikipedia_spark.functions.constants import HM_MOD


@query(
    "q_dedup_pipeline",
    # MATERIALIZED stages pin the candidate-driven join order: without
    # them DuckDB's planner may start from toks(a) ⋈ toks(b) on the
    # modular token hash — quadratic in the corpus (the sf1 gauntlet
    # had it spill >80 GB of temp before failing; staged form runs in
    # 14 s there, bit-identical at sf0.01/sf0.1, and 45 s → 0.7 s even
    # at sf0.1). The oracle must scale like the engine does: candidates
    # first, token expansion only on candidate pairs.
    oracle=f"""
    WITH pairs AS MATERIALIZED ({sql_minhash_pairs_duckdb()}),
    toks AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               CAST('0x' || substring(md5(token),1,15) AS BIGINT) % {HM_MOD} AS hm
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
              FROM documents)
        WHERE token <> ''
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
    a_side AS MATERIALIZED (
        SELECT p.doc_a, p.doc_b, a.hm
        FROM pairs p JOIN toks a ON a.doc_id = p.doc_a
    ),
    inter AS (
        SELECT s.doc_a, s.doc_b, COUNT(*) AS n_inter
        FROM a_side s
        JOIN toks b ON b.doc_id = s.doc_b AND b.hm = s.hm
        GROUP BY s.doc_a, s.doc_b
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.8
    """,
)
def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup pipeline, composed end-to-end: MinHash+LSH
    generates candidates (sub-quadratic), exact token-set Jaccard
    verifies them, only pairs ≥ 0.8 survive — the sketch-then-verify
    shape every 100 TB dedup runs (candidates are ~0.1% of all pairs;
    exact Jaccard only ever touches those).

    Shape note: per-doc token-set sizes ride each token row via a
    window over doc_id and travel THROUGH the intersection joins as
    group keys — the separate sizes aggregate with two join-backs
    re-planned the tokenize subtree per reference (Catalyst does not
    CSE logical subtrees): 5 corpus scans → 3, 2.5× the fresh-plan
    speed, bit-identical output."""
    from pyspark.sql import Window

    from flink_wikipedia_spark.operators.dedup import _doc_tokens

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(minhash_signatures(docs))
    toks = _doc_tokens(docs, "doc_id", "text").withColumn(
        "n_tok", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "hm", F.col("n_tok").alias("n_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), "hm", F.col("n_tok").alias("n_b"))
    inter = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "hm"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


@query(
    "q_dedup_components",
    oracle=f"""
    WITH
    pairs AS MATERIALIZED ({sql_minhash_pairs_duckdb()}),
    edges AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    {sql_components_duckdb()}
    SELECT node, component, CAST(n_members AS BIGINT) AS n_members FROM (
        SELECT node, component,
               COUNT(*) OVER (PARTITION BY component) AS n_members
        FROM comp
    )
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS, not just pairs: connected components over the
    MinHash candidate-pair graph via iterative min-label propagation
    (operators/graph.connected_components). The oracle runs the SAME
    algorithm as unrolled SQL stages (graph.sql_components_duckdb) —
    the earlier recursive-CTE transitive closure was Σ|component|²
    rows and became the sf10 gate's bottleneck (checker, not engine)."""
    from pyspark.sql import Window

    from flink_wikipedia_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(minhash_signatures(docs))
    comp = connected_components(pairs)
    w = Window.partitionBy("component")
    return comp.select(
        "node", "component", F.count(F.lit(1)).over(w).alias("n_members")
    )


@query("q_ngram_jaccard_pairs", oracle=sql_jaccard_pairs_duckdb())
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (exact Jaccard on a bounded candidate set): token-set overlap
    via equi-join on token hash; integer-ratio similarity
    (operators/dedup.jaccard_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs)


@query(
    "q_dedup_canonical",
    oracle=f"""
    WITH
    pairs AS MATERIALIZED ({sql_minhash_pairs_duckdb()}),
    edges AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    {sql_components_duckdb()},
    labeled AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    pick AS (
        SELECT component, doc_id AS canonical_id,
               ROW_NUMBER() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM labeled
    )
    SELECT l.doc_id, l.component, p.canonical_id,
           l.doc_id = p.canonical_id AS is_canonical
    FROM labeled l
    JOIN (SELECT component, canonical_id FROM pick WHERE rk = 1) p
      ON p.component = l.component
    """,
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame a training pipeline actually runs: every doc
    mapped to the CANONICAL representative of its near-dup cluster —
    keep the longest doc per cluster (n_chars desc, doc_id asc as the
    deterministic tie-break), mark the rest for deletion. Composes
    MinHash candidates → connected components → per-cluster pick;
    singleton docs are their own canonical.

    Scale: the per-cluster pick is a row_number window partitioned by
    component — clusters are overwhelmingly tiny (copies of one doc),
    so no partition skew. The components map is joined WITHOUT a
    broadcast hint: it scales with the number of near-dup docs, and a
    web-scale corpus at 30-50%% dup rate makes it billions of rows —
    AQE broadcasts it when it is actually small and falls back to a
    shuffle join when it is not."""
    from pyspark.sql import Window

    from flink_wikipedia_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(minhash_signatures(docs))
    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")
    labeled = (
        docs.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
            "n_chars",
        )
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    pick = (
        labeled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("component", F.col("doc_id").alias("canonical_id"))
    )
    return labeled.join(pick, "component").select(
        "doc_id",
        "component",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )


# Exact substring duplication (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better"): spans of DUP_SPAN_N consecutive
# tokens that recur across documents. A suffix array finds these
# single-node; the distributed equivalent is stride-1 shingle hashing +
# one group-by — same detection power at span granularity.
DUP_SPAN_N = 8


@query(
    "q_duplicate_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               CAST('0x' || substring(md5(
                   array_to_string(toks[i + 1 : i + {DUP_SPAN_N}], ' ')
               ), 1, 15) AS BIGINT) AS h
        FROM t, UNNEST(generate_series(0, CAST(n_tokens - {DUP_SPAN_N} AS BIGINT))) AS u(i)
        WHERE n_tokens >= {DUP_SPAN_N}
    )
    SELECT h AS span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS n_occurrences,
           MIN(doc_id) AS first_doc
    FROM grams
    GROUP BY h
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring duplication detection: every {DUP_SPAN_N}-token
    span (stride 1) that appears in ≥2 documents, with its corpus-wide
    occurrence count and first carrier — the span-granular equivalent
    of suffix-array substring dedup, the pass that catches boilerplate
    MinHash's whole-document similarity misses.

    Scale: the stride-1 fan-out is ~n_tokens rows per doc, but each row
    is (doc_id, 60-bit hash) — 16 bytes, never text — and the single
    groupBy(span_hash) shuffles uniformly by construction (md5). The
    HAVING prunes to the duplicated tail, so output is proportional to
    duplication, not corpus size. In production the hit list joins back
    as the mask for span removal. explode_outer (not explode) dodges
    the inferred-filter re-inlining trap (see q_contamination_check)."""
    from flink_wikipedia_spark.functions.compat import stable_token_hash

    docs = load_table_spread(spark, sf_dir, "documents")
    tcol = F.col("toks")
    grams_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.size(tcol).cast("long") - DUP_SPAN_N),
        lambda i: F.concat_ws(
            " ", *[F.get(tcol, (i + k).cast("int")) for k in range(DUP_SPAN_N)]
        ),
    )
    grams = (
        docs.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))
        .filter(F.size("toks") >= DUP_SPAN_N)
        .select("doc_id", grams_arr.alias("grams"))
        .select("doc_id", F.explode_outer("grams").alias("gram"))
        .select("doc_id", stable_token_hash("gram").alias("h"))
    )
    return (
        grams.groupBy(F.col("h").alias("span_hash"))
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "q_span_mask_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i,
               CAST('0x' || substring(md5(
                   array_to_string(toks[i + 1 : i + {DUP_SPAN_N}], ' ')
               ), 1, 15) AS BIGINT) AS h
        FROM t, UNNEST(generate_series(0, CAST(n_tokens - {DUP_SPAN_N} AS BIGINT))) AS u(i)
        WHERE n_tokens >= {DUP_SPAN_N}
    ),
    dup AS (
        SELECT h FROM grams GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hitpos AS (
        SELECT DISTINCT g.doc_id, p.p
        FROM grams g
        JOIN dup d ON d.h = g.h,
        UNNEST(generate_series(g.i, g.i + {DUP_SPAN_N - 1})) AS p(p)
    ),
    masked AS (
        SELECT doc_id, COUNT(*) AS n_masked FROM hitpos GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens,
           CAST(COALESCE(m.n_masked, 0) AS BIGINT) AS n_masked,
           CAST(COALESCE(m.n_masked, 0) AS DOUBLE) / t.n_tokens AS masked_frac
    FROM t LEFT JOIN masked m ON m.doc_id = t.doc_id
    """,
)
def q_span_mask_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The masking half of substring dedup: for every document, how many
    of its token positions fall inside some cross-document duplicated
    {DUP_SPAN_N}-token span — the per-doc damage report that decides
    between span REMOVAL (low fraction: cut the boilerplate) and doc
    DROP (high fraction: the doc is mostly duplicated material).

    Scale: the gram build (tokenize + {DUP_SPAN_N}-token concat + hash
    — the expensive map) runs ONCE: positions fold into a per-(span,
    doc) list (bounded by doc length) through the first shuffle, the
    cross-doc carrier count is a window over span hash on those
    already-aggregated rows (a naive dup-set + join-back would rescan
    and re-hash the corpus — observed 2× the runtime), and only HIT
    rows expand ×{DUP_SPAN_N} into positions, so the interval union
    costs nothing on clean corpora. masked_frac divides
    identically-cast doubles — bit-stable on both engines."""
    from pyspark.sql import Window

    from flink_wikipedia_spark.functions.compat import stable_token_hash

    docs = load_table_spread(spark, sf_dir, "documents")
    tcol = F.col("toks")
    grams_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.size(tcol).cast("long") - DUP_SPAN_N),
        lambda i: F.concat_ws(
            " ", *[F.get(tcol, (i + k).cast("int")) for k in range(DUP_SPAN_N)]
        ),
    )
    base = docs.select(
        "doc_id",
        F.split(F.lower(F.col("text")), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    grams = (
        base.filter(F.size("toks") >= DUP_SPAN_N)
        .select("doc_id", grams_arr.alias("grams"))
        .select("doc_id", F.posexplode_outer("grams").alias("i", "gram"))
        .select("doc_id", F.col("i").cast("long").alias("i"), stable_token_hash("gram").alias("h"))
    )
    per_hd = grams.groupBy("h", "doc_id").agg(F.collect_list("i").alias("pos"))
    hits = (
        per_hd.withColumn(
            "_n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("_n_docs") >= 2)
    )
    masked = (
        hits.select("doc_id", F.explode("pos").alias("i"))
        .select("doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + DUP_SPAN_N - 1)).alias("p"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_masked"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(masked, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_masked"), F.lit(0)).cast("long").alias("n_masked"),
            (
                F.coalesce(F.col("n_masked"), F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("masked_frac"),
        )
    )


# Fixed-point PageRank: damping 0.85 and per-edge contributions in
# integer micro-units. Floating-point PageRank sums are ORDER-DEPENDENT
# (a parallel engine cannot promise which contributions add first);
# defining the semantics over integers makes every iteration exact,
# order-independent, and bit-identical across engines — the same move
# dec_sum makes for money columns.
PR_ITERS = 2
PR_UNIT = 1_000_000          # initial rank per node, in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 850, 1000
PR_BASE = 150_000            # (1 - d) * PR_UNIT


def _pagerank_iter_sql(prev: str, n: int) -> str:
    """One direction-split PageRank iteration as CTE text.

    The graph is bipartite by construction (parts = even node ids,
    suppliers = odd) and the edge list is an exact mirror, so a
    receiver's inbound contributions come from exactly ONE direction:
    odd nodes receive only from even srcs and vice versa. That lets the
    oracle iterate WITHOUT ever forming the 1.2 B-row mirrored edge
    list the engine streams through its shuffle: each direction is a
    base-table probe (600 M rows at sf100) against a MATERIALIZED
    ≤|nodes|-row contribution table — exact stats, so DuckDB always
    builds the hash table on the small side — and the UNION ALL of the
    two grouped halves IS the final per-node sum (parities are
    disjoint). The old single-edges-CTE form left DuckDB to estimate an
    un-materialized 1.2 B-row CTE and needed >100 GB RAM + >41 GiB
    spill at sf100 (three OOM/ENOSPC failures); this form's working set
    is bounded by base + two node-sized tables per iteration.
    """
    return f"""
    cp{n} AS MATERIALIZED (
        SELECT r.node AS src, r.rank // d.d AS contrib
        FROM {prev} r JOIN degp d ON d.pk * 2 = r.node
    ),
    cs{n} AS MATERIALIZED (
        SELECT r.node AS src, r.rank // d.d AS contrib
        FROM {prev} r JOIN degs d ON d.sk * 2 + 1 = r.node
    ),
    it{n} AS MATERIALIZED (
        SELECT node,
               CAST({PR_BASE} + ({PR_DAMP_NUM} * s) // {PR_DAMP_DEN} AS BIGINT)
                   AS rank
        FROM (
            SELECT b.sk * 2 + 1 AS node, SUM(c.contrib) AS s
            FROM base b JOIN cp{n} c ON c.src = b.pk * 2
            GROUP BY b.sk
            UNION ALL
            SELECT b.pk * 2 AS node, SUM(c.contrib) AS s
            FROM base b JOIN cs{n} c ON c.src = b.sk * 2 + 1
            GROUP BY b.pk
        )
    )"""


@query(
    "q_pagerank_parts_suppliers",
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
    ),
    -- per-parity degrees: deg(2k) = |pairs with pk=k|, deg(2k+1) =
    -- |pairs with sk=k| — identical to COUNT(*) per src over the
    -- mirrored edge list, computed from base without mirroring.
    degp AS MATERIALIZED (SELECT pk, COUNT(*) AS d FROM base GROUP BY pk),
    degs AS MATERIALIZED (SELECT sk, COUNT(*) AS d FROM base GROUP BY sk),
    r0 AS MATERIALIZED (
        SELECT pk * 2 AS node, CAST({PR_UNIT} AS BIGINT) AS rank FROM degp
        UNION ALL
        SELECT sk * 2 + 1 AS node, CAST({PR_UNIT} AS BIGINT) AS rank FROM degs
    ),
    {_pagerank_iter_sql("r0", 1)},
    {_pagerank_iter_sql("it1", 2)}
    SELECT node, rank FROM it{PR_ITERS}
    """,
    # Oracle-scaling history (each form died at the next SF up):
    # r6: recursive/rescanning forms → MATERIALIZED stages (sf10 fix).
    # r7: double-DISTINCT over mirrored rows → dedup-before-mirror.
    # r8: the mirrored-edges CTE itself → direction-split iterations
    # (see _pagerank_iter_sql) after three >100 GB OOM/ENOSPC failures
    # at sf100; the split form verified sf100 in-box.
)
def q_pagerank_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph centrality with a FULL value oracle: {PR_ITERS}
    PageRank iterations over the symmetrized part↔supplier trade graph
    (nodes namespaced 2k / 2k+1). Contributions are integer micro-units
    with `div` arithmetic, so the result is bit-identical across
    engines and partition orders — iterative numeric algorithms usually
    get only rows-count checks; fixed-point semantics earns this one an
    exact hash match.

    Scale: each iteration is edges ⋈ ranks on src + one groupBy(dst) —
    the standard distributed PR shape; the degreed edge list is
    persisted once (spillable columnar cache) so K iterations don't
    re-derive the distinct-pair subtree (Catalyst re-plans per
    reference). Persist, NOT localCheckpoint: local checkpointing pins
    whole partitions as deserialized row arrays, and at sf100 (160M
    edges AQE-coalesced to 64MB-serialized partitions ≈ 1 GB heap
    each × 32 concurrent tasks) that OOMed the executor heap — the
    columnar cache stores compressed batches and spills to disk
    instead. Hub skew in the groupBy is absorbed by map-side partial
    sums.

    Shuffle budget (round-5 rework, measured 2.3x fresh-plan / 1.6x
    steady-state at sf0.1): dedup the 2-column pair BEFORE mirroring
    (the mirror is a map-side projection of the deduped pairs — the
    old form shuffled the doubled list through distinct), and derive
    degree with count().over(partitionBy(src)) — one shuffle on src —
    instead of a groupBy + join-back (two shuffles + a join)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select("l_partkey", "l_suppkey").distinct()
    fwd = base.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    rev = base.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"),
        (F.col("l_partkey") * 2).alias("dst"),
    )
    # Persistence of the degreed edge list is owned by the pagerank
    # operator (probe cache / track_cache lifecycle per path — see its
    # docstring); pass the frame unpersisted.
    withdeg = fwd.union(rev).withColumn(
        "d", F.count(F.lit(1)).over(Window.partitionBy("src"))
    )
    from flink_wikipedia_spark.operators.graph import pagerank

    ranks, _ = pagerank(
        withdeg,
        unit=PR_UNIT,
        base=PR_BASE,
        damp_num=PR_DAMP_NUM,
        damp_den=PR_DAMP_DEN,
        max_iters=PR_ITERS,
        eps=None,  # budget mode: measured max|Δ| decays only ~0.85x per
        # round (the damping factor), so at this 2-round budget there
        # are no dead iterations for a convergence check to cut — a
        # delta probe would only add a per-round action (SCALE.md §r12)
    )
    return ranks


# Convergence-mode PageRank: damping 1/2 so the contraction factor is
# 0.5x per round and the max per-node |Δrank| provably lands under
# PRC_EPS well inside the budget at every tested SF (round counts:
# SCALE.md §r12). Damping 0.85 (the classic constant, used by the
# budget-mode query above) would need ~50+ rounds for the same epsilon
# — the geometric decay rate IS the damping factor, independent of
# graph size.
PRC_EPS = 10_000        # stop at max|Δrank| ≤ 1% of the initial unit
PRC_MAX_ITERS = 40      # budget; exhaustion raises, never truncates
PRC_BASE = 500_000      # (1 - d) * PR_UNIT for d = 1/2
PRC_DAMP_NUM, PRC_DAMP_DEN = 500, 1000


@query(
    "q_pagerank_converged",
    oracle=f"""
    WITH RECURSIVE
    deg AS MATERIALIZED (
        SELECT s_nationkey AS nk, COUNT(*) AS d
        FROM supplier GROUP BY s_nationkey
    ),
    -- working rows carry (rank_k, prev=rank_(k-1), delta=|rank_k -
    -- rank_(k-2)|): the TWO-round delta is the stop signal (period-2-
    -- aware — see the builder docstring); seed prev=rank so round 1
    -- compares against the initial ranks, seed delta is a sentinel
    -- large enough to always admit round 1.
    pr AS (
        SELECT 0 AS it, nk * 2 AS node, CAST({PR_UNIT} AS BIGINT) AS rank,
               CAST({PR_UNIT} AS BIGINT) AS prev,
               CAST({PR_UNIT} AS BIGINT) AS delta
        FROM deg
        UNION ALL
        SELECT 0, s_suppkey * 2 + 1, CAST({PR_UNIT} AS BIGINT),
               CAST({PR_UNIT} AS BIGINT), CAST({PR_UNIT} AS BIGINT)
        FROM supplier
      UNION ALL
        SELECT nxt.it, nxt.node, nxt.rank, p.rank AS prev,
               ABS(nxt.rank - p.prev) AS delta
        FROM (
            SELECT p.it + 1 AS it, s.s_suppkey * 2 + 1 AS node,
                   CAST({PRC_BASE} + ({PRC_DAMP_NUM} * (p.rank // d.d))
                        // {PRC_DAMP_DEN} AS BIGINT) AS rank
            FROM supplier s
            JOIN deg d ON d.nk = s.s_nationkey
            JOIN pr p ON p.node = s.s_nationkey * 2
            UNION ALL
            SELECT p.it + 1, s.s_nationkey * 2,
                   CAST({PRC_BASE} + ({PRC_DAMP_NUM} * SUM(p.rank))
                        // {PRC_DAMP_DEN} AS BIGINT)
            FROM supplier s
            JOIN pr p ON p.node = s.s_suppkey * 2 + 1
            GROUP BY s.s_nationkey, p.it
        ) nxt
        JOIN pr p ON p.node = nxt.node
        WHERE (SELECT MAX(delta) FROM pr) > {PRC_EPS}
          AND (SELECT MAX(it) FROM pr) < {PRC_MAX_ITERS}
    )
    SELECT node, rank, CAST(it AS INT) AS n_iters
    FROM pr WHERE it = (SELECT MAX(it) FROM pr)
    """,
)
def q_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-mode PageRank with a FULL value oracle including the
    stopping round: iterate the supplier↔nation trade graph (nodes
    namespaced 2k nations / 2k+1 suppliers, supplier out-degree 1) until
    the max per-node TWO-round delta |rank_k - rank_{k-2}| ≤ PRC_EPS
    micro-units, erroring loudly at the PRC_MAX_ITERS budget. Two
    rounds, not one (the r12 sf100 find): bipartite graphs sustain an
    integer-quantized period-2 rank cycle — at sf100 the hub degree
    (~40 K suppliers per nation) amplifies ±1 supplier quantization into
    a permanent 19 999-micro-unit single-round oscillation, above any
    fixed eps — while the two-round delta is blind to the oscillating
    component and reaches exactly 0 at the cycle, making the stop
    scale-independent. The emitted n_iters column makes the early exit
    itself hash-verified: the engine's dynamic stop must land on
    exactly the round the oracle's recursive CTE stops at.

    The oracle iterates to the SAME fixed point: a WITH RECURSIVE whose
    working table carries each round's per-node delta; the recursive
    term re-derives both bipartite directions from the supplier base
    table (the direction-split trick of q_pagerank_parts_suppliers'
    oracle — no mirrored edge materialization) and the gate
    ``MAX(delta) > eps`` over the working table stops the recursion on
    the identical round the engine's observed metric does.

    Scale: each engine round is edges ⋈ ranks + one groupBy — the
    standard distributed PR shape — and costs exactly ONE job: the
    convergence delta rides an ``observe`` metric on the round's lazy
    localCheckpoint (operators/graph.pagerank), so the early exit adds
    zero extra aggregates. The checkpoint keeps plan depth O(1) across
    tens of rounds; round count grows only ~log(hub-degree) with SF
    (delta decay per round is the damping factor — SCALE.md §r12
    records the measured counts)."""
    sup = load_table(spark, sf_dir, "supplier")
    fwd = sup.select(
        (F.col("s_nationkey") * 2).alias("src"),
        (F.col("s_suppkey") * 2 + 1).alias("dst"),
    )
    rev = sup.select(
        (F.col("s_suppkey") * 2 + 1).alias("src"),
        (F.col("s_nationkey") * 2).alias("dst"),
    )
    from flink_wikipedia_spark.operators.graph import pagerank

    withdeg = fwd.union(rev).withColumn(
        "d", F.count(F.lit(1)).over(Window.partitionBy("src"))
    )
    ranks, n_iters = pagerank(
        withdeg,
        unit=PR_UNIT,
        base=PRC_BASE,
        damp_num=PRC_DAMP_NUM,
        damp_den=PRC_DAMP_DEN,
        max_iters=PRC_MAX_ITERS,
        eps=PRC_EPS,
    )
    return ranks.select(
        "node", "rank", F.lit(n_iters).cast("int").alias("n_iters")
    )
