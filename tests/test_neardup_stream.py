"""Streaming NEAR-duplicate gate (r14): the batch MinHash→LSH family
applied in-stream via chained within-watermark drops on band keys.

Pins:
- the row-local signature expressions (operators/dedup.minhash_sig_cols)
  are BIT-IDENTICAL to the batch explode+groupBy operator on the real
  corpus — the stream gate buckets exactly where batch LSH buckets;
- fuzzy duplicates are dropped even when only ONE band collides (the
  ANY-band rule), while without the gate only exact copies drop;
- stream survivors equal a replayed Python greedy over the BATCH
  operators' band keys (chained-stage semantics: a doc claims a band's
  bucket only if it survived the earlier bands) — batch/stream parity
  is computed from q_minhash-family operators, not hardcoded.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F

from flink_wikipedia_spark.streaming.sinks import MemorySink
from flink_wikipedia_spark.streaming.sources import file_source

BASE = " ".join(f"alpha{j} bravo{j} common{j} delta{j}" for j in range(7))
TEXTS = {
    # all pass the heuristic gate (28-29 tokens, mean len ~6.2)
    1: BASE,                                   # original -> keeps
    2: BASE + " extraword",                    # near-dup: shares band 0 ONLY
    3: BASE.replace("alpha3", "zulu3"),        # near-dup: shares both bands
    4: " ".join(f"unrelated{j} words{j} here{j} now{j}" for j in range(7)),
}


def _write_stream_files(tmp_path, texts_in_order):
    """One doc per file, mtime-ordered, so maxFilesPerTrigger=1 replays
    docs in a deterministic arrival order (first-arriver-keeps is the
    gate's semantics — order must be controlled to pin survivors)."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    base_t = time.time() - 600
    for i, (doc_id, lang, text, ts) in enumerate(texts_in_order):
        p = os.path.join(src, f"{i:03d}.json")
        with open(p, "w") as f:
            f.write(json.dumps(
                {"doc_id": doc_id, "lang": lang, "text": text,
                 "timestamp": ts}) + "\n")
        os.utime(p, (base_t + i * 10, base_t + i * 10))
    return src


def _run_curation(spark, tmp_path, src, **kw):
    from flink_wikipedia_spark.streaming.pipeline import build_curation_stream

    sink = MemorySink()
    q = build_curation_stream(
        spark,
        file_source(spark, src, max_files_per_trigger=1),
        sink,
        str(tmp_path / "ck"),
        **kw,
    )
    q.awaitTermination(120)
    return sink


def test_rowlocal_sigs_match_batch_operator(spark):
    """minhash_sig_cols (the stream gate's zero-exchange fold) must be
    bit-identical to minhash_signatures (batch explode+groupBy) on the
    real corpus — the parity the whole gate stands on."""
    from flink_wikipedia_spark.functions.constants import MINHASH_NUM_HASHES
    from flink_wikipedia_spark.operators.dedup import (
        minhash_sig_cols,
        minhash_signatures,
    )
    from flink_wikipedia_spark.schemas import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    cols = [f"sig_{i}" for i in range(MINHASH_NUM_HASHES)]
    a = {r.doc_id: tuple(r[c] for c in cols)
         for r in docs.select("doc_id", *minhash_sig_cols("text")).collect()}
    b = {r.doc_id: tuple(r[c] for c in cols)
         for r in minhash_signatures(docs).collect()}
    assert a == b and len(a) > 0


def _arrivals():
    ts = "2024-01-01T10:01:{:02d}Z"
    rows = [
        (i, f"l{i}", TEXTS[i], ts.format(i)) for i in sorted(TEXTS)
    ]
    # watermark-advancing straggler in a later window
    rows.append((9, "l9", TEXTS[4] + " tail marker", "2024-01-01T11:00:00Z"))
    return rows


def test_neardup_gate_drops_any_band_collision(spark, tmp_path):
    """With neardup_gate=True, docs 2 (band-0 collision only) and 3
    (both bands) drop; docs 1 and 4 survive. Per-doc langs identify
    survivors in the windowed output."""
    sink = _run_curation(
        spark, tmp_path, _write_stream_files(tmp_path, _arrivals()),
        neardup_gate=True,
    )
    survivors = {
        r.lang for r in sink.rows
        if (r.window_start.hour, r.window_start.minute) == (10, 0)
    }
    assert survivors == {"l1", "l4"}


def test_without_gate_fuzzy_dups_survive(spark, tmp_path):
    """Control: the exact-dup stage alone keeps all four distinct
    texts — the near-dup drops in the gated run are the LSH gate's."""
    sink = _run_curation(
        spark, tmp_path, _write_stream_files(tmp_path, _arrivals()),
        neardup_gate=False,
    )
    survivors = {
        r.lang for r in sink.rows
        if (r.window_start.hour, r.window_start.minute) == (10, 0)
    }
    assert survivors == {"l1", "l2", "l3", "l4"}


def test_stream_survivors_match_batch_greedy(spark, tmp_path):
    """Batch/stream parity on a larger fixture: expected survivors are
    REPLAYED from the batch q_minhash family (minhash_signatures →
    minhash_band_col) with the chained-stage greedy (claim band b's
    bucket only after surviving bands < b), not hardcoded."""
    from flink_wikipedia_spark.functions.constants import MINHASH_BANDS
    from flink_wikipedia_spark.operators.dedup import (
        minhash_band_col,
        minhash_signatures,
    )

    texts = {}
    for g in range(5):
        base = " ".join(f"g{g}w{j} g{g}x{j} g{g}y{j} g{g}z{j}" for j in range(7))
        texts[10 * g + 1] = base
        texts[10 * g + 2] = base + f" extra{g}"          # superset near-dup
        texts[10 * g + 3] = base.replace(f"g{g}w3", f"g{g}q3")  # swap near-dup
    order = sorted(texts)

    df = spark.createDataFrame(
        [(i, texts[i]) for i in order], "doc_id long, text string"
    )
    keys = {
        r.doc_id: [r[f"b{b}"] for b in range(MINHASH_BANDS)]
        for r in minhash_signatures(df).select(
            "doc_id",
            *[minhash_band_col(b).alias(f"b{b}") for b in range(MINHASH_BANDS)],
        ).collect()
    }
    seen = [set() for _ in range(MINHASH_BANDS)]
    expected = set()
    for i in order:
        for b in range(MINHASH_BANDS):
            if keys[i][b] in seen[b]:
                break
            seen[b].add(keys[i][b])
        else:
            expected.add(f"l{i}")
    # the fixture must actually exercise dropping
    assert len(expected) < len(order)

    ts = "2024-01-01T10:0{}:{:02d}Z"
    rows = [
        (i, f"l{i}", texts[i], ts.format(k // 60, k % 60))
        for k, i in enumerate(order)
    ]
    rows.append((99, "l99", "watermark advancing straggler " + texts[1],
                 "2024-01-01T11:00:00Z"))
    sink = _run_curation(
        spark, tmp_path, _write_stream_files(tmp_path, rows),
        neardup_gate=True,
    )
    survivors = {
        r.lang for r in sink.rows if r.window_start.hour == 10
    }
    assert survivors == expected


def test_neardup_band_state_survives_checkpoint_restart(spark, tmp_path):
    """The band-key stores must RESTORE across a query restart: doc 1
    arrives before the stop, its near-dup (doc 2, band collision) only
    after the resume — doc 2 must still drop, which is only possible if
    the restored state carries doc 1's band claims. The resumed run's
    survivors must equal an uninterrupted run over the same files."""
    from flink_wikipedia_spark.streaming.pipeline import build_curation_stream

    ts = "2024-01-01T10:01:{:02d}Z"
    part1 = [(1, "l1", TEXTS[1], ts.format(1))]
    part2 = [
        (2, "l2", TEXTS[2], ts.format(2)),   # near-dup of doc 1
        (4, "l4", TEXTS[4], ts.format(4)),   # distinct
        (9, "l9", TEXTS[4] + " tail marker", "2024-01-01T11:00:00Z"),
    ]

    def run(src, ck, sink):
        q = build_curation_stream(
            spark, file_source(spark, src, max_files_per_trigger=1),
            sink, ck, neardup_gate=True,
        )
        q.awaitTermination(120)

    # interrupted run: two availableNow executions over one checkpoint
    src = str(tmp_path / "src_resume")
    os.makedirs(src, exist_ok=True)
    base_t = time.time() - 600
    def add(rows, offset):
        for i, (doc_id, lang, text, t) in enumerate(rows, start=offset):
            p = os.path.join(src, f"{i:03d}.json")
            with open(p, "w") as f:
                f.write(json.dumps({"doc_id": doc_id, "lang": lang,
                                    "text": text, "timestamp": t}) + "\n")
            os.utime(p, (base_t + i * 10, base_t + i * 10))
    sink = MemorySink()
    ck = str(tmp_path / "ck_resume")
    add(part1, 0)
    run(src, ck, sink)
    add(part2, 1)
    run(src, ck, sink)
    resumed = {(r.lang, r.window_start) for r in sink.rows}

    # uninterrupted control: same rows, fresh source/checkpoint
    src2 = _write_stream_files(tmp_path, part1 + part2)
    sink2 = MemorySink()
    run(src2, str(tmp_path / "ck_control"), sink2)
    control = {(r.lang, r.window_start) for r in sink2.rows}

    assert resumed == control
    survivors = {lang for lang, w in resumed if w.hour == 10}
    # doc 2 dropped ACROSS the restart boundary; doc 1 and 4 kept
    assert survivors == {"l1", "l4"}


def test_neardup_gate_measured_recall_and_false_drop(spark, tmp_path):
    """MEASURED recall and false-drop rate on a labeled fixture (r15 —
    the gate's analytic claims made empirical). Three labeled
    populations with engineered true Jaccard, disjoint vocabularies
    (cross-pair J = 0), all passing the heuristic quality gate:

    - 40 pairs at J = 36/40 = 0.90   (banding bound 1-(1-.9^4)^2 = 0.8817)
    - 40 pairs at J = 20/28 ≈ 0.714  (curve value ≈ 0.4529)
    - 40 singletons (J = 0 to everything)

    Originals + singletons arrive in micro-batch 0, duplicates in
    micro-batch 1 (same event-time window, above the batch-0
    watermark so none are late-dropped), a straggler closes the
    window. Measured on the fixed hash family (seeded constants, so
    the outcome is deterministic and pinned EXACTLY):

    - recall@0.90 = 36/40 = 0.900  >= the 0.8817 banding bound
    - recall@0.71 = 17/40 = 0.425  (curve 0.4529 — the gate is a
      HIGH-bar near-dup filter by design, see constants.py banding note)
    - false drops = 0/120 — no unique doc lost to a band collision;
      what the gate costs in good data at these parameters is zero on
      this fixture (md5 band keys collide only on equal 4-slot
      signature bands, ~s^4 per band at similarity s).

    The same numbers are quoted in build_curation_stream's docstring;
    a change to the MinHash constants re-pins this test by design."""
    N = 40
    docs: dict[str, str] = {}
    for p in range(N):
        toks = [f"g9d{p}t{j}" for j in range(38)]
        docs[f"hi{p}o"] = " ".join(toks)
        dup = toks[:]
        dup[5], dup[20] = f"g9d{p}r5", f"g9d{p}r20"
        docs[f"hi{p}d"] = " ".join(dup)  # J = 36/(76-36) = 0.90
    for p in range(N):
        toks = [f"g7d{p}t{j}" for j in range(24)]
        docs[f"mid{p}o"] = " ".join(toks)
        dup = toks[:]
        for j in (3, 9, 15, 21):
            dup[j] = f"g7d{p}r{j}"
        docs[f"mid{p}d"] = " ".join(dup)  # J = 20/(48-20) ≈ 0.714
    for u in range(N):
        docs[f"u{u}"] = " ".join(f"g0d{u}t{j}" for j in range(24))

    batch0 = sorted(k for k in docs if k.endswith("o") or k.startswith("u"))
    batch1 = sorted(k for k in docs if k.endswith("d"))
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    base_t = time.time() - 600
    for i, (names, ts) in enumerate(
        [
            (batch0, "2024-01-01T10:01:00Z"),
            (batch1, "2024-01-01T10:01:30Z"),  # above batch-0 watermark
            (["straggler"], "2024-01-01T11:00:00Z"),
        ]
    ):
        p = os.path.join(src, f"{i:03d}.json")
        with open(p, "w") as f:
            for k in names:
                text = docs.get(k) or " ".join(
                    f"g8s0t{j}" for j in range(24)
                )
                f.write(json.dumps(
                    {"doc_id": 0, "lang": k, "text": text,
                     "timestamp": ts}) + "\n")
        os.utime(p, (base_t + i * 10, base_t + i * 10))

    sink = _run_curation(spark, tmp_path, src, neardup_gate=True)
    survivors = {r.lang for r in sink.rows if r.window_start.hour == 10}

    hi_caught = sum(1 for p in range(N) if f"hi{p}d" not in survivors)
    mid_caught = sum(1 for p in range(N) if f"mid{p}d" not in survivors)
    false_drops = {k for k in batch0 if k not in survivors}

    # (a) recall at s=0.9 meets the banding-curve bound — exact pin
    assert hi_caught == 36
    assert hi_caught / N >= 1 - (1 - 0.9**4) ** 2
    # (b) mid-similarity recall tracks the curve (0.4529) — exact pin
    assert mid_caught == 17
    # (c) the gate's cost in good data: ZERO false drops out of 120
    assert false_drops == set()
