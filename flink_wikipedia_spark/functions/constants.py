"""Deterministic constants shared by Spark queries and generated oracle SQL.

Everything here is produced by a tiny explicit LCG (no dependence on
library RNG implementations) so the Spark expression tree and the DuckDB
SQL text embed the *same* literals, forever.
"""

from __future__ import annotations


def _lcg(seed: int):
    # Numerical Recipes LCG; full 32-bit state, deterministic everywhere.
    state = seed & 0xFFFFFFFF
    while True:
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        yield state


# ---------------------------------------------------------------------------
# MinHash (north-star E1 family). h_i(t) = (A[i]*hm + B[i]) % P where
# hm = stable_token_hash(t) % HM_MOD keeps every product < 2^63 on both
# engines (Spark runs ANSI mode: overflow is an error, not a wrap).
# ---------------------------------------------------------------------------

# 2 bands × 4 rows: candidate threshold ≈ (1/b)^(1/r) = 0.84 Jaccard —
# a real near-dup bar. Looser banding (4×2 ⇒ ~0.5) floods the candidate
# join on high-overlap corpora (the synthetic docs share a ~31-word
# vocabulary, so ~all pairs collide — 12.5M candidates at sf0.1).
MINHASH_NUM_HASHES = 8
MINHASH_BANDS = 2
MINHASH_ROWS_PER_BAND = MINHASH_NUM_HASHES // MINHASH_BANDS
HM_MOD = 1_000_003         # token hash reduced below ~2^20
MINHASH_P = 999_999_937    # prime modulus; A*hm + B ≤ ~1e12+1e9 < 2^63

_g = _lcg(42)
MINHASH_A = [(next(_g) % (HM_MOD - 1)) + 1 for _ in range(MINHASH_NUM_HASHES)]
MINHASH_B = [next(_g) % MINHASH_P for _ in range(MINHASH_NUM_HASHES)]

# ---------------------------------------------------------------------------
# SimHash: 16-bit fingerprints from the same reduced token hash. Bit j of
# token t is (hm >> j) & 1 — expressed as integer div/mod so both engines
# compute it identically.
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16

# ---------------------------------------------------------------------------
# LSH hyperplanes for embedding bucketing (similarity e2-at-scale path).
# 8 signed hyperplanes over 64 dims; bucket id = 8 sign bits. Components
# are small integers in [-4, 4] (exactly representable as doubles, so the
# dot products are the same FP computation on both engines).
# ---------------------------------------------------------------------------

EMBEDDING_DIM = 64
LSH_NUM_PLANES = 8
_g2 = _lcg(4242)
LSH_PLANES: list[list[float]] = [
    [float((next(_g2) % 9) - 4) for _ in range(EMBEDDING_DIM)]
    for _ in range(LSH_NUM_PLANES)
]

# ---------------------------------------------------------------------------
# Tiny per-language stopword lists for the heuristic language-ID operator
# (north-star text analysis). Real deployments would ship real lists; the
# operator's mechanics (token-set overlap scoring) are what matters.
# ---------------------------------------------------------------------------

LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "bu", "le", "wo"],
}

# English-ish stopwords for quality scoring (stopword *ratio* is a standard
# LLM-corpus quality signal; synthetic docs use english-ish tokens).
QUALITY_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]
