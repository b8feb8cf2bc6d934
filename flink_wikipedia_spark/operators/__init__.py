"""Operator library.

    core.py        reference-parity operators (decode, filter, project,
                   keyed tumbling-window aggregate, JSON encode) —
                   SURVEY.md §2.1 O2–O10
    relational.py  joins, sorts/top-k, set ops, rollup/cube, analytic
                   windows, sessionization — SURVEY.md §2.2/E4–E9
    dedup.py       exact, MinHash+LSH, SimHash, n-gram Jaccard,
                   embedding near-dup — north star E1
    similarity.py  brute-force + LSH-bucketed cosine top-k — E2
    text.py        tokenize/word-count, language-ID, quality scoring,
                   token counting, fingerprinting — E3
    multimodal.py  binary payload plumbing + Arrow-batched decode stubs — E12

Every operator is a pure ``DataFrame -> DataFrame`` transform: logical
plan in, logical plan out. Catalyst sees the whole composed tree, so
pushdown/pruning cross operator boundaries — the property the reference
(hand-ordered physical operators, SURVEY.md §4.1) cannot have.
"""
