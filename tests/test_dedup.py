"""SimHash banded pairing: the Manku rotated-block scheme must be
EXACTLY the all-pairs answer inside the Hamming budget (pigeonhole:
pairs within d bits agree on >= 1 of d+1 blocks), while staying an
equi-join plan. Also evidence for why it replaced the single-prefix
variant: a pair whose differing bit lands in the prefix is missed by
the prefix bucket but found by banding.
"""

import pytest

from quasdb_spark.operators.dedup import (simhash, simhash_hamming_pairs,
                                          simhash_hamming_pairs_banded)
from quasdb_spark.sources.tables import load_table


def test_simhash_banded_equals_all_pairs(spark, sf_dir):
    """Full recall + precision 1 => banded result == brute force.
    Brute force = the prefix variant with prefix_bits=0 (one bucket)."""
    sim = simhash(load_table(spark, sf_dir, "documents")).persist()
    try:
        banded = {(r.id_a, r.id_b, r.hamming)
                  for r in simhash_hamming_pairs_banded(
                      sim, max_hamming=3).collect()}
        brute = {(r.id_a, r.id_b, r.hamming)
                 for r in simhash_hamming_pairs(
                     sim, max_hamming=3, prefix_bits=0).collect()}
        assert banded == brute
    finally:
        sim.unpersist()


def test_simhash_banded_finds_what_single_prefix_misses(spark):
    # hamming=1, differing bit inside the 12-bit prefix: prefix bucketing
    # separates the pair; block 2..4 of the 4x15 banding still match.
    rows = [("a", "1" + "0" * 59), ("b", "0" * 60)]
    sim = spark.createDataFrame(rows, "doc_id string, simhash string")
    banded = simhash_hamming_pairs_banded(sim, max_hamming=3).collect()
    prefix = simhash_hamming_pairs(sim, max_hamming=3,
                                   prefix_bits=12).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in banded] == [("a", "b", 1)]
    assert prefix == []


def test_simhash_banded_plan_is_equi_join(spark, sf_dir):
    sim = simhash(load_table(spark, sf_dir, "documents"))
    plan = simhash_hamming_pairs_banded(sim)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_banded_uneven_split_covers_all_bits(spark):
    # bits=60, max_hamming=4 -> 5 bands of 12; max_hamming=6 -> 7 bands
    # (4 of 9 + 3 of 8 = 60): uneven widths must still tile the string.
    rows = [("a", "0" * 60), ("b", "0" * 53 + "1111111")]  # hamming 7
    sim = spark.createDataFrame(rows, "doc_id string, simhash string")
    assert simhash_hamming_pairs_banded(sim, max_hamming=6).collect() == []
    rows2 = [("a", "0" * 60), ("b", "0" * 54 + "111111")]  # hamming 6
    sim2 = spark.createDataFrame(rows2, "doc_id string, simhash string")
    got = simhash_hamming_pairs_banded(sim2, max_hamming=6).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [("a", "b", 6)]


def test_cluster_assign_matches_union_find(spark):
    """Unrolled min-label propagation == exact connected components
    once n_iter >= diameter; randomized graph, python union-find
    oracle."""
    import random

    from quasdb_spark.operators.dedup import cluster_assign

    rng = random.Random(7)
    n = 60
    edges = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                    for _ in range(45) if True})
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    # diameter of a 60-node/~40-edge sparse graph: iterate to fixpoint
    labels = cluster_assign(pairs, nodes, n_iter=20)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == want


def test_dedup_index_lifecycle(spark, tmp_path):
    """build -> check finds the planted near-dup (and only it) ->
    append -> a re-check now also matches the appended doc; the
    estimator threshold drops weak band-collision pairs."""
    from quasdb_spark.operators.dedup import (append_to_index,
                                              build_dedup_index,
                                              check_against_index,
                                              load_dedup_index)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight while "
            "seventeen other animals watch from behind ancient mossy "
            "trees wondering where exactly this energetic creature "
            "finds the strength to keep sprinting through autumn "
            "leaves and cold river crossings without ever stopping "
            "to rest or eat anything at all during the long journey")
    corpus = spark.createDataFrame(
        [(1, base),
         (2, "completely unrelated text about spark shuffles and "
             "partition pruning at terabyte scale for analytics"),
         (3, "a third document with its own words entirely disjoint "
             "from everything else in this tiny corpus here")],
        "doc_id long, text string")
    path = str(tmp_path / "idx")
    meta = build_dedup_index(corpus, path, n_bands=2)
    assert meta["n_hashes"] > 0

    idx, meta2 = load_dedup_index(spark, path)
    assert meta2 == meta
    # near-dup of doc 1 (one word changed), plus a fresh unique doc
    new = spark.createDataFrame(
        [(100, base.replace("lazy", "sleepy")),
         (101, "nothing like anything indexed so far at all really "
               "with zero shared shingles against the corpus")],
        "doc_id long, text string")
    got = check_against_index(new, idx, meta, min_est_jaccard=0.5)
    rows = {(r["new_id"], r["match_id"]) for r in got.collect()}
    assert rows == {(100, 1)}

    # append doc 100; its own near-dup should now match BOTH 1 and 100
    append_to_index(new.where("doc_id = 100"), path)
    idx2, _ = load_dedup_index(spark, path)
    newer = spark.createDataFrame(
        [(200, base.replace("dog", "cat"))], "doc_id long, text string")
    got2 = check_against_index(newer, idx2, meta, min_est_jaccard=0.5)
    rows2 = {(r["new_id"], r["match_id"]) for r in got2.collect()}
    assert (200, 1) in rows2 and (200, 100) in rows2


def test_duplicate_spans_merging_and_keep_first(spark):
    """Exact-substring spans: duplicated k-token windows merge into
    per-doc token spans (end exclusive); internal repetition within
    one doc counts; keep_first exempts the smallest (id, pos)
    occurrence of every window so one copy always survives."""
    import pytest

    from quasdb_spark.operators.dedup import duplicate_spans

    common = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"  # 12 tokens
    rows = [(1, f"a1 b1 {common} c1 d1"),
            (2, f"a2 {common} c2"),
            (3, "totally unique words only here nothing repeats ever"),
            (4, f"{common} {common}")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in duplicate_spans(df, k=8).collect()}
    # doc1: common at tokens [2, 14); doc2: [1, 13); doc4 both copies
    # merge into [0, 24); doc3 clean
    assert got == {(1, 2, 14), (2, 1, 13), (4, 0, 24)}

    kept = {(r.doc_id, r.span_start, r.span_end)
            for r in duplicate_spans(df, k=8, keep_first=True).collect()}
    # every window's first occurrence is in doc1 -> doc1 fully exempt
    assert (1, 2, 14) not in kept
    assert (2, 1, 13) in kept
    # spans still cover every duplicated substring at least once
    assert any(d == 4 for d, _, _ in kept)

    with pytest.raises(ValueError, match="k must be"):
        duplicate_spans(df, k=0)


def test_duplicate_spans_no_false_positives(spark):
    """Unique corpora report NO spans (exact matching — blocking can
    only find true window repeats), and spans never exceed doc
    bounds."""
    from quasdb_spark.operators.dedup import duplicate_spans
    from quasdb_spark.functions.text import token_count
    import pyspark.sql.functions as F

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(30)))
            for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert duplicate_spans(df, k=5).count() == 0

    dup_rows = rows + [(99, rows[0][1])]  # one exact copy
    df2 = spark.createDataFrame(dup_rows, ["doc_id", "text"])
    spans = duplicate_spans(df2, k=5)
    joined = spans.join(df2.select("doc_id",
                                   token_count("text").alias("n")),
                        "doc_id")
    bad = joined.where((F.col("span_start") < 0)
                       | (F.col("span_end") > F.col("n"))).count()
    assert bad == 0
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    assert got == {(0, 0, 30), (99, 0, 30)}


def test_drop_duplicate_spans_cleans_in_token_space(spark):
    """Span application: tokens inside any span are removed, the rest
    rejoin in order; span-free docs pass through (normalized); with
    keep_first spans, one copy of the duplicated substring survives
    corpus-wide."""
    from quasdb_spark.operators.dedup import (drop_duplicate_spans,
                                              duplicate_spans)

    common = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    rows = [(1, f"a1 b1 {common} c1 d1"),
            (2, f"a2 {common} c2"),
            (3, "Unique Words Only HERE")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = duplicate_spans(df, k=8, keep_first=True)
    out = {r.doc_id: r.clean_text
           for r in drop_duplicate_spans(df, spans).collect()}
    # doc1 holds the surviving first occurrence: untouched (normalized)
    assert out[1] == f"a1 b1 {common} c1 d1"
    # doc2's copy is cut, surrounding tokens rejoin
    assert out[2] == "a2 c2"
    # span-free doc: pass-through with the token normalization applied
    assert out[3] == "unique words only here"
    # the duplicated substring still exists exactly once corpus-wide
    assert sum(common in t for t in out.values()) == 1


def test_minhash_excludes_empty_shingle_hot_bucket(spark):
    """Docs shorter than shingle_n tokens have an empty shingle set —
    every MinHash seed is NULL and concat_ws skips NULLs, so without
    the guard ALL such docs share md5('') as their band key in every
    band: one quadratic hot bucket. They must produce NO candidate
    pairs (their Jaccard is undefined/0 anyway, so no verified output
    changes)."""
    from quasdb_spark.operators.dedup import (minhash_candidate_pairs,
                                              near_dup_pairs)

    # the real pair shares an identical shingle set -> identical
    # signatures -> guaranteed band collision (MinHash banding is
    # probabilistic for merely-similar docs)
    rows = [(i, "hi") for i in range(40)] + \
           [(100, "the quick brown fox jumps high"),
            (101, "the quick brown fox jumps high")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cands = minhash_candidate_pairs(df).collect()
    # no pair touches a short doc; real near-dup pair still found
    assert all(r.id_a >= 100 and r.id_b >= 100 for r in cands)
    assert (100, 101) in {(r.id_a, r.id_b) for r in cands}
    verified = near_dup_pairs(df, threshold=0.3).collect()
    assert {(r.id_a, r.id_b) for r in verified} == {(100, 101)}


def test_minhash_max_bucket_size_drops_hot_bucket(spark):
    """The skew guard: identical boilerplate docs form one huge LSH
    bucket; max_bucket_size drops it (sacrificing recall there) while
    smaller buckets still pair."""
    from quasdb_spark.operators.dedup import minhash_candidate_pairs

    boiler = [(i, "lorem ipsum dolor sit amet consectetur")
              for i in range(20)]
    pair = [(100, "the quick brown fox jumps over dogs"),
            (101, "the quick brown fox jumps over dogs")]
    df = spark.createDataFrame(boiler + pair, "doc_id int, text string")
    guarded = minhash_candidate_pairs(df, max_bucket_size=5)
    got = {(r.id_a, r.id_b) for r in guarded.collect()}
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)  # boilerplate bucket dropped
    unguarded = minhash_candidate_pairs(df)
    assert len(unguarded.collect()) > len(got)  # guard actually pruned


def test_duplicate_spans_separator_unambiguous(spark):
    """Tokens CAN contain \\x1f (the \\s+ tokenizer only splits on
    whitespace), so the window hash must length-prefix tokens: under a
    bare separator join, ["a\\x1fb","c"] and ["a","b\\x1fc"] would
    hash equal and create a false duplicate span."""
    from quasdb_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, "a\x1fb c"), (2, "a b\x1fc")], "doc_id int, text string")
    assert duplicate_spans(df, k=2, min_count=2).collect() == []
    # genuinely equal windows still match
    df2 = spark.createDataFrame(
        [(1, "x y"), (2, "x y")], "doc_id int, text string")
    spans = duplicate_spans(df2, k=2, min_count=2).collect()
    assert {(r.doc_id, r.span_start, r.span_end)
            for r in spans} == {(1, 0, 2), (2, 0, 2)}


def test_minhash_fast_engines_bit_identical(spark):
    """The affine-rehash signature's two engines — the interpreted
    expression fold and the vectorized Arrow pass — must produce
    BIT-IDENTICAL signatures (exact int64 arithmetic both sides), and
    both must match a hand-rolled Python reference that pins the
    scheme itself (md5-prefix base hash, (a*h+b) mod p minima with
    affine_params' constants)."""
    import hashlib

    from quasdb_spark.operators.dedup import (P32, affine_params,
                                              minhash_signature_fast)

    texts = {1: "the quick brown fox jumps over the lazy dog",
             2: "the quick brown fox jumps over the lazy cat",
             3: "hi",  # < shingle_n tokens -> all-NULL signature
             4: "pack my box with five dozen liquor jugs today"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id int, text string")

    def ref(text, k, n=3):
        w = text.split()
        sh = {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} \
            if len(w) >= n else set()
        if not sh:
            return [None] * k
        bh = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
              for s in sh]
        return [min((h * a + b) % P32 for h in bh)
                for a, b in affine_params(k)]

    arrow = {r.doc_id: r.minhash_sig for r in
             minhash_signature_fast(df, n_hashes=16,
                                    engine="arrow").collect()}
    expr = {r.doc_id: r.minhash_sig for r in
            minhash_signature_fast(df, n_hashes=16,
                                   engine="expr").collect()}
    assert arrow == expr
    for i, t in texts.items():
        assert arrow[i] == ref(t, 16), i


def test_minhash_xxh_engines_bit_identical_and_pinned(spark):
    """The xxhash64 base-hash scheme (production path, VERDICT r12 #2)
    must be bit-identical across the arrow and expr engines AND match
    a hand-rolled reference pinning the scheme: Spark xxhash64 (seed
    42, UTF-8 bytes) folded to its low 32 bits, then the same affine
    minima as the md5 scheme."""
    from pyspark.sql import functions as F

    from quasdb_spark.operators.dedup import (P32, affine_params,
                                              minhash_signature_fast)

    texts = {1: "the quick brown fox jumps over the lazy dog",
             2: "the quick brown fox jumps over the lazy cat",
             3: "hi",  # < shingle_n tokens -> all-NULL signature
             4: "pack my box with five dozen liquor jugs today"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id int, text string")
    arrow = {r.doc_id: r.minhash_sig for r in
             minhash_signature_fast(df, n_hashes=16, engine="arrow",
                                    base_hash="xxhash64").collect()}
    expr = {r.doc_id: r.minhash_sig for r in
            minhash_signature_fast(df, n_hashes=16, engine="expr",
                                   base_hash="xxhash64").collect()}
    assert arrow == expr
    assert arrow[3] == [None] * 16  # same empty-shingle contract

    # pin the base hash itself via Spark's own xxhash64 on the
    # shingles (the reference the scheme claims to fold)
    def ref_sig(text, k, n=3):
        w = text.split()
        sh = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)] \
            if len(w) >= n else []
        if not sh:
            return [None] * k
        hdf = spark.createDataFrame([(s,) for s in sh], "s string")
        bh = [r.h & 0xFFFFFFFF for r in
              hdf.select(F.xxhash64("s").alias("h")).collect()]
        return [min((h * a + b) % P32 for h in bh)
                for a, b in affine_params(k)]

    assert arrow[1] == ref_sig(texts[1], 16)
    assert arrow[4] == ref_sig(texts[4], 16)


def test_minhash_xxh_banding_parity_with_md5(spark, sf_dir):
    """Banding-statistics parity (VERDICT r12 #2's required guard):
    on real documents the xxh scheme must band like the md5 scheme —
    same number of banded docs, no degenerate hot bucket, and the
    VERIFIED pair sets (exact Jaccard >= threshold — verification is
    hash-independent) nearly identical. Any systematic divergence
    here would mean the folded xxhash64 is a worse LSH family, which
    is exactly what this pins against."""
    from quasdb_spark.operators.dedup import near_dup_pairs
    from quasdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    md5_pairs = {(r.id_a, r.id_b) for r in
                 near_dup_pairs(d, threshold=0.35, n_hashes=64,
                                n_bands=8, scheme="fast").collect()}
    xxh_pairs = {(r.id_a, r.id_b) for r in
                 near_dup_pairs(d, threshold=0.35, n_hashes=64,
                                n_bands=8, scheme="fast",
                                base_hash="xxhash64").collect()}
    assert md5_pairs, "fixture must contain near-dups"
    inter = len(md5_pairs & xxh_pairs)
    union = len(md5_pairs | xxh_pairs)
    # both are (different) 64-hash LSH samples of the same underlying
    # pair set; at 64x8 their verified outputs should coincide almost
    # exactly — 0.9 tolerates band-boundary flips without letting a
    # broken hash family through
    assert inter / union >= 0.9, (len(md5_pairs), len(xxh_pairs),
                                  inter, union)


def test_minhash_wide_fast_finds_exact_dups_and_skips_empty(spark):
    """near_dup_pairs at production width (scheme='fast', 64x8): an
    identical pair always collides in every band; sub-shingle docs are
    excluded before banding (no empty-signature hot bucket)."""
    from quasdb_spark.operators.dedup import near_dup_pairs

    rows = [(i, "no") for i in range(30)] + \
           [(100, "the quick brown fox jumps over the lazy dog"),
            (101, "the quick brown fox jumps over the lazy dog")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = near_dup_pairs(df, threshold=0.5, n_hashes=64, n_bands=8,
                         scheme="fast", max_bucket_size=100).collect()
    assert {(r.id_a, r.id_b, r.jaccard) for r in got} == {(100, 101, 1.0)}


def test_minhash_banding_validates_width(spark):
    """n_bands must evenly divide n_hashes: rows_per_band = 0 would
    band every doc on md5('') (full O(n^2) cross) and a truncating
    divide silently drops signature tail components."""
    import pytest

    from quasdb_spark.operators.dedup import (minhash_candidate_pairs,
                                              near_dup_pairs)

    df = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    with pytest.raises(ValueError):
        minhash_candidate_pairs(df, n_hashes=8, n_bands=16)
    with pytest.raises(ValueError):
        near_dup_pairs(df, n_hashes=100, n_bands=16)
    # expr engine reachable through the pipeline
    got = near_dup_pairs(
        spark.createDataFrame([(1, "x y z w"), (2, "x y z w")],
                              "doc_id int, text string"),
        n_hashes=16, n_bands=4, scheme="fast", engine="expr").collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}


def test_cluster_assign_cc_exact_on_long_paths_and_random_graph(spark):
    """Star contraction is exact for ANY component diameter: a
    48-node path (diameter 47 — far beyond any fixed hop budget)
    plus a randomized graph, both against a python union-find
    oracle, converging in O(log n) alternating rounds."""
    import random

    from quasdb_spark.operators.dedup import cluster_assign_cc

    rng = random.Random(11)
    n = 120
    # one long path through ids 0..47 (+offset to avoid trivial 0-min
    # adjacency), plus random edges over the rest
    path = [(i + 50, i + 51) for i in range(47)]
    rand = [tuple(sorted((rng.randrange(50), rng.randrange(50))))
            for _ in range(30)]
    edges = sorted({(a, b) for a, b in path + rand if a != b})

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    labels = cluster_assign_cc(pairs, nodes, max_rounds=16)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == want


def test_paragraph_dedup_exact_blocks_and_reconstruction(spark):
    """Exact paragraph dedup on planted duplicate blocks: the first
    corpus-wide occurrence (by doc_id, para_idx) survives, later
    copies — across docs AND within a doc — are dropped, and docs
    rebuild from kept paragraphs in order."""
    from quasdb_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "a b c d e f"),          # paras: "a b c", "d e f"
        (2, "a b c x y z"),          # "a b c" duplicates doc 1
        (3, "p q r p q r"),          # intra-doc duplicate
        (4, "d e f a b c"),          # both paras duplicate earlier
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           paragraph_dedup(df, para_tokens=3).collect()}
    assert (got[1].n_paras, got[1].n_kept,
            got[1].new_text) == (2, 2, "a b c d e f")
    assert (got[2].n_paras, got[2].n_kept,
            got[2].new_text) == (2, 1, "x y z")
    assert (got[3].n_paras, got[3].n_kept,
            got[3].new_text) == (2, 1, "p q r")
    assert (got[4].n_paras, got[4].n_kept, got[4].new_text) == (2, 0, "")


def test_paragraph_dedup_delimiter_mode(spark):
    """CCNet-shape delimiter paragraphs: split on blank lines, empty
    paragraphs dropped, reconstruction rejoins with a blank line."""
    from quasdb_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "first para here\n\nsecond para here"),
        (2, "second para here\n\n\n\nbrand new content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           paragraph_dedup(df, delimiter=r"\n{2,}").collect()}
    assert got[1].new_text == "first para here\n\nsecond para here"
    assert (got[2].n_paras, got[2].n_kept) == (2, 1)
    assert got[2].new_text == "brand new content"


def test_paragraph_dedup_minhash_mode(spark):
    """Fuzzy paragraph dedup: a near-duplicate paragraph (one token
    changed, Jaccard over 3-shingles >= threshold) clusters with the
    original and only the globally-first survives; an unrelated
    paragraph and a too-short-to-shingle paragraph are kept."""
    from quasdb_spark.operators.dedup import paragraph_dedup

    base = "the quick brown fox jumps over the lazy dog again today"
    near = "the quick brown fox jumps over the lazy cat again today"
    other = "completely different content about spark shuffle plans"
    rows = [(1, base), (2, near), (3, other), (4, "hi")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           paragraph_dedup(df, mode="minhash", para_tokens=20,
                           threshold=0.5, n_hashes=8, n_bands=4)
           .collect()}
    assert (got[1].n_kept, got[1].new_text) == (1, base)
    assert (got[2].n_kept, got[2].new_text) == (0, "")
    assert got[3].n_kept == 1
    assert (got[4].n_kept, got[4].new_text) == (1, "hi")


def test_paragraph_dedup_invariants_randomized(spark):
    """Properties of exact paragraph dedup over a seeded random
    corpus: (1) every reconstruction is the in-order space-join of a
    subset of that doc's paragraphs; (2) each distinct paragraph
    string survives EXACTLY once corpus-wide; (3) the survivor is the
    globally-first occurrence by (doc_id, para_idx)."""
    import random

    from quasdb_spark.operators.dedup import paragraph_dedup

    rng = random.Random(11)
    vocab = ["red", "blue", "fox", "dog", "run", "sit"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in
                         range(rng.randint(0, 25))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           paragraph_dedup(df, para_tokens=4).collect()}

    # python reference of the paragraph split + keep-first policy
    paras = {}
    order = []
    for doc_id, text in rows:
        toks = text.split()
        blocks = [" ".join(toks[i:i + 4]) for i in range(0, len(toks), 4)]
        paras[doc_id] = blocks
        for idx, p in enumerate(blocks):
            order.append((doc_id, idx, p))
    first = {}
    for doc_id, idx, p in sorted(order):
        first.setdefault(p, (doc_id, idx))

    total_kept = 0
    for doc_id, blocks in paras.items():
        if not blocks:
            assert doc_id not in got  # empty docs emit no paragraphs
            continue
        r = got[doc_id]
        assert r.n_paras == len(blocks)
        expect = [p for idx, p in enumerate(blocks)
                  if first[p] == (doc_id, idx)]
        assert r.new_text == " ".join(expect), doc_id
        assert r.n_kept == len(expect)
        total_kept += r.n_kept
    assert total_kept == len(first)  # each distinct paragraph once


def test_duplicate_spans_hot_join_never_broadcasts(spark, sf_dir):
    """Regression pin for the sf10 OOM (BENCH r12): the duplicated-
    window hash set is data-dependent and unbounded, so its join-back
    must stay a ShuffledHashJoin no matter what AQE estimates — a
    broadcast build of it blew the heap at 100x data. Same pin for
    drop_hot_buckets' bucket-size filter."""
    from quasdb_spark.operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    plan = duplicate_spans(docs, k=8)._jdf \
        .queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan

    from quasdb_spark.operators.dedup import drop_hot_buckets

    b = docs.selectExpr("doc_id", "substring(text, 1, 2) as k")
    plan2 = drop_hot_buckets(b, ["k"], 10)._jdf \
        .queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan2
    assert "BroadcastHashJoin" not in plan2


def test_dedup_index_fast_xxhash_scheme_lifecycle(spark, tmp_path):
    """VERDICT r13 #5: the production hashing (fast affine scheme on
    an xxhash64 base) reaches the INCREMENTAL index — params are
    persisted in the sidecar, check/append derive their hashing from
    it (no caller knob to mix schemes), and the planted near-dup
    verdicts agree with the md5-scheme index on the same corpus."""
    from quasdb_spark.operators.dedup import (append_to_index,
                                              build_dedup_index,
                                              check_against_index,
                                              load_dedup_index)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight while "
            "seventeen other animals watch from behind ancient mossy "
            "trees wondering where exactly this energetic creature "
            "finds the strength to keep sprinting through autumn "
            "leaves and cold river crossings without ever stopping "
            "to rest or eat anything at all during the long journey")
    corpus = spark.createDataFrame(
        [(1, base),
         (2, "completely unrelated text about spark shuffles and "
             "partition pruning at terabyte scale for analytics"),
         (3, "a third document with its own words entirely disjoint "
             "from everything else in this tiny corpus here")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, base.replace("lazy", "sleepy")),
         (101, "nothing like anything indexed so far at all really "
               "with zero shared shingles against the corpus")],
        "doc_id long, text string")

    verdicts = {}
    for scheme, bh in [("md5", "md5"), ("fast", "xxhash64")]:
        path = str(tmp_path / f"idx-{scheme}-{bh}")
        meta = build_dedup_index(corpus, path, n_hashes=32, n_bands=8,
                                 scheme=scheme, base_hash=bh)
        assert meta["scheme"] == scheme and meta["base_hash"] == bh
        idx, meta2 = load_dedup_index(spark, path)
        assert meta2 == meta          # sidecar round-trips the scheme
        got = check_against_index(new, idx, meta2,
                                  min_est_jaccard=0.5)
        verdicts[scheme] = {(r["new_id"], r["match_id"])
                            for r in got.collect()}
        # append derives hashing from the sidecar too
        append_to_index(new.where("doc_id = 100"), path)
        idx2, _ = load_dedup_index(spark, path)
        newer = spark.createDataFrame(
            [(200, base.replace("dog", "cat"))],
            "doc_id long, text string")
        rows2 = {(r["new_id"], r["match_id"]) for r in
                 check_against_index(newer, idx2, meta2,
                                     min_est_jaccard=0.5).collect()}
        assert (200, 1) in rows2 and (200, 100) in rows2, scheme
    assert verdicts["md5"] == verdicts["fast"] == {(100, 1)}


def test_dedup_index_legacy_meta_defaults_to_md5(spark, tmp_path):
    """An index whose sidecar predates scheme stamping must keep
    probing exactly as before (md5 k-fold scheme)."""
    import json

    from quasdb_spark.operators.dedup import (build_dedup_index,
                                              check_against_index,
                                              load_dedup_index)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu nu xi omicron pi rho sigma tau")],
        "doc_id long, text string")
    path = str(tmp_path / "legacy")
    build_dedup_index(docs, path, n_hashes=16, n_bands=2)
    # strip the scheme fields, as a pre-r14 writer would have left it
    import os

    mp = f"{path}/_dedup_index_meta.json"
    meta = json.loads(open(mp).read())
    meta.pop("scheme"), meta.pop("base_hash")
    open(mp, "w").write(json.dumps(meta))
    crc = f"{path}/._dedup_index_meta.json.crc"
    if os.path.exists(crc):   # hadoop local-FS checksum of the old bytes
        os.unlink(crc)
    idx, m2 = load_dedup_index(spark, path)
    assert "scheme" not in m2
    got = check_against_index(docs, idx, m2, min_est_jaccard=0.99)
    # the doc matches itself exactly under the defaulted md5 scheme
    assert {(r["new_id"], r["match_id"]) for r in got.collect()} \
        == {(1, 1)}


def test_paragraph_dedup_fast_xxhash_agrees_on_exact_dups(spark):
    """paragraph_dedup(mode='minhash') accepts the production scheme
    knobs; EXACT duplicate paragraphs produce identical signatures
    under any scheme, so the keep/drop decisions must agree with the
    md5 path on a planted exact-dup corpus."""
    from quasdb_spark.operators.dedup import paragraph_dedup

    block = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, block + " " + block),             # self-dup paragraphs
         (2, block + " eleven twelve thirteen fourteen fifteen "
             "sixteen seventeen eighteen nineteen twenty"),
         (3, "totally different words nothing shared here at all "
             "not even one single overlapping token sequence")],
        "doc_id long, text string")
    outs = {}
    for scheme, bh in [("md5", "md5"), ("fast", "xxhash64")]:
        outs[scheme] = {
            r["doc_id"]: (r["n_paras"], r["n_kept"])
            for r in paragraph_dedup(df, mode="minhash",
                                     para_tokens=10, threshold=0.9,
                                     n_hashes=16, n_bands=4,
                                     scheme=scheme,
                                     base_hash=bh).collect()}
    assert outs["md5"] == outs["fast"]
    # doc 1 drops its duplicate second block; doc 2's FIRST block is
    # the same exact paragraph (keep-first kept doc 1's copy), so doc 2
    # keeps only its unique second block; doc 3 keeps its single block
    assert outs["md5"][1] == (2, 1)
    assert outs["md5"][2] == (2, 1)
    assert outs["md5"][3][0] == outs["md5"][3][1]


def _handmade_index(spark, tmp_path, name, sig_rows, n_bands,
                    n_hashes=8):
    """Write a banded index with HANDCRAFTED signatures (band keys
    derived by the real lsh_band_keys, so re-band stats agree), plus
    a sidecar WITHOUT bucket_stats — the shape an append leaves."""
    import json

    from pyspark.sql import functions as F

    from quasdb_spark.operators.dedup import lsh_band_keys

    path = str(tmp_path / name)
    sigs = spark.createDataFrame(
        sig_rows, "doc_id long, minhash_sig array<string>")
    keys = lsh_band_keys(n_bands=n_bands,
                         rows_per_band=n_hashes // n_bands)
    entries = sigs.select(
        "doc_id", "minhash_sig",
        F.posexplode(F.array(*keys)).alias("band", "band_key"))
    (entries.repartition("band").sortWithinPartitions("band_key")
            .write.mode("overwrite").partitionBy("band").parquet(path))
    meta = {"n_hashes": n_hashes, "n_bands": n_bands, "shingle_n": 3,
            "scheme": "md5", "base_hash": "md5"}
    with open(f"{path}/_dedup_index_meta.json", "w") as f:
        json.dump(meta, f)
    meta["path"] = path
    return path, meta


def test_ensure_banded_auto_rebands_hot_index(spark, tmp_path):
    """VERDICT r14 board #2 pin: an index whose band buckets outgrew
    the cap (short band keys over a grown corpus) auto-RE-BANDS from
    its own stored signatures — fewer/longer bands, chosen as the
    largest divisor of n_hashes whose measured hottest bucket clears
    the cap — or refuses loudly in error mode. The rebanded index is
    rewritten in place with op-trail + fresh stats, and keeps
    answering probes."""
    from quasdb_spark.operators.dedup import (ensure_banded,
                                              load_dedup_index)
    from quasdb_spark.operators.quantizer import StaleIndexError

    # 40 docs: first half of every signature IDENTICAL (band 0 of a
    # 2-band split is one 40-row bucket), second half unique (the
    # full signature separates every doc)
    rows = [(i, ["A", "B", "C", "D",
                 f"u{i}", f"v{i}", f"w{i}", f"x{i}"])
            for i in range(40)]
    path, meta = _handmade_index(spark, tmp_path, "hot", rows, 2)
    idx = spark.read.parquet(path)

    with pytest.raises(StaleIndexError, match="SHAPE-BROKEN"):
        ensure_banded(idx, meta, mode="error", max_bucket_rows=10)

    t = ensure_banded(idx, meta, mode="auto", max_bucket_rows=10)
    assert t["rebanded"] is True
    assert t["meta"]["n_bands"] == 1       # full-sig keys separate all
    assert t["meta"]["rebanded_from"] == 2
    assert "reband" in t["meta"]["ops"]
    assert t["stats"]["max_bucket"] <= 10
    # persisted: a fresh load sees the new banding + recorded stats
    idx2, m2 = load_dedup_index(spark, path)
    assert m2["n_bands"] == 1 and m2["bucket_stats"] == t["stats"]
    assert idx2.count() == 40              # one band x 40 docs
    # and the rebanded index is now healthy (memoized free verdict)
    t2 = ensure_banded(idx2, m2, max_bucket_rows=10)
    assert t2["rebanded"] is False


def test_ensure_banded_true_dup_mass_refuses(spark, tmp_path):
    """Identical signatures are true duplicate content: even banding
    the full signature as one key leaves the bucket hot — no
    re-banding separates them, so ensure_banded refuses in EVERY mode
    and says the fix is deduplicating the corpus."""
    from quasdb_spark.operators.dedup import ensure_banded
    from quasdb_spark.operators.quantizer import StaleIndexError

    rows = [(i, ["A", "B", "C", "D", "E", "F", "G", "H"])
            for i in range(30)]
    path, meta = _handmade_index(spark, tmp_path, "dupmass", rows, 2)
    idx = spark.read.parquet(path)
    with pytest.raises(StaleIndexError, match="duplicate"):
        ensure_banded(idx, meta, mode="auto", max_bucket_rows=10)


def test_check_against_index_fires_maintenance_tick(spark, tmp_path):
    """The probe path IS the maintenance trigger (the maybe_compact
    discipline): check_against_index on a shape-broken index re-bands
    it before probing, and the probe still answers — with the same
    true matches the unmaintained index returns for high-similarity
    pairs."""
    import json

    from quasdb_spark.operators.dedup import (build_dedup_index,
                                              check_against_index,
                                              load_dedup_index)

    base = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen seventeen")
    docs = spark.createDataFrame(
        [(i, base + f" tail{i} extra{i * 3} word{i * 7}")
         for i in range(20)],
        "doc_id long, text string")
    path = str(tmp_path / "probe")
    build_dedup_index(docs, path, n_bands=2)
    idx, meta = load_dedup_index(spark, path)
    hot = meta["bucket_stats"]["max_bucket"]
    assert hot > 1  # the shared prefix makes band buckets collide
    # the probe is an EXACT copy of doc 3 — identical signature, so
    # it collides under ANY banding (re-banding prunes only
    # lower-similarity candidates)
    new = spark.createDataFrame(
        [(100, base + " tail3 extra9 word21")],
        "doc_id long, text string")
    before = {(r["new_id"], r["match_id"]) for r in
              check_against_index(new, idx, meta, min_est_jaccard=0.5,
                                  maintenance="off").collect()}
    # probe with a cap below the hottest bucket: the tick re-bands
    got = {(r["new_id"], r["match_id"]) for r in
           check_against_index(new, idx, meta, min_est_jaccard=0.5,
                               max_bucket_rows=hot - 1).collect()}
    m2 = json.loads(open(f"{path}/_dedup_index_meta.json").read())
    assert "reband" in m2["ops"]
    assert m2["n_bands"] < meta["n_bands"]
    assert got <= before and (100, 3) in got


def test_append_invalidates_stats_and_fires_tick(spark, tmp_path):
    """append_to_index records itself in the op-trail, drops the
    recorded bucket stats (the shape changed), and fires the health
    tick — the next sidecar carries FRESH stats covering the appended
    entries."""
    import json

    from quasdb_spark.operators.dedup import (append_to_index,
                                              build_dedup_index)

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i} tail {i * 11} "
             f"words {i * 5} here") for i in range(10)],
        "doc_id long, text string")
    path = str(tmp_path / "appendtick")
    meta = build_dedup_index(docs, path, n_bands=2)
    n0 = meta["bucket_stats"]["n_entries"]
    more = spark.createDataFrame(
        [(100 + i, f"totally different text number {i} about spark "
                   f"partitions and shuffles {i * 17}")
         for i in range(5)],
        "doc_id long, text string")
    append_to_index(more, path)
    m2 = json.loads(open(f"{path}/_dedup_index_meta.json").read())
    assert "append" in m2["ops"]
    assert m2["bucket_stats"]["n_entries"] > n0  # re-measured fresh
