"""PII scan, tf-idf, and decontamination on planted inputs (the suite
oracle checks these on the synthetic corpus; here we prove the
detectors actually detect)."""

import pyspark.sql.functions as F

from quasdb_spark.functions.text import pii_scan, tfidf_topk
from quasdb_spark.operators.dedup import ngram_overlap


def test_pii_scan_detects_planted_patterns(spark):
    rows = [
        (1, "contact me at alice.smith+work@example.co.uk for details"),
        (2, "see https://example.com/path?q=1 and http://a.b"),
        (3, "server at 192.168.001.001 responded"),
        (4, "card 4111111111111111 leaked"),
        (5, "perfectly clean prose with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["pii_flagged"]
    assert got[2]["n_url"] == 2 and got[2]["pii_flagged"]
    assert got[3]["n_ipv4"] == 1 and got[3]["pii_flagged"]
    assert got[4]["n_long_digits"] == 1 and got[4]["pii_flagged"]
    assert not got[5]["pii_flagged"]
    assert got[5]["n_email"] == got[5]["n_url"] == 0


def test_tfidf_ranks_distinctive_terms_first(spark):
    # 'zebra' appears only in doc 1; 'common' appears everywhere ->
    # idf('common') = ln(1) = 0, so it can never outrank 'zebra'.
    rows = [
        (1, "common zebra common zebra zebra"),
        (2, "common words only common"),
        (3, "common filler common filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = tfidf_topk(df, k=2).collect()
    doc1 = [r for r in top if r["doc_id"] == 1]
    assert doc1[0]["term"] == "zebra" and doc1[0]["rank"] == 1
    assert doc1[0]["tf"] == 3
    common = [r for r in top if r["term"] == "common"]
    assert all(r["score"] == 0.0 for r in common)


def test_ngram_overlap_finds_planted_contamination(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    corpus = spark.createDataFrame([
        (1, "intro text then the quick brown fox appears verbatim here"),
        (2, "completely unrelated sentence about databases and sparks"),
        (3, "too short"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_overlap(corpus, bench).collect()}
    # doc 1 shares 'the quick brown' and 'quick brown fox'
    assert got[1]["n_overlap"] == 2
    assert 0 < got[1]["overlap_frac"] <= 1.0
    assert 2 not in got and 3 not in got  # clean docs are not emitted


def test_repetition_stats_flags_repetitive_docs(spark):
    from quasdb_spark.functions.text import repetition_stats

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "each word here appears exactly once in this sentence"),
        (3, "ab cd ab cd ab cd ab cd"),  # repeated bigrams, mixed tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["rep_flagged"] and got[1]["top_tok_frac"] == 1.0
    assert got[1]["ttr"] == 0.1 and got[1]["dup_bigram_frac"] == round(1 - 1 / 9, 4)
    assert not got[2]["rep_flagged"] and got[2]["ttr"] == 1.0
    assert got[3]["rep_flagged"]  # dup bigrams dominate
    assert got[3]["dup_bigram_frac"] == round(1 - 2 / 7, 4)


def test_bpe_token_count_matches_hand_segmentation(spark):
    from quasdb_spark.functions.text import bpe_token_count

    rows = [
        # "don't stop" -> don | 't | _stop            = 3
        (1, "don't stop"),
        # "we'll pay $42.50 now!" ->
        #   we | 'll | _pay | _$ | 42 | . | 50 | _now | !   = 9
        (2, "we'll pay $42.50 now!"),
        # "abc123" -> abc | 123                        = 2
        (3, "abc123"),
        (4, "   spaced   out   "),  # ws collapse: 2 word tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", bpe_token_count("text").alias("n")).collect()}
    assert got == {1: 3, 2: 9, 3: 2, 4: 2}


def test_fixed_size_sample_exact_k_and_plan(spark):
    from quasdb_spark.operators.packing import fixed_size_sample
    from quasdb_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    # stratified: exactly k per stratum, deterministic across calls
    s1 = fixed_size_sample(d, "doc_id", 7, stratum_col="lang")
    per = {r["lang"]: r["n"] for r in
           s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 7 for n in per.values())
    assert sorted(r["doc_id"] for r in s1.collect()) \
        == sorted(r["doc_id"] for r in
                  fixed_size_sample(d, "doc_id", 7,
                                    stratum_col="lang").collect())
    # unstratified: exactly k, planned as a distributed partial top-k
    # (TakeOrderedAndProject), never a single-partition global sort
    s2 = fixed_size_sample(d, "doc_id", 13)
    plan = s2._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert s2.count() == 13


def test_bpe_regex_java_re2_equivalence_randomized(spark):
    """The BPE pre-tokenizer pattern must count identically under
    Java regex (Spark) and RE2 (DuckDB) — this is the cross-engine
    contract the oracle relies on. Randomized printable-ASCII inputs.
    (Known, documented divergence outside this alphabet: Java's \\s
    includes \\x0B, RE2's does not.)"""
    import random
    import duckdb

    from quasdb_spark.functions.text import BPE_TOKEN_RE, bpe_token_count

    rng = random.Random(13)
    alpha = ("abc xyz 019 .,!? '$%&- " * 3) + "don't we'll it's 42.50"
    rows = [(i, "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(0, 80))))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in
           df.select("id", bpe_token_count("text").alias("n")).collect()}

    con = duckdb.connect()
    pat = BPE_TOKEN_RE.replace("'", "''")
    want = {}
    for i, t in rows:
        want[i] = con.execute(
            f"SELECT len(regexp_extract_all(lower(trim(?)), '{pat}'))",
            [t]).fetchone()[0]
    assert got == want


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee: two docs sharing a token run of length
    >= window + k - 1 (= 6 here) must share at least one fingerprint;
    short docs get an empty set."""
    from quasdb_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = [
        (1, f"intro words here {shared} tail one"),
        (2, f"{shared} completely different ending text"),
        (3, "unrelated content with no overlap at all whatsoever"),
        (4, "too short"),  # < k+window-1 tokens -> empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: set(r["winnow_fps"]) for r in
           winnow_fingerprints(df).collect()}
    assert got[1] & got[2], "shared 6-token run must share a fingerprint"
    assert not (got[1] & got[3] & got[2])
    assert got[4] == set()
    # determinism across recomputation
    again = {r["doc_id"]: set(r["winnow_fps"]) for r in
             winnow_fingerprints(df).collect()}
    assert got == again


def test_weighted_sample_rate_extremes(spark):
    from quasdb_spark.operators.packing import weighted_sample
    from quasdb_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = d.count()
    assert weighted_sample(d, "doc_id", F.lit(0.0)).count() == 0
    assert weighted_sample(d, "doc_id", F.lit(1.0)).count() == n
    # monotone: higher rate keeps a superset
    lo = {r["doc_id"] for r in
          weighted_sample(d, "doc_id", F.lit(0.2)).select("doc_id").collect()}
    hi = {r["doc_id"] for r in
          weighted_sample(d, "doc_id", F.lit(0.6)).select("doc_id").collect()}
    assert lo <= hi and 0 < len(lo) < len(hi) < n


def test_pii_redact_replaces_and_scan_goes_clean(spark):
    """Redaction is the ACTION to pii_scan's signal: after pii_redact,
    re-scanning the redacted column must find NOTHING (the placeholder
    tokens contain no digits/@/scheme, so every detector goes quiet) —
    the closed-loop contract a privacy pass needs."""
    from quasdb_spark.functions.text import pii_redact

    rows = [
        (1, "contact me at alice.smith+work@example.co.uk for details"),
        (2, "see https://example.com/path?q=1 and http://a.b"),
        (3, "server at 192.168.001.001 responded"),
        (4, "card 4111111111111111 leaked"),
        (5, "perfectly clean prose with no identifiers at all"),
        (6, "mix: bob@x.io then https://user@example.com/a then 123456789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["redacted"] for r in pii_redact(df).collect()}
    assert "<EMAIL>" in got[1] and "@" not in got[1]
    assert got[2].count("<URL>") == 2 and "http" not in got[2]
    assert "<IPV4>" in got[3]
    assert "<LONG_DIGITS>" in got[4]
    assert got[5] == rows[4][1]  # clean text untouched
    # chain order: the email inside the URL is consumed first, then the
    # URL pattern swallows the remainder — deterministic policy
    assert "<EMAIL>" in got[6] and "<URL>" in got[6]

    rescanned = pii_scan(
        pii_redact(df).select("doc_id", F.col("redacted").alias("text")))
    assert all(not r["pii_flagged"] for r in rescanned.collect())


def test_pii_redact_java_re2_equivalence_randomized(spark):
    """The redacted BYTES must be identical under Java regex (Spark)
    and RE2 (DuckDB) — the contract text_pii_redact's oracle hash
    relies on. Randomized inputs seeded with partial/complete PII
    fragments to exercise boundary behavior of every pattern."""
    import random
    import duckdb

    from quasdb_spark.functions.text import PII_PATTERNS, pii_redact

    rng = random.Random(29)
    frags = ["bob", "@", "example", ".com", "https://", "http", "://",
             "a.b", " ", "192.168.", "1.1", "12345", "6789012345",
             "x%+-y", "_tag", "end.", "..", "w w", "€", "naïve"]
    rows = [(i, "".join(rng.choice(frags)
                        for _ in range(rng.randrange(0, 12))))
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["redacted"]
           for r in pii_redact(df).collect()}

    con = duckdb.connect()
    expr = "?"
    for name, pat in PII_PATTERNS.items():
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '<{name.upper()}>', 'g')"
    want = {}
    for i, t in rows:
        want[i] = con.execute(f"SELECT {expr}", [t]).fetchone()[0]
    assert got == want


def test_bm25_ranks_term_dense_docs_and_handles_misses(spark):
    """BM25: a doc dense in the query terms outranks a diluted one;
    absent terms contribute nothing; a query with no corpus hits
    returns an empty frame (not an error)."""
    from quasdb_spark.functions.text import bm25_search

    docs = spark.createDataFrame(
        [(1, "spark spark merge"),                      # dense, short
         (2, "spark " + "filler " * 40),                # 1 hit, long
         (3, "merge vector spark merge"),               # 3 distinct hits
         (4, "nothing relevant here at all")],
        "doc_id long, text string")
    out = bm25_search(docs, ["spark", "vector", "merge"], k=10).collect()
    ranked = [r["doc_id"] for r in out]
    assert 4 not in ranked                 # no hits -> not returned
    assert ranked[0] == 3                  # most distinct hits wins
    assert ranked.index(1) < ranked.index(2)  # dense beats diluted
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[3]["n_terms_hit"] == 3 and by_id[2]["n_terms_hit"] == 1
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))

    assert bm25_search(docs, ["zzz_absent"], k=5).count() == 0


def test_gopher_rules_planted_failures(spark):
    from quasdb_spark.functions.text import gopher_rules

    good = ("the data " + "pipeline processes tokens steadily " * 15
            + "with care and that should be enough of everything")
    rows = [
        (1, good),                                   # passes all rules
        (2, "too short to have fifty words"),        # word_count fails
        (3, "a b c " * 40 + "the of"),               # mean word len < 3
        (4, " ".join(["12345"] * 60) + " the of a"), # alpha fraction
        (5, good + " ###" * 15),                     # symbol ratio
        (6, "\n".join(["- bullet item the of"] * 10)),   # bullet lines
        (7, "\n".join(["trailing thought..."] * 10)
            + "\nthe of plain line"),                # ellipsis lines
        (8, " ".join(["word"] * 60)),                # no stop words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df, min_words=8).collect()}
    assert got[1]["gopher_pass"]
    assert not got[2]["word_count_ok"]
    assert not got[3]["mean_wl_ok"] and got[3]["word_count_ok"]
    assert not got[4]["alpha_ok"]
    assert not got[5]["symbol_ok"] and got[5]["alpha_ok"]
    assert not got[6]["bullet_ok"]
    assert not got[7]["ellipsis_ok"]
    assert not got[8]["stop_ok"]
    for i in range(2, 9):
        assert not got[i]["gopher_pass"]


def test_hash_split_partition_and_stability(spark):
    import pytest as _pytest

    from quasdb_spark.operators.packing import hash_split

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = hash_split(df, "doc_id",
                     splits={"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    # total partition: every row lands in exactly one split
    assert len(rows) == 500
    assert set(rows.values()) == {"train", "val", "test"}
    counts = {s: sum(1 for v in rows.values() if v == s)
              for s in ("train", "val", "test")}
    assert 350 <= counts["train"] <= 450  # ~400 expected
    # stability: the assignment of a SUBSET is identical — adding or
    # removing rows never moves existing ones
    sub = hash_split(df.where("doc_id < 100"), "doc_id",
                     splits={"train": 0.8, "val": 0.1, "test": 0.1})
    for r in sub.collect():
        assert rows[r["doc_id"]] == r["split"]
    # a different salt re-deals
    other = hash_split(df, "doc_id", salt="other",
                       splits={"train": 0.8, "val": 0.1, "test": 0.1})
    moved = sum(1 for r in other.collect() if rows[r["doc_id"]] != r["split"])
    assert moved > 50
    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", splits={"a": 0.5, "b": 0.2})


def test_chunk_by_tokens_boundaries_and_overlap(spark):
    """Chunk i covers tokens [i*stride, i*stride+max); consecutive
    chunks share exactly ``overlap`` tokens; short docs are one chunk;
    reassembling chunks with the overlap dropped recovers the doc."""
    from quasdb_spark.operators.packing import chunk_by_tokens

    words = [f"w{i}" for i in range(25)]
    rows = [(1, " ".join(words)),     # 25 tokens -> 3 chunks at 10/5
            (2, "short doc"),          # 2 tokens -> 1 chunk
            (3, " ".join(words[:10])), # exactly max_tokens -> 1 chunk
            (4, " ".join(words[:11]))] # one past max -> 2 chunks
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_by_tokens(df, "doc_id", "text", max_tokens=10, overlap=5)
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
           for r in out.collect()}

    # 25 tokens, stride 5 -> ceil((25-5)/5) = 4 chunks
    assert sorted(k[1] for k in got if k[0] == 1) == [0, 1, 2, 3]
    assert got[(1, 0)] == (" ".join(words[0:10]), 10)
    assert got[(1, 1)] == (" ".join(words[5:15]), 10)
    assert got[(1, 2)] == (" ".join(words[10:20]), 10)
    assert got[(1, 3)] == (" ".join(words[15:25]), 10)
    # consecutive chunks overlap by exactly 5 tokens
    assert got[(1, 0)][0].split()[5:] == got[(1, 1)][0].split()[:5]
    # short docs: single chunk, full text, true token count
    assert got[(2, 0)] == ("short doc", 2)
    assert sorted(k[1] for k in got if k[0] == 2) == [0]
    assert sorted(k[1] for k in got if k[0] == 3) == [0]
    assert got[(4, 1)] == (" ".join(words[5:11]), 6)
    # reassembly: chunk 0 + each later chunk minus its overlap prefix
    reassembled = got[(1, 0)][0].split()
    for i in (1, 2, 3):
        reassembled += got[(1, i)][0].split()[5:]
    assert reassembled == words


def test_chunk_by_tokens_rejects_bad_overlap(spark):
    from quasdb_spark.operators.packing import chunk_by_tokens
    import pytest

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_by_tokens(df, max_tokens=8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        chunk_by_tokens(df, max_tokens=8, overlap=-1)


def test_chunk_by_tokens_null_text_single_empty_chunk(spark):
    """NULL text behaves exactly like empty text: one chunk of the
    ''-token (n_tokens 1), never a phantom max_tokens-sized chunk
    (least/greatest skip NULLs, so this needs the explicit coalesce)."""
    from quasdb_spark.operators.packing import chunk_by_tokens

    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id: long, text: string")
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
           for r in chunk_by_tokens(df, max_tokens=10,
                                    overlap=5).collect()}
    assert got == {(1, 0): ("", 1), (2, 0): ("", 1)}


def test_lm_bigram_scores_small_corpus(spark):
    """Hand-checked add-one bigram LM: P(w2|w1) = (c+1)/(cw+V);
    ce = -(1/n) sum ln P. Low-perplexity (repetitive) docs land in
    'head', high-perplexity (novel-bigram) docs in 'tail'."""
    import math

    from quasdb_spark.functions.text import lm_bigram_scores

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c d")], "doc_id int, text string")
    # bigrams: d1 = ab,ba,ab,ba,ab; d2 = ab,bc,cd
    # counts: ab=4, ba=2, bc=1, cd=1; left: a=4, b=3, c=1; V=4
    p = {("a", "b"): 5 / 8, ("b", "a"): 3 / 7,
         ("b", "c"): 2 / 7, ("c", "d"): 2 / 5}
    lpm = {k: round(math.log(v) * 1e6) for k, v in p.items()}
    ce1 = -(3 * lpm[("a", "b")] + 2 * lpm[("b", "a")]) / 1e6 / 5
    ce2 = -(lpm[("a", "b")] + lpm[("b", "c")] + lpm[("c", "d")]) / 1e6 / 3
    got = {r.doc_id: r for r in lm_bigram_scores(
        df, head_cutoff=0.8, tail_cutoff=0.85).collect()}
    assert got[1].n_bigrams == 5 and got[2].n_bigrams == 3
    assert got[1].ce == round(ce1, 4) and got[2].ce == round(ce2, 4)
    assert got[1].bucket == "head" and got[2].bucket == "tail"


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    from quasdb_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "abab cd"), (2, "abab abab x")], "doc_id int, text string")
    # distinct words: abab (freq 3) -> pairs ab,ba,ab; cd (1) -> cd
    # counts: ab = 2*3 = 6, ba = 3, cd = 1; 'x' too short
    got = [(r.rank, r.pair, r.n) for r in bpe_pair_counts(df, k=10).collect()]
    assert got == [(1, "ab", 6), (2, "ba", 3), (3, "cd", 1)]


def test_domain_mix_weights_temperature(spark):
    """alpha=1 -> proportional; alpha=0.3 up-samples the small domain
    (oversample > 1) and down-samples the big one; weights sum to 1."""
    from quasdb_spark.functions.text import domain_mix_weights

    df = spark.createDataFrame(
        [(i, "w " * 99 + "w", "big") for i in range(9)]
        + [(100, "w " * 99 + "w", "small")],
        "doc_id int, text string, source string")
    prop = {r.domain: r for r in domain_mix_weights(df, alpha=1.0).collect()}
    assert prop["big"].weight == prop["big"].proportion == 0.9
    temp = {r.domain: r for r in domain_mix_weights(df, alpha=0.3).collect()}
    assert temp["small"].oversample > 1.0 > temp["big"].oversample
    assert abs(sum(r.weight for r in temp.values()) - 1.0) < 1e-5
    assert temp["big"].n_tokens == 900 and temp["small"].n_tokens == 100


def test_global_shuffle_is_deterministic_permutation(spark):
    """global_shuffle assigns every row exactly once, positions are
    contiguous 0..n-1 within each shard, the assignment is a pure
    function of (salt, id) (re-running gives identical rows), and a
    different salt gives a different permutation."""
    from quasdb_spark.operators.packing import global_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = global_shuffle(df, "doc_id", n_shards=4, salt="e0")
    rows = out.collect()
    assert len(rows) == 200
    assert {r.doc_id for r in rows} == set(range(200))  # no dup/loss
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))  # contiguous
    # balanced-ish by hashing: no shard owns more than half
    assert max(len(v) for v in by_shard.values()) < 100
    again = {(r.doc_id, r.shard, r.pos)
             for r in global_shuffle(df, "doc_id", n_shards=4,
                                     salt="e0").collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}
    other = {(r.doc_id, r.shard, r.pos)
             for r in global_shuffle(df, "doc_id", n_shards=4,
                                     salt="e1").collect()}
    assert other != again  # fresh permutation per epoch salt


def test_materialize_mixture_copies_and_guards(spark):
    """materialize_mixture: integer factors repeat exactly; a
    fractional factor resolves by the deterministic per-id hash draw
    (expected copies = factor, re-runs identical); NULL factors drop
    the domain entirely (not resurrected by the cap — the F.least
    NULL-skip trap); max_factor caps runaway domains."""
    from quasdb_spark.operators.packing import materialize_mixture

    df = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4]) for i in range(80)],
        "doc_id int, source string")
    fac = spark.createDataFrame(
        [("a", 2.0), ("b", 0.5), ("c", None), ("d", 500.0)],
        "domain string, oversample double")
    out = materialize_mixture(df, fac, max_factor=3.0).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.source, {}).setdefault(r.doc_id, []).append(r.copy)
    assert "c" not in by_dom  # NULL factor -> gone
    for copies in by_dom["a"].values():
        assert sorted(copies) == [0, 1]  # exactly 2, copy 0-based
    for copies in by_dom["d"].values():
        assert sorted(copies) == [0, 1, 2]  # capped at 3
    n_b = sum(len(v) for v in by_dom["b"].values())
    assert 0 < n_b < 20  # ~half of 20 docs kept, none duplicated
    assert all(v == [0] for v in by_dom["b"].values())
    again = sorted((r.doc_id, r.source, r.copy) for r in
                   materialize_mixture(df, fac, max_factor=3.0).collect())
    assert again == sorted((r.doc_id, r.source, r.copy) for r in out)


def test_materialize_mixture_missing_domain_raises(spark):
    """A domain entirely absent from factors must RAISE (a truncated
    factors table silently shrinking the epoch), while a NULL-factor
    domain is an explicit exclusion and stays silent."""
    import pytest

    from quasdb_spark.operators.packing import materialize_mixture

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "orphan")],
        "doc_id int, source string")
    fac = spark.createDataFrame(
        [("a", 2.0), ("b", None)], "domain string, oversample double")
    with pytest.raises(Exception, match="no row in factors"):
        materialize_mixture(df, fac).collect()
    ok = materialize_mixture(df.where("source != 'orphan'"), fac)
    assert {r.source for r in ok.collect()} == {"a"}


def test_pack_offset_in_pack_bounds_and_continuity(spark):
    """offset_in_pack = where the doc's first token lands inside its
    pack: always in [0, budget); doc i's offset equals the previous
    doc's offset + tokens whenever both land in the same pack; and a
    pack's first doc starts exactly at cum_before mod budget."""
    from quasdb_spark.operators.packing import pack_by_token_budget

    rows = [(i, 10 + (i * 7) % 23) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = sorted(pack_by_token_budget(df, "doc_id", "n_tokens", 64)
                 .select("doc_id", "n_tokens", "pack_id",
                         "offset_in_pack").collect(),
                 key=lambda r: r.doc_id)
    cum = 0
    for r in out:
        assert 0 <= r.offset_in_pack < 64
        assert r.pack_id == cum // 64
        assert r.offset_in_pack == cum - r.pack_id * 64
        cum += r.n_tokens


def test_importance_weights_prefers_target_like_docs(spark):
    """DSIR semantics on a planted corpus: a doc written entirely in
    the target domain's vocabulary outscores a mixed doc, which
    outscores a doc of purely off-target tokens (negative weight)."""
    from quasdb_spark.functions.text import importance_weights

    rows = [
        (1, "alpha beta gamma delta alpha beta", "en"),
        (2, "zulu yankee xray whiskey victor uniform", "de"),
        (3, "alpha zulu beta yankee", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in importance_weights(
        df, df.where(F.col("lang") == "en")).collect()}
    assert got[1].n_tokens == 6 and got[3].n_tokens == 4
    assert got[1].weight > got[3].weight > got[2].weight
    assert got[2].weight < 0


def test_bpe_train_known_merges(spark):
    """Full iterative BPE on the classic Sennrich-style corpus —
    merge table hand-computed: low x5, lower x2, newest x6,
    widest x3. Ties break count desc then (lhs, rhs) asc."""
    from quasdb_spark.functions.text import bpe_train

    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [(r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
           for r in bpe_train(df, n_merges=6).collect()]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
        (5, "e", "w", "ew", 6),
        (6, "ew", "est", "ewest", 6),
    ]
    # the batched trainer (one Spark job per ROUND) must be
    # bit-identical to the sequential reference — this corpus is
    # tie-heavy, so every batch degenerates to one merge, exercising
    # the barrier and next-count guards on each round
    seq = [(r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
           for r in bpe_train(df, n_merges=6, batched=False).collect()]
    assert got == seq


def test_bpe_train_stats_telemetry(spark):
    """The optional stats dict records per-round batch sizes that sum
    to the trained merge count — the instrumentation the Zipf scale
    study (tools/bpe_zipf_bench.py) reads."""
    from quasdb_spark.functions.text import bpe_train

    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    stats: dict = {}
    n = bpe_train(df, n_merges=6, stats=stats).count()
    assert n == 6
    assert stats["n_merges"] == 6
    assert stats["n_rounds"] == len(stats["batch_sizes"])
    assert sum(stats["batch_sizes"]) == 6


def test_bpe_train_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """With sc.setCheckpointDir configured (the cluster posture), the
    training loop uses RELIABLE checkpoints — localCheckpoint blocks
    die with their executor and, lineage being truncated, would kill
    the job on any executor loss. Same merges either way."""
    from quasdb_spark.functions.text import bpe_train

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    want = [(r.merge_rank, r.merged) for r in
            bpe_train(df, n_merges=6).collect()]
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        got = [(r.merge_rank, r.merged) for r in
               bpe_train(df, n_merges=6).collect()]
        # reliable checkpoint files actually landed in the dir
        import os
        assert any(files for _, _, files in
                   os.walk(str(tmp_path / "ckpt")))
    finally:
        # un-set for the rest of the shared session (no public API:
        # poke the Scala var back to None)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None))
    assert got == want
    assert sc.getCheckpointDir() is None


def test_bpe_train_batched_matches_sequential_randomized(spark):
    """Batched == sequential on randomized Zipf-ish corpora — the
    _bpe_select_batch exactness proof checked empirically end to end
    (distinct counts let real multi-merge batches form here, unlike
    the tie-heavy Sennrich corpus)."""
    import random

    from quasdb_spark.functions.text import bpe_train

    rng = random.Random(411)
    for trial in range(3):
        vocab = ["".join(rng.choice("abcdef")
                         for _ in range(rng.randint(2, 7)))
                 for _ in range(40)]
        corpus = " ".join(w for w in vocab
                          for _ in range(rng.randint(1, 30)))
        df = spark.createDataFrame([(1, corpus)],
                                   "doc_id long, text string")
        fast = [tuple(r) for r in
                bpe_train(df, n_merges=24).collect()]
        slow = [tuple(r) for r in
                bpe_train(df, n_merges=24, batched=False).collect()]
        assert fast == slow, f"trial {trial} diverged"


def test_bpe_train_batched_tie_and_collision_guards(spark):
    """The two adversarial shapes the batch rule must refuse to batch:
    (a) equal-count disjoint pairs where merging the first creates a
    pair that outranks the second by tie-break ('a z y' x n makes
    (az,y) beat (m,q) at count n); (b) a merge whose lhs+rhs string
    collides with an existing token, after which created counts ADD
    to the colliding token's pairs."""
    from quasdb_spark.functions.text import bpe_train

    # (a): pairs (a,z), (m,q), (z,y) all count 4; sequential merges
    # (a,z) then the CREATED (az,y), then (m,q)
    corpus_a = " ".join(["azy"] * 4 + ["mq"] * 4)
    df_a = spark.createDataFrame([(1, corpus_a)],
                                 "doc_id long, text string")
    fast = [tuple(r) for r in bpe_train(df_a, n_merges=3).collect()]
    slow = [tuple(r) for r in
            bpe_train(df_a, n_merges=3, batched=False).collect()]
    assert fast == slow
    assert [m[3] for m in fast] == ["az", "azy", "mq"]

    # (b): token "ab" exists (via words 'xaby'), and merging (a,b)
    # inside 'zab' adds occurrences to pairs around the existing
    # symbol — the collision guard must close the batch at (a,b)
    corpus_b = " ".join(["ab"] * 6 + ["zab"] * 5 + ["cd"] * 4)
    df_b = spark.createDataFrame([(1, corpus_b)],
                                 "doc_id long, text string")
    fast_b = [tuple(r) for r in bpe_train(df_b, n_merges=3).collect()]
    slow_b = [tuple(r) for r in
              bpe_train(df_b, n_merges=3, batched=False).collect()]
    assert fast_b == slow_b


def test_bpe_train_left_to_right_overlap(spark):
    """Overlapping occurrences merge LEFT TO RIGHT, non-overlapping —
    'aaaa' under (a,a) becomes (aa, aa), and the same pair re-merges
    the doubled symbol next round: the canonical BPE semantics the
    sentinel string-replace encodes."""
    from quasdb_spark.functions.text import bpe_train

    df = spark.createDataFrame([(1, "aaaa aaaa")],
                               "doc_id long, text string")
    got = [(r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
           for r in bpe_train(df, n_merges=3).collect()]
    # round 1: a-a appears 3x per word (weighted) = 6; merge -> aa,aa
    # round 2: aa-aa once per word = 2; merge -> aaaa
    # round 3: fully merged vocabulary -> early stop
    assert got == [(1, "a", "a", "aa", 6), (2, "aa", "aa", "aaaa", 2)]


def test_bpe_segment_applies_merge_table(spark):
    """Encode-time counterpart: segmenting an UNSEEN word with the
    trained merge table applies merges in rank order."""
    from quasdb_spark.functions.text import bpe_segment, bpe_train

    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
    w = spark.createDataFrame([("lowest",), ("newer",)], "w string")
    got = {r.w: r.segs for r in
           w.select("w", bpe_segment("w", merges).alias("segs"))
           .collect()}
    assert got["lowest"] == ["low", "est"]
    assert got["newer"] == ["n", "ew", "e", "r"]


def test_bpe_artifact_roundtrip(spark, tmp_path):
    """get_or_train_bpe trains at most once per (fingerprint, params):
    the loaded merge table is exactly the trained one (strings + exact
    ints round-trip JSON losslessly), and a different fingerprint or
    n_merges is a separate artifact."""
    from quasdb_spark.functions.text import get_or_train_bpe

    root = str(tmp_path / "artifacts")
    df = spark.createDataFrame(
        [(1, "low low low lower newest newest")],
        "doc_id long, text string")
    trained = get_or_train_bpe(df, fingerprint="bpe-fp", n_merges=3,
                               root=root, force=True)
    empty = spark.createDataFrame([], "doc_id long, text string")
    # drop the process-local cache so the load exercises the JSON
    # artifact itself, then: same key loads — the (empty) frame is
    # never scanned
    from quasdb_spark.operators import quantizer as QZ
    QZ.clear_cache()
    loaded = get_or_train_bpe(empty, fingerprint="bpe-fp", n_merges=3,
                              root=root)
    assert loaded == trained and len(trained) == 3
    # different n_merges = different artifact -> trains on the frame
    other = get_or_train_bpe(df, fingerprint="bpe-fp", n_merges=2,
                             root=root)
    assert other == trained[:2]


def test_bpe_segment_preserves_content_randomized(spark):
    """Property: for EVERY vocabulary word, concatenating its BPE
    segmentation reproduces the word exactly (merges only regroup,
    never alter content), and no emitted symbol is empty — over a
    seeded random corpus from a small alphabet (maximizes merge
    collisions, incl. runs like 'aaaa' that exercise the
    left-to-right overlap rule)."""
    import random

    from quasdb_spark.functions.text import bpe_segment, bpe_train

    rng = random.Random(7)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(2, 8)))
             for _ in range(60)]
    text = " ".join(rng.choice(words) for _ in range(400))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = [tuple(r) for r in bpe_train(df, n_merges=10).collect()]
    assert len(merges) >= 5  # the corpus is mergeable
    w = spark.createDataFrame([(x,) for x in sorted(set(words))],
                              "w string")
    rows = (w.select("w", bpe_segment("w", merges).alias("segs"))
            .collect())
    for r in rows:
        assert "".join(r.segs) == r.w, (r.w, r.segs)
        assert all(s for s in r.segs), (r.w, r.segs)
