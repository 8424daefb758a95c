"""Text-analysis functions for large-scale training-data pipelines.

No reference counterpart (SURVEY.md §2.7 — charter extension). All
implemented as built-in JVM expressions over the ``documents`` table
schema (doc_id, text, lang, source, n_chars): tokenization, stats,
quality scoring, language-ID heuristic, and content fingerprinting.
Everything is whole-stage-codegen friendly — no Python UDFs — so a
100 TB corpus scan is a single map-only pass (no shuffle at all until
an aggregate is requested).

Determinism contract: token rules use only ASCII whitespace/regex
semantics shared by Java and RE2 regex engines, and hashing is md5,
so DuckDB oracles reproduce results exactly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Chosen to be regex-free single tokens.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que"],
}


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokens of trimmed, lower-cased text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(text_col: str | Column = "text") -> Column:
    return F.size(tokens(text_col))


# GPT-2-style pre-tokenizer, restricted to the lookahead-free regex
# subset whose semantics are identical in Java (Spark) and RE2
# (DuckDB): contraction suffixes, optionally space-prefixed word and
# number runs, punctuation runs. (The published GPT-2 pattern adds a
# trailing-whitespace lookahead, which RE2 cannot express.)
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def bpe_token_count(text_col: str | Column = "text") -> Column:
    """Token count under a BPE-style pre-tokenizer regex — the standard
    proxy for LLM token budgets when the real vocabulary is not on the
    cluster. Map-only JVM expression (regexp_count), no Python."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(F.lower(F.trim(c)), F.lit(BPE_TOKEN_RE))


def stopword_hits(text_col: str | Column, lang: str) -> Column:
    """Number of tokens (non-distinct) that are stopwords of ``lang``."""
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text_col), lambda t: F.array_contains(lst, t)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: token count, char count, average token
    length, alphabetic-character ratio, punctuation ratio."""
    toks = tokens(text_col)
    n_char = F.length(F.col(text_col))
    n_alpha = n_char - F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z]", ""))
    n_punct = n_char - F.length(
        F.regexp_replace(F.col(text_col), "[.,;:!?'\"()]", ""))
    return (df
            .withColumn("n_tokens", F.size(toks))
            .withColumn("n_chars_computed", n_char)
            .withColumn("avg_token_len",
                        F.round(F.aggregate(toks, F.lit(0).cast("long"),
                                            lambda acc, t: acc + F.length(t))
                                .cast("double") / F.size(toks), 4))
            .withColumn("alpha_ratio",
                        F.round(n_alpha.cast("double") / n_char, 4))
            .withColumn("punct_ratio",
                        F.round(n_punct.cast("double") / n_char, 4)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: rewards alphabetic content and
    reasonable length, penalizes punctuation soup. The exact formula is
    arbitrary; what matters is it's cheap, deterministic, and monotone
    in the obvious signals (the shape used by C4/CCNet-style filters).
    """
    s = text_stats(df, text_col)
    score = (0.5 * F.col("alpha_ratio")
             + 0.3 * F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
             + 0.2 * (1.0 - F.least(F.lit(1.0), 5.0 * F.col("punct_ratio"))))
    # round to 5: the score grid has exactly 5 decimals, so 4 would
    # sit on rounding midpoints and diverge across engines
    return s.withColumn("quality_score", F.round(score, 5))


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID. Emits per-language hit counts and the
    argmax guess ('und' when no stopwords hit at all). Deterministic
    tie-break: higher count wins, then lexicographic language code."""
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", stopword_hits(text_col, lang))
    # argmax via max_by over a (count, lang) struct: count desc, then
    # lang asc — encode lang ascending by comparing on (count, negated
    # rank) … simplest deterministic form: greatest of structs with
    # inverted lexicographic tiebreak is messy, so do explicit CASE.
    langs = sorted(STOPWORDS)  # tie falls to the first in this order
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in langs:
        c = F.col(f"hits_{lang}")
        better = c > best_hits
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_hits = F.when(better, c).otherwise(best_hits)
    return out.withColumn("lang_guess", best)


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set —
    invariant to token order and repetition (bag-of-words identity)."""
    toks = F.array_sort(F.array_distinct(tokens(text_col)))
    return df.withColumn(out_col, F.md5(F.concat_ws(" ", toks)))


def exact_fingerprint(text_col: str | Column = "text") -> Column:
    """md5 of whitespace-normalized lower-cased text — exact-dup key."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


# Portable regexes (same semantics in Java regex and DuckDB RE2) for
# the PII/safety scan. Counting is non-overlapping left-to-right in
# both engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "long_digits": r"\d{9,}",
}


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII/safety signal counts (emails, URLs, IPv4s, long
    digit runs) + an any-hit flag — the pre-filter shape of a
    training-data privacy pass. Map-only regexp_count expressions,
    whole-stage codegen; a 100 TB scan is one pass, no shuffle.
    """
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    flag = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("pii_flagged", flag)


def pii_redact(df: DataFrame, text_col: str = "text", *,
               patterns: dict[str, str] | None = None,
               out_col: str = "redacted") -> DataFrame:
    """The ACTION to pii_scan's signal: replace every PII span with a
    typed placeholder (``<EMAIL>``, ``<URL>``, ...) — the transform a
    training-data privacy pass actually applies before tokenization.
    Patterns are applied as a chained ``regexp_replace`` in dict order
    (order matters when patterns overlap: emails inside URLs are
    consumed by whichever pattern runs first — the order IS the
    policy, so it is deterministic and mirrorable by a SQL oracle).

    Scale shape: map-only expression chain, whole-stage codegen, no
    shuffle — a 100 TB redaction pass is one scan + rewrite.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    red = F.col(text_col)
    for name, pat in pats.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.withColumn(out_col, red)


def tfidf_topk(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf
    (idf = ln(n_docs / doc_freq), score rounded to 4 before ranking so
    cross-engine float ulps can't flip the order; ties break on term).

    Scale shape: explode → two hash aggregates (term counts, doc
    freqs) + a broadcast scalar for n_docs; ranking is a per-doc window
    over each doc's distinct terms only.
    """
    toks = (df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term")))
    tc = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    nd = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (tc.join(dfreq, "term")
                .crossJoin(F.broadcast(nd))
                .withColumn("score", F.round(
                    F.col("tf") * F.log(F.col("n_docs").cast("double")
                                        / F.col("doc_freq")), 4)))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(id_col, "rank", "term", "tf",
                          (F.col("score") + F.lit(0.0)).alias("score")))


def bm25_search(df: DataFrame, query_terms: list[str], *,
                id_col: str = "doc_id", text_col: str = "text",
                k: int = 10, k1: float = 1.2, b: float = 0.75,
                _release_to: list | None = None) -> DataFrame:
    """Rank documents against a bag-of-terms query by Okapi BM25
    (Lucene idf variant: ln((N - df + 0.5)/(df + 0.5) + 1)).

    Scale shape (r15: ONE corpus scan+tokenize): ONE projection
    computes the per-doc length (size of tokens, map-side) AND the
    term-filtered token array — the in-row array filter runs BEFORE
    the explode, so only matching tokens ever become rows (the
    corpus-wide explode of every token is gone). The tf aggregate
    carries dl with it (dl is functionally dependent on the doc key),
    which removes the all-docs dl join — previously the only
    corpus-sized exchange. Doc-freq is one tiny aggregate over the tf
    table; corpus stats (N, avgdl) broadcast as a scalar. Ranking is
    top-k over per-doc sums. Shuffled bytes scale with MATCHING
    tokens only.

    The narrow per-doc frame (id, dl, filtered tokens — bytes per doc,
    not the text) is persisted so its two consumers (corpus stats and
    tf) share one scan+tokenize, and the tf table (docs-with-a-match x
    terms, tiny) is persisted so dfreq and the scoring join share one
    explode+aggregate: 3 full corpus scans -> 1 (guide §1.2 remove
    passes, §5 reuse-beats-recompute; at 100 TB the two dropped passes
    ARE the query). Callers that compose further can pass
    ``_release_to`` to own the unpersist (near_dup_pairs convention).

    Determinism: each per-term partial score is rounded to integer
    MICROS before the per-doc sum — integer sums are order-free, so
    the final score is engine-identical; ranking rounds to 4 with
    doc_id tiebreak (same contract as tfidf_topk). tf/dl/n_docs/avgdl
    values are unchanged — only where they are computed moved.
    """
    # one scan: dl (map-side size) + the term-filtered token array.
    # Codegen subexpression-eliminates the shared tokens() call.
    base = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("dl"),
        F.filter(tokens(text_col),
                 lambda t: t.isin(*query_terms)).alias("_ft")).persist()
    if _release_to is not None:
        _release_to.append(base)
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    tf = (base.select(F.col(id_col), "dl",
                      F.explode("_ft").alias("term"))
              .groupBy(id_col, "term")
              .agg(F.count(F.lit(1)).alias("tf"),
                   F.min("dl").alias("dl"))  # dl constant per doc
          ).persist()
    if _release_to is not None:
        _release_to.append(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    idf = F.log((F.col("n_docs") - F.col("doc_freq") + 0.5)
                / (F.col("doc_freq") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    term_micros = F.round(idf * tf_part * 1e6).cast("long")
    per_doc = (tf.join(F.broadcast(dfreq), "term")
                 .crossJoin(F.broadcast(stats))
                 .groupBy(id_col)
                 .agg(F.sum(term_micros).alias("_micros"),
                      F.count(F.lit(1)).alias("n_terms_hit")))
    score = F.round(F.col("_micros") / 1e6, 4) + F.lit(0.0)
    # top-k FIRST (TakeOrderedAndProject — distributed partial top-k,
    # no global sort); the rank window then runs over k rows only
    topk = (per_doc.withColumn("score", score)
                   .orderBy(F.col("score").desc(), F.col(id_col).asc())
                   .limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (topk.withColumn("rank", F.row_number().over(w))
                .select(id_col, "rank", "score", "n_terms_hit"))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", *,
                     top_frac_max: float = 0.2,
                     dup_bigram_max: float = 0.3) -> DataFrame:
    """Gopher-style repetition filters: type-token ratio, most-common-
    token dominance, duplicate-bigram fraction, and the combined flag
    (the published repetition-removal signals from Gopher/MassiveText,
    restated over tokens since this corpus is single-line).

    Scale shape: top-token dominance goes through explode + two hash
    aggregates (map-side combine; never a per-row O(distinct×tokens)
    nested loop); the bigram and TTR signals are map-only array
    expressions. One shuffle total, keyed by doc.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
    per_tok = toks.groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    dom = per_tok.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_c").alias("_top"))
    bi = ngrams(text_col, 2)
    bigram_stats = df.select(
        F.col(id_col),
        F.size(bi).alias("_nb"),
        F.size(F.array_distinct(bi)).alias("_ndb"))
    out = (dom.join(bigram_stats, id_col)
           .withColumn("ttr", F.round(F.col("n_distinct").cast("double")
                                      / F.col("n_tokens"), 4))
           .withColumn("top_tok_frac",
                       F.round(F.col("_top").cast("double")
                               / F.col("n_tokens"), 4))
           .withColumn("dup_bigram_frac", F.when(
               F.col("_nb") > 0,
               F.round(1.0 - F.col("_ndb").cast("double") / F.col("_nb"), 4))
               .otherwise(F.lit(0.0))))
    return (out.withColumn(
        "rep_flagged", (F.col("top_tok_frac") > top_frac_max)
        | (F.col("dup_bigram_frac") > dup_bigram_max))
        .select(id_col, "n_tokens", "n_distinct", "ttr", "top_tok_frac",
                "dup_bigram_frac", "rep_flagged"))


def winnow_fingerprints(df: DataFrame, text_col: str = "text", *,
                        k: int = 3, window: int = 4,
                        out_col: str = "winnow_fps") -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the
    rolling-hash document fingerprinting used by MOSS): hash every
    token ``k``-gram, then keep the MINIMUM hash of each sliding
    window of ``window`` consecutive gram hashes. Guarantees every
    match of length >= window+k-1 tokens shares a fingerprint, while
    storing ~1/window of the grams.

    Declarative realization: the classic algorithm computes gram
    hashes incrementally ("rolling"); in a vectorized engine the SAME
    fingerprint set comes from array expressions — positions →
    md5-derived 32-bit gram hashes → per-window array_min → distinct.
    Map-only, exact integers, so a DuckDB oracle reproduces it
    bit-for-bit. The gram-hash array is materialized in its own
    projection so each window min SLICES it instead of re-deriving it
    (inlining would make the expression O(grams x windows) md5 calls).
    Adds ``out_col``: sorted ARRAY<BIGINT>, empty when the doc is
    shorter than k+window-1 tokens.
    """
    w = tokens(text_col)
    n_grams = F.size(w) - (k - 1)

    def _positions(upper):
        # ascending 1..upper that is safely EMPTY when upper < 1
        # (sequence(1, 0) would DESCEND, and ANSI element_at would
        # then fault on position 0 — filter first, transform after)
        return F.filter(F.sequence(F.lit(1), F.greatest(upper, F.lit(1))),
                        lambda i: i <= upper)

    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + off) for off in range(k)])
    hashes = F.transform(
        _positions(n_grams),
        lambda i: F.conv(F.substring(F.md5(gram(i)), 1, 8), 16, 10)
        .cast("long"))
    staged = df.withColumn("_gram_hashes", hashes)
    gh = F.col("_gram_hashes")
    mins = F.transform(
        _positions(F.size(gh) - (window - 1)),
        lambda j: F.array_min(F.slice(gh, j, window)))
    return (staged
            .withColumn(out_col, F.array_sort(F.array_distinct(mins)))
            .drop("_gram_hashes"))


def ngrams(text_col: str | Column = "text", n: int = 2) -> Column:
    """Non-distinct word n-grams (occurrence counting, unlike
    dedup.shingles which is a distinct set)."""
    w = tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]))
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>"))


# Gopher / MassiveText document-quality rules (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Table A1). The published
# stop-word list for the "has >= 2 stop words" rule:
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]


def gopher_rules(df: DataFrame, text_col: str = "text", *,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_wl: int = 3, max_mean_wl: int = 10,
                 stopwords: list[str] | None = None,
                 min_stop_hits: int = 2) -> DataFrame:
    """Per-document Gopher quality-rule flags plus the combined
    ``gopher_pass`` verdict.

    Every rule is a map-only JVM expression (regexp_count / length),
    so a 100 TB corpus is one codegen'd scan — no shuffle, no Python.
    Ratio thresholds are evaluated as EXACT integer cross-products
    (e.g. mean word length in [3,10] <=> 3*n_words <= n_chars <=
    10*n_words), so boundary documents land on the same side in any
    engine — the same determinism contract as the rest of this module.

    Rules (doc-level; line-level Gopher rules need newline-structured
    text and are expressed over lines when present):
      - word_count_ok: min_words <= #words <= max_words
      - mean_wl_ok:    mean word length in [min_mean_wl, max_mean_wl]
      - alpha_ok:      >= 80% of words contain an alphabetic char
      - symbol_ok:     (# of '#' or '...' symbols) < 10% of words
      - bullet_ok:     < 90% of lines start with a bullet (- or *)
      - ellipsis_ok:   < 30% of lines end with '...'
      - stop_ok:       >= min_stop_hits distinct stop words appear
    """
    t = F.col(text_col)
    stop = GOPHER_STOPWORDS if stopwords is None else stopwords
    n_words = F.regexp_count(t, F.lit(r"\S+"))
    n_chars = F.length(F.regexp_replace(t, r"\s", ""))
    alpha_words = F.regexp_count(t, F.lit(r"\S*[A-Za-z]\S*"))
    symbols = F.regexp_count(t, F.lit(r"#|\.\.\."))
    n_lines = F.lit(1) + F.regexp_count(t, F.lit(r"\n"))
    bullet_lines = F.regexp_count(t, F.lit(r"(?m)^[ \t]*[-*]"))
    ellipsis_lines = F.regexp_count(t, F.lit(r"(?m)\.\.\.[ \t]*$"))
    stop_hits = sum(
        (F.regexp_count(F.lower(t),
                        F.lit(rf"\b{re.escape(w)}\b")) > 0).cast("int")
        for w in stop)
    flags = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_wl_ok": ((n_chars >= min_mean_wl * n_words)
                       & (n_chars <= max_mean_wl * n_words)),
        "alpha_ok": alpha_words * 10 >= n_words * 8,
        "symbol_ok": symbols * 10 < n_words,
        "bullet_ok": bullet_lines * 10 < n_lines * 9,
        "ellipsis_ok": ellipsis_lines * 10 < n_lines * 3,
        "stop_ok": stop_hits >= min_stop_hits,
    }
    out = df.withColumn("n_words", n_words)
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    combined = None
    for name in flags:
        c = F.col(name)
        combined = c if combined is None else (combined & c)
    return out.withColumn("gopher_pass", combined)


def lm_bigram_scores(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", *,
                     head_cutoff: float, tail_cutoff: float) -> DataFrame:
    """Corpus-trained bigram-LM cross-entropy per document, with
    CCNet-style head/middle/tail quality buckets — the perplexity
    filter every large crawl pipeline runs (CCNet, Gopher, RefinedWeb
    all bucket by LM score; the LM here is the corpus's own add-one-
    smoothed bigram model, so no external artifact is needed).

    Per doc: ce = -(1/n) * sum ln P(w2|w1) over its n adjacent token
    bigrams, with P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V) (add-one over
    vocabulary size V). Buckets are ABSOLUTE cutoffs (``head_cutoff``,
    ``tail_cutoff``), the production CCNet shape: thresholds come from
    a calibration pass / cutoff file, so scoring stays a pure
    map+join — a corpus-relative ntile would funnel every row through
    one window task at 100 TB.

    Scale shape: bigram extraction is map-only (zip of two array
    slices, in-row); the model is two hash aggregates (map-side
    combine, shuffle ~ distinct bigrams); scoring is one equi-join of
    doc bigrams against the model keyed by (w1,w2) — Zipf-skewed keys,
    so AQE skew-join (or splitting the top-K bigrams into a broadcast
    map-join) is the 100 TB mitigation — then a per-doc sum.

    Determinism: per-bigram ln() is rounded to integer MICROS before
    the per-doc sum (order-free integer adds, the bm25_search
    contract), so Spark and a SQL oracle agree bit-for-bit.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_w"))
    n = F.size("_w")
    # the bigram frame feeds BOTH the model aggregates and the scoring
    # join — persist it so tokenization + the pair explode run once
    # (the near_dup_pairs shingle-cache rationale; the cached rows are
    # (id, w1, w2), ~the corpus token volume, spilling to disk).
    # r16 NOTE (VERDICT r15 #9, measured this round): the
    # cache-the-token-ARRAYS variant (persist (id, _w), derive bigrams
    # AND vocab from it — one tokenize pass, half the cached bytes) was
    # implemented, oracle-verified and A/B'd solo at sf0.1: 0.87-0.93 s
    # warm (this shape) vs 1.37-1.63 s warm (variant) — replaying the
    # zip_with+explode from cached arrays in all three consumers costs
    # more than the one regex-tokenize pass it saves, locally AND in
    # the 100 TB model (the explode is pure CPU per consumer, ~2x the
    # bigram volume per replay; the saved pass is one map-only read of
    # already-columnar text). Reverted; measurement recorded in
    # OPTIMIZATION_r16.md.
    pairs = (base.where(n >= 2)
             .select(id_col, F.explode(F.zip_with(
                 F.slice("_w", 1, n - 1), F.slice("_w", 2, n - 1),
                 lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))))
                 .alias("_p"))
             .select(id_col, "_p.w1", "_p.w2")
             .persist())
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c"))
    cl = cb.groupBy("w1").agg(F.sum("_c").alias("_cw"))
    vocab = (base.select(F.explode("_w").alias("_t"))
             .agg(F.countDistinct("_t").alias("_v")))
    lp = (cb.join(cl, "w1").crossJoin(F.broadcast(vocab))
          .select("w1", "w2",
                  F.round(F.log((F.col("_c") + 1.0)
                                / (F.col("_cw") + F.col("_v"))) * 1e6)
                  .cast("long").alias("_lpm")))
    per_doc = (pairs.join(lp, ["w1", "w2"])
               .groupBy(id_col)
               .agg(F.sum("_lpm").alias("_s"),
                    F.count(F.lit(1)).alias("n_bigrams")))
    ce = F.round(-F.col("_s") / 1e6 / F.col("n_bigrams"), 4) + F.lit(0.0)
    return (per_doc.withColumn("ce", ce)
            .withColumn("bucket",
                        F.when(F.col("ce") < head_cutoff, "head")
                         .when(F.col("ce") > tail_cutoff, "tail")
                         .otherwise("middle"))
            .select(id_col, "n_bigrams", "ce", "bucket"))


def bpe_pair_counts(df: DataFrame, text_col: str = "text", *,
                    k: int = 50) -> DataFrame:
    """Top-k adjacent CHARACTER-pair counts over the corpus — the
    first candidate-merge table of byte-pair-encoding tokenizer
    training (Sennrich et al.: repeatedly merge the most frequent
    adjacent symbol pair; this materializes round one's counts, the
    piece a tokenizer-training pipeline fans out over the corpus).

    Scale shape: corpus text never feeds the pair explode directly —
    words are first collapsed to a DISTINCT-word frequency table
    (hash aggregate, map-side combine; vocabulary grows sublinearly
    in corpus size), then each distinct word explodes its len-1
    adjacent pairs weighted by its frequency, and the pair aggregate +
    TakeOrdered top-k finish the job. Pairs are 2-char substrings
    (no char-array split), identical in Spark and SQL.
    """
    words = (df.select(F.explode(tokens(text_col)).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .where(F.length("w") >= 2))
    pairs = (words.select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        F.col("w"))
        .select(F.substring(F.col("w"), F.col("i"), 2).alias("pair"),
                "freq"))
    top = (pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
           .orderBy(F.col("n").desc(), F.col("pair").asc())
           .limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "pair", "n"))


# Symbol-boundary sentinel for BPE training: every symbol of a word's
# current segmentation is stored as <SEP>sym<SEP>, so applying merge
# (a, b) -> ab is ONE engine-native string replace of
# <SEP>a<SEP><SEP>b<SEP> with <SEP>ab<SEP> — and because replace() is
# left-to-right non-overlapping in both the JVM and DuckDB, it IS the
# canonical BPE merge semantics ("aaa" + (a,a) -> (aa, a)). The double
# sentinel between symbols keeps a match from consuming the boundary
# the next candidate pair needs ("a a a a" merges to (aa, aa), not
# (aa, a, a)).
BPE_SEP = "\x1f"


def _bpe_select_batch(cands: list, known_syms: set[str],
                      max_take: int) -> list:
    """Greedy prefix of ranked pair candidates that is PROVABLY what
    sequential BPE would pick in consecutive rounds — the exactness
    argument behind ``bpe_train(batched=True)``:

    Process candidates in global rank order (count desc, lhs asc,
    rhs asc). Keep a symbol set S of every chosen merge's {lhs, rhs,
    merged} and a barrier B = max count seen among candidates skipped
    for overlapping S. A candidate c is appended iff

      (1) c shares no symbol with S — applying the chosen merges can
          neither create nor destroy an occurrence of c, so c's count
          (and its own round's count) is exactly its round-start count;
      (2) c.count > B — every pair a chosen merge CAN affect overlaps
          S: pairs it destroys share a raw symbol, pairs it creates
          are bounded by an overlapping source pair ((x, ab) arises
          only from contexts x·a·b, each an occurrence of (x, a)).
          Sources ranked above c were processed and skipped into B,
          so no affected pair can reach c's count...
      (3) ...unless the source ranks BELOW c with an EQUAL count —
          invisible to B. So c's count must be strictly greater than
          the next ranked candidate's (ties park at a round boundary,
          where a fresh count makes the comparison real);
      (4) the merged string must be a NEW symbol: if lhs+rhs collides
          with an existing token, post-merge counts ADD to that
          token's existing pair counts and the static bounds above no
          longer hold — the colliding merge closes the batch.

    The first failing candidate ENDS the batch (a disjoint pair we
    skipped would outrank a later chosen one at its sequential round);
    rank 1 is always safe (it IS the sequential pick). Candidates are
    Rows with fields lhs/rhs/n, already in rank order."""
    chosen: list = []
    syms: set[str] = set()
    barrier = -1
    for i, c in enumerate(cands):
        if len(chosen) >= max_take:
            break
        if c.lhs in syms or c.rhs in syms:
            barrier = max(barrier, c.n)
            continue
        if chosen:
            nxt = cands[i + 1] if i + 1 < len(cands) else None
            if c.n <= barrier or nxt is None or c.n <= nxt.n:
                break
        merged = c.lhs + c.rhs
        chosen.append(c)
        syms |= {c.lhs, c.rhs, merged}
        if merged in known_syms:
            break
        known_syms.add(merged)
    return chosen


def _bpe_checkpoint(df: DataFrame) -> DataFrame:
    """Lineage-truncating checkpoint for the BPE training loop.
    RELIABLE ``checkpoint()`` when the SparkContext has a checkpoint
    dir configured — localCheckpoint blocks are stored non-reliably
    on executors, so with lineage truncated a single executor loss
    (spot nodes, dynamic allocation) would kill the whole training
    job on a real cluster. Falls back to ``localCheckpoint`` when no
    dir is set (local mode: the only JVM IS the driver, nothing to
    survive). Superseded checkpoint FILES are deleted by the
    ContextCleaner only when the context was started with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (this
    engine's get_spark sets it); on foreign sessions without it, a
    long training run leaves one frame per round on the checkpoint
    volume — clean the dir after training."""
    from quasdb_spark.plans.materialize import materialize

    return materialize(df, eager=False)


def bpe_train(df: DataFrame, text_col: str = "text", *,
              n_merges: int = 8,
              word_re: str = "^[a-z]{2,}$",
              batched: bool = True,
              candidate_k: int = 1024,
              stats: dict | None = None) -> DataFrame:
    """FULL iterative BPE tokenizer training (Sennrich et al. 2016):
    repeatedly count adjacent symbol pairs over the corpus, merge the
    most frequent (ties: count desc, then left asc, right asc), and
    recount — emitting the merge table (merge_rank, lhs, rhs, merged,
    pair_count) a tokenizer applies at encode time. ``bpe_pair_counts``
    materializes only round one's candidates; this runs the n-merge
    loop a real vocabulary build needs.

    Scale shape: the corpus is touched ONCE — words collapse to a
    DISTINCT-word frequency table (hash aggregate; vocabulary grows
    sublinearly in corpus size) that is persisted and re-segmented
    per round. Each round is one pair-count aggregate over the vocab
    plus a 1-row driver fetch of the winning pair (the CC-fixpoint
    "tiny driver aggregate" pattern), and the merge applies as one
    map-side string replace — no Python in any per-row path.

    Determinism / oracle-parity: pair counts are exact integers; the
    tie-break is binary string order, identical in Spark and DuckDB;
    the merge-application semantics are both engines' native
    left-to-right non-overlapping replace (see BPE_SEP). A DuckDB
    oracle can therefore unroll a fixed n_merges round for round.

    Training vocabulary is words matching ``word_re`` (default:
    all-alphabetic, len >= 2 — the classic BPE setup; it also keeps
    the sentinel character and multi-code-unit regex '.' semantics
    out of scope). Stops early if the vocabulary is fully merged.
    Returns a driver-local merge table (n_merges rows — the quantizer
    centroids pattern: a LocalTableScan, broadcast-sized artifact).

    MERGE-COUNT scale (``batched=True``, the default): one Spark job
    per ROUND, not per merge — each round collects the top
    ``candidate_k`` pair candidates and applies the longest
    rank-order prefix that is provably identical to running the
    sequential rounds one by one (``_bpe_select_batch``; ties and
    symbol collisions close a batch, so worst case degrades to one
    merge per round, never to a wrong table). The segmentation frame
    is checkpointed each round, so the logical plan stays
    CONSTANT-depth — the sequential trainer's per-merge lineage
    growth (r10 VERDICT: O(n_merges²) string-replace analysis; a
    persist() chain doesn't help because nested InMemoryRelations
    still print/analyze their full children) is gone. On a cluster
    with ``sc.setCheckpointDir`` configured this is a RELIABLE
    checkpoint (survives executor loss — required for spot nodes /
    dynamic allocation, where a lost localCheckpoint block is
    unrecoverable because lineage was truncated); without one it
    falls back to localCheckpoint, safe in local mode where losing
    the only JVM loses the job regardless. See
    tests/test_text_ops.py batch parity tests and SCALE.md for the
    256-merge sf0.1 wall-clock. ``batched=False`` keeps the
    one-merge-per-round reference loop (the parity oracle for
    tests)."""
    spark = df.sparkSession
    words = (df.select(F.explode(tokens(text_col)).alias("w"))
             .where(F.col("w").rlike(word_re))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    enc = F.regexp_replace("w", "(.)", BPE_SEP + "$1" + BPE_SEP)
    cur = _bpe_checkpoint(words.select(enc.alias("s"), "freq"))
    toks = F.split(
        F.regexp_replace("s", f"^{BPE_SEP}|{BPE_SEP}$", ""),
        BPE_SEP + BPE_SEP)
    known_syms: set[str] = set()
    if batched:
        # driver-tracked symbol vocabulary for the collision guard:
        # initial symbols (distinct characters of the training vocab,
        # alphabet-sized) + one per merge. One tiny job, run once.
        known_syms = {r.c for r in
                      (words.select(F.explode(F.split("w", "")).alias("c"))
                       .where(F.col("c") != "").distinct().collect())}
    merges: list[tuple] = []
    while len(merges) < n_merges:
        pairs = (cur.select("freq", toks.alias("_t"))
                 # guard: sequence(1, 0) DESCENDS in Spark, so a fully
                 # merged 1-symbol word must not reach the explode
                 .where(F.size("_t") >= 2)
                 .select("freq", "_t",
                         F.explode(F.sequence(F.lit(1), F.size("_t") - 1))
                         .alias("i"))
                 .select(F.element_at("_t", F.col("i")).alias("lhs"),
                         F.element_at("_t", F.col("i") + 1).alias("rhs"),
                         "freq"))
        k = min(candidate_k, max(2, 8 * (n_merges - len(merges)))) \
            if batched else 1
        cands = (pairs.groupBy("lhs", "rhs")
                 .agg(F.sum("freq").alias("n"))
                 .orderBy(F.col("n").desc(), F.col("lhs").asc(),
                          F.col("rhs").asc())
                 .limit(k).collect())
        if not cands:
            break
        batch = _bpe_select_batch(cands, known_syms,
                                  n_merges - len(merges)) \
            if batched else [cands[0]]
        if stats is not None:
            # telemetry for scale studies: per-round batch sizes make
            # the rounds-vs-merges claim measurable (SCALE.md)
            stats.setdefault("batch_sizes", []).append(len(batch))
        s = F.col("s")
        for b in batch:
            merges.append((len(merges) + 1, b.lhs, b.rhs,
                           b.lhs + b.rhs, b.n))
            s = F.replace(
                s,
                F.lit(BPE_SEP + b.lhs + BPE_SEP + BPE_SEP + b.rhs
                      + BPE_SEP),
                F.lit(BPE_SEP + b.lhs + b.rhs + BPE_SEP))
        # checkpoint truncates lineage: each round's plan is one
        # projection over the previous round's materialized blocks.
        # Superseded RELIABLE checkpoints leave files on the
        # checkpoint volume that the ContextCleaner deletes ONLY
        # under spark.cleaner.referenceTracking.cleanCheckpoints=true
        # (set in this engine's session defaults; a session built
        # elsewhere without it accumulates one frame per round —
        # hundreds of rounds at real merge counts). localCheckpoint
        # blocks die with the executors either way.
        cur = _bpe_checkpoint(cur.select(s.alias("s"), "freq"))
    if stats is not None:
        stats["n_rounds"] = len(stats.get("batch_sizes", []))
        stats["n_merges"] = len(merges)
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string, "
        "pair_count long")


def get_or_train_bpe(df: DataFrame, *, fingerprint: str,
                     text_col: str = "text", n_merges: int = 8,
                     word_re: str = "^[a-z]{2,}$",
                     root: str | None = None,
                     force: bool = False) -> list[tuple]:
    """BPE merge table trained AT MOST ONCE per (corpus fingerprint,
    hyperparameters) — the quantizer artifact lifecycle applied to
    tokenizer training: production trains a tokenizer on a schedule
    and ships the merge table; queries only LOAD it (a few hundred
    bytes of JSON — strings and exact ints round-trip losslessly, so
    a loaded table segments identically to a fresh one). Returns the
    merges as a driver-local list [(rank, lhs, rhs, merged, count)]
    for bpe_segment / createDataFrame."""
    import hashlib
    import json
    import os
    import tempfile

    # lazy import: operators.quantizer reaches this module through
    # similarity -> dedup -> functions.text, so a top-level import
    # would be circular
    from quasdb_spark.operators import quantizer as QZ

    key = hashlib.md5(
        f"{fingerprint}|bpe n={n_merges}|re={word_re}"
        f"|col={text_col}".encode()).hexdigest()
    path = os.path.join(root or QZ.artifact_root(), f"bpe_{key}.json")
    if not force:
        with QZ._LOCK:
            rows = QZ._MEM.get("bpe:" + key)
        if rows is None:
            try:
                with open(path) as f:
                    payload = json.load(f)
                rows = [(int(r), str(a), str(b), str(m), int(n))
                        for r, a, b, m, n in payload["merges"]]
            except (OSError, ValueError, KeyError):
                rows = None
        if rows is not None:
            with QZ._LOCK:
                QZ._MEM["bpe:" + key] = rows
            return rows
    merges = [tuple(r) for r in
              bpe_train(df, text_col, n_merges=n_merges,
                        word_re=word_re).collect()]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"meta": {"fingerprint": fingerprint,
                                "n_merges": n_merges,
                                "word_re": word_re},
                       "merges": [list(m) for m in merges]}, f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    with QZ._LOCK:
        QZ._MEM["bpe:" + key] = merges
    return merges


def bpe_segment(text_col: str | Column, merges: list[tuple], *,
                word_re: str = "^[a-z]{2,}$") -> Column:
    """Apply a trained merge table to a single WORD column: returns
    the word's BPE segmentation as array<string> (encode-time
    counterpart of bpe_train, same sentinel mechanics — merges apply
    in rank order, each as one left-to-right replace). ``merges`` is
    the collected merge table: [(rank, lhs, rhs, ...), ...]."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    s = F.regexp_replace(c, "(.)", BPE_SEP + "$1" + BPE_SEP)
    for m in sorted(merges):
        lhs, rhs = m[1], m[2]
        s = F.replace(s, F.lit(BPE_SEP + lhs + BPE_SEP
                               + BPE_SEP + rhs + BPE_SEP),
                      F.lit(BPE_SEP + lhs + rhs + BPE_SEP))
    return F.split(F.regexp_replace(s, f"^{BPE_SEP}|{BPE_SEP}$", ""),
                   BPE_SEP + BPE_SEP)


def domain_mix_weights(df: DataFrame, domain_col: str = "source",
                       text_col: str = "text", *,
                       alpha: float = 0.3) -> DataFrame:
    """Temperature-scaled domain sampling weights — the multinomial
    mixing rule of XLM/mT5-style multi-domain training (and the
    starting point DoReMi iterates from): weight_d ∝ (tokens_d)^alpha,
    normalized. alpha < 1 up-samples small domains; alpha = 1 is
    proportional sampling. Emits per domain: token count, natural
    proportion, the alpha-tempered weight, and the oversample factor
    (weight / proportion) a sampler would apply.

    Scale shape: ONE map-side-combinable aggregate over the corpus
    (token counting is in-row size(tokens)); the per-domain table is
    tiny by contract, so the normalization pass is a broadcast of a
    scalar. Weights round to 6 decimals after double pow() — domains
    are few, so the 1-ulp pow()/sum differences sit far below the
    rounding grain in both engines.
    """
    per = (df.groupBy(F.col(domain_col).alias("domain"))
           .agg(F.sum(F.size(tokens(text_col))).alias("n_tokens")))
    tot = per.agg(F.sum("n_tokens").alias("_tot"),
                  F.sum(F.pow("n_tokens", F.lit(alpha))).alias("_ptot"))
    prop = F.round(F.col("n_tokens") / F.col("_tot"), 6)
    wgt = F.round(F.pow("n_tokens", F.lit(alpha)) / F.col("_ptot"), 6)
    # oversample divides the UNROUNDED ratio (a tiny domain's rounded
    # proportion can be 0.000000 — dividing by it would NULL/Inf the
    # exact domains alpha-tempering up-samples); an all-empty domain
    # (0 tokens) has no defined factor → NULL in both engines
    over = F.when(F.col("n_tokens") > 0, F.round(
        (F.pow("n_tokens", F.lit(alpha)) / F.col("_ptot"))
        / (F.col("n_tokens") / F.col("_tot")), 4))
    return (per.crossJoin(F.broadcast(tot))
            .select("domain", "n_tokens",
                    prop.alias("proportion"), wgt.alias("weight"),
                    over.alias("oversample")))


def importance_weights(df: DataFrame, target: DataFrame | Column, *,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_buckets: int = 256) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score each raw-corpus document by how much more likely its tokens
    are under the TARGET domain's hashed-unigram distribution than
    under the raw corpus's own,

        weight(doc) = sum_tokens [ ln p_tgt(b(tok)) - ln p_raw(b(tok)) ]

    with b(tok) = md5-derived 32-bit hash mod ``n_buckets`` and add-one
    smoothing on both distributions. Documents that look like the
    target domain score high; importance RESAMPLING then keeps docs
    with probability ∝ exp(weight) — this operator emits the weights
    (plus token counts), leaving the keep-policy to the caller
    (doc_sample_weighted composes directly).

    Scale shape: the two distributions are hash aggregates over
    exploded tokens (map-side combine; output is ``n_buckets`` rows —
    bounded by construction, not by data). The per-bucket log-ratio
    table broadcasts (it IS the trained importance model — DSIR's
    design point is that the model is tiny), the scoring join is
    map-side against that broadcast, and the only real shuffle is the
    per-doc sum, carrying one partial per (doc, distinct bucket) ≤
    ``n_buckets``/doc. No Python, no window, no driver collect.

    Determinism: per-bucket log-ratios are rounded to integer MICROS
    before the per-doc sum (order-free integer adds — the
    bm25/lm_bigram contract), so a SQL oracle agrees bit-for-bit. The
    output weight is reported at MICRO precision (round to 6): the
    per-doc sum is an exact integer of micros, so the 6-decimal value
    is on-grid and never a rounding tie — rounding the same sum to 4
    decimals hits exact X.XXXX5 ties (whenever s ≡ 50 mod 100), where
    Java (decimal-string HALF_UP) and C/DuckDB (binary-double round)
    legitimately disagree. Found by the sf1 sweep.
    """
    bucket = (F.conv(F.substring(F.md5(F.col("_t")), 1, 8), 16, 10)
              .cast("bigint") % n_buckets).alias("bucket")
    if isinstance(target, Column):
        # r15: the target domain given as a PREDICATE over ``df``'s own
        # columns (the common "target is a labeled subset" case) —
        # tokenize the corpus ONCE and carry the flag, so the target
        # model reads the same persisted token frame instead of
        # re-running tokenize+explode over the subset (one corpus
        # tokenization pass instead of ~1.4; counts, buckets and
        # weights are bit-identical — only where the target counts are
        # computed moved).
        toks = (df.select(F.col(id_col), target.alias("_tgt"),
                          F.explode(tokens(text_col)).alias("_t"))
                .select(id_col, "_tgt", bucket)
                .persist())  # feeds BOTH models AND the scoring pass
        tgt = (toks.where(F.col("_tgt")).select("bucket")
               .groupBy("bucket").agg(F.count(F.lit(1)).alias("_tc")))
    else:
        toks = (df.select(F.col(id_col), F.explode(tokens(text_col))
                          .alias("_t"))
                .select(id_col, bucket)
                .persist())  # feeds the raw model AND the scoring pass
        tgt = (target.select(F.explode(tokens(text_col)).alias("_t"))
               .select(bucket)
               .groupBy("bucket").agg(F.count(F.lit(1)).alias("_tc")))
    raw = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("_rc"))
    tots = (raw.agg(F.sum("_rc").alias("_rtot")).crossJoin(
        tgt.agg(F.coalesce(F.sum("_tc"), F.lit(0)).alias("_ttot"))))
    # every observed token's bucket exists in raw (target ⊆ vocab not
    # required: unseen-in-target buckets smooth to count 0 + 1)
    model = (raw.join(tgt, "bucket", "left").crossJoin(F.broadcast(tots))
             .select("bucket", F.round(
                 (F.log((F.coalesce(F.col("_tc"), F.lit(0)) + 1.0)
                        / (F.col("_ttot") + F.lit(float(n_buckets))))
                  - F.log((F.col("_rc") + 1.0)
                          / (F.col("_rtot") + F.lit(float(n_buckets)))))
                 * 1e6).cast("long").alias("_lwm")))
    per_doc = (toks.join(F.broadcast(model), "bucket")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum("_lwm").alias("_s")))
    return per_doc.select(
        id_col, "n_tokens",
        (F.round(F.col("_s") / 1e6, 6) + F.lit(0.0)).alias("weight"))
