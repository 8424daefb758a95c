"""Oracle-parity test: every suite query must match its DuckDB oracle
at sf0.001 (the driver's gate runs the same comparison at sf0.01)."""

import importlib.util
import os

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(HERE, "..", "tools", "check_oracle.py"))
check_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_oracle)


def test_all_queries_match_oracle(spark, sf_dir):
    failures = check_oracle.run_checks(spark, sf_dir, quiet=False)
    assert not failures, f"oracle mismatches: {failures}"


def test_queries_and_oracles_registered():
    import __spark_entry__ as e

    qs, orc = e.queries(), e.oracle_sql()
    assert set(orc) <= set(qs)
    missing_oracle = set(qs) - set(orc)
    # every query carries a cross-engine oracle, with the chartered
    # exceptions of the xxhash64 FAMILY (minhash pairs / incremental
    # index / CC clustering on the production base hash): Spark's
    # xxhash64 has no DuckDB counterpart (md5/sha256 are its only
    # portable hashes) and the base hash is semantic (it picks the LSH
    # candidates), so those rows are rows-only checked by the driver,
    # semantics-pinned by tests/test_dedup.py's md5-vs-xxh parity
    # suite, and each sits next to its oracle-gated md5 twin. The approximate sketch aggregates (HLL/percentile_approx/
    # CMS) are engine-specific and covered by error-bound tests in
    # tests/test_sketches.py instead — the driver-facing
    # sketch_events_profile is the deterministic (exact ndv +
    # discrete-percentile) variant, which IS oracled
    assert missing_oracle == {"dedup_minhash_xxh",
                              "dedup_incremental_xxh",
                              "dedup_clusters_cc_xxh"}


def test_hostile_fixture_states_pinned(spark):
    """The hostile stores' expected states, pinned as literals (the
    oracle gate re-derives them via SQL replay; this is the faster
    in-repo pin). Covers: NULL-sub winners through FULL compaction,
    unicode/empty keys, intra-batch sub ordering, tombstones for
    missing keys, snapshot retention through compact+vacuum(0)."""
    from quasdb_spark import suite

    got = {r["key"]: r["value"] for r in
           suite.q_kv_hostile_state(spark, "unused").collect()}
    assert got == {"": "empty-key-2", "a": "3", "clé": "accent",
                   "键": "cjk", "line\nfeed": "lf", "sp ace": "v sp",
                   "zzz": "", "퇀": "hangul"}
    got = {r["key"]: r["value"] for r in
           suite.q_kv_hostile_asof(spark, "unused").collect()}
    assert got == {"k1": "v1", "k2": "v2", "дел": "old", "": ""}
