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
    # sketch estimates are engine-specific (no cross-engine hash oracle
    # possible); their correctness contract is the error-bound tests in
    # tests/test_sketches.py — every OTHER query must carry an oracle
    assert missing_oracle == {"sketch_events_profile"}
