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
    # every query currently has an oracle; if a non-SQL-expressible op
    # is added later, list it here explicitly
    assert not missing_oracle
