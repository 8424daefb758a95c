"""The sf1 sweep's merge must carry every evidence class forward:
ok and fail from logs/JSON, and oracle_timeout records from a prior
CORRECTNESS_sf1.json (dropping those silently upgraded rows-only
evidence to absent — the round-8 artifact regression)."""

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "sf1_sweep", os.path.join(os.path.dirname(__file__), "..",
                              "tools", "sf1_sweep.py"))
sf1_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sf1_sweep)


def test_prior_results_parses_json_including_timeouts(tmp_path):
    rec = {"ok": ["q_a", "q_b"], "fail": {"q_c": "FAIL q_c: values"},
           "oracle_timeout": {"q_d": 16229, "q_e": None}}
    p = tmp_path / "CORRECTNESS_sf1.json"
    p.write_text(json.dumps(rec))
    out = sf1_sweep.prior_results([str(p)])
    assert out["q_a"] == ("ok", "")
    assert out["q_c"][0] == "fail"
    assert out["q_d"] == ("oracle_timeout", 16229)
    assert out["q_e"] == ("oracle_timeout", None)


def test_prior_results_parses_log_lines(tmp_path):
    log = tmp_path / "sweep.log"
    log.write_text(
        "13 prior ok; sweeping 2 (budget 600s each)\n"
        "ok    q_a (87s)\n"
        "FAIL  q_b: values differ; first diffs: [...]\n"
        "TIMEOUT q_c (oracle budget 600s exceeded; spark rows=2441149)\n"
        "TIMEOUT q_d (oracle budget 600s exceeded; spark rows=None)\n")
    out = sf1_sweep.prior_results([str(log)])
    assert out["q_a"][0] == "ok"
    assert out["q_b"][0] == "fail"
    assert out["q_c"] == ("oracle_timeout", 2441149)
    assert out["q_d"][0] == "oracle_timeout" and out["q_d"][1] is None


def test_later_source_wins_on_merge(tmp_path):
    """A later log re-deciding a query (timeout -> ok) must override
    the earlier record, mirroring the retry workflow."""
    rec = {"ok": [], "fail": {}, "oracle_timeout": {"q_a": 100}}
    j = tmp_path / "prior.json"
    j.write_text(json.dumps(rec))
    log = tmp_path / "retry.log"
    log.write_text("ok    q_a (87s)\n")
    out = sf1_sweep.prior_results([str(j), str(log)])
    assert out["q_a"][0] == "ok"
