"""The bench harness's cross-round drift machinery (round 11): prior
readings must load from either record shape the repo contains — a raw
bench record or the driver's {"tail": "...json lines..."} wrapper —
must be sf-gated, and must fail soft (empty dict) on anything else.
No Spark needed; pure file parsing."""

import importlib.util
import json
import os
import sys


def _load_bench(tmp_path):
    """Import bench.py with its BENCH_r*.json lookup pointed at
    tmp_path (the module resolves records next to its own file, so the
    copy trick keeps the lookup hermetic)."""
    src = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    dst = tmp_path / "bench_under_test.py"
    dst.write_text(open(src).read())
    spec = importlib.util.spec_from_file_location("bench_under_test", dst)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_prior_mins_raw_record_and_sf_gate(tmp_path):
    rec = {"sf": 0.1, "queries": {"q1": 1.5, "q2": 0.2}}
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(rec))
    bench = _load_bench(tmp_path)
    assert bench._prior_round_mins(0.1) == {"q1": 1.5, "q2": 0.2}
    # sf mismatch -> no priors (sf0.01 iteration must not false-flag)
    assert bench._prior_round_mins(0.01) == {}


def test_prior_mins_driver_tail_wrapper_takes_highest_round(tmp_path):
    compact = {"sf": 0.1, "queries": {"q1": 9.9}}
    old = {"sf": 0.1, "queries": {"q1": 1.0}}
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(old))
    # driver wrapper: tail holds stdout lines, compact summary LAST,
    # possibly preceded by a truncated detail line
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps(
            {
                "n": 10,
                "rc": 0,
                "tail": '"truncated detail...}\n' + json.dumps(compact) + "\n",
            }
        )
    )
    bench = _load_bench(tmp_path)
    assert bench._prior_round_mins(0.1) == {"q1": 9.9}


def test_prior_mins_missing_or_garbage_is_empty(tmp_path):
    bench = _load_bench(tmp_path)
    assert bench._prior_round_mins(0.1) == {}
    (tmp_path / "BENCH_r05.json").write_text("not json at all")
    assert bench._prior_round_mins(0.1) == {}
