"""The driver tail-captures bench.py stdout and json.loads the LAST line.

VERDICT r6 "what's wrong" #1: the r6 summary line (with runs/median
inlined) outgrew the tail capture and the round lost its bench signal.
These tests pin the output contract: the final stdout line parses as
JSON, carries exactly the driver-facing keys, and stays under
bench.SUMMARY_MAX_BYTES even for a padded query set; the rich detail
lands in BENCH_DETAIL.json, not on stdout.
"""

import io
import json

import bench


def _canned(n_queries):
    timings = {f"q{i:02d}_some_operator_name": round(0.123 + i * 0.007, 3)
               for i in range(n_queries)}
    medians = {k: round(v * 1.3, 3) for k, v in timings.items()}
    all_runs = {k: [round(v + j * 0.05, 3) for j in range(5)]
                for k, v in timings.items()}
    return timings, medians, all_runs


def test_summary_line_parses_and_is_bounded(tmp_path):
    timings, medians, all_runs = _canned(len(bench.BENCH_QUERIES))
    out = io.StringIO()
    detail_path = tmp_path / "BENCH_DETAIL.json"
    bench.emit(timings, medians, all_runs, sf=0.1, runs=5,
               detail_path=str(detail_path), out=out)
    lines = out.getvalue().strip().splitlines()
    last = lines[-1]
    assert len(last.encode()) < bench.SUMMARY_MAX_BYTES
    parsed = json.loads(last)
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}
    assert parsed["unit"] == "sec"
    assert parsed["queries"] == timings
    assert parsed["value"] == round(sum(timings.values()), 3)
    # detail went to the file, not stdout
    detail = json.loads(detail_path.read_text())
    assert detail["runs"] == all_runs
    assert detail["median"] == medians
    assert "runs" not in parsed and "median" not in parsed


def test_summary_stays_bounded_with_grown_query_set(tmp_path):
    # headroom check: even at 2x the current query count the line fits
    timings, medians, all_runs = _canned(2 * len(bench.BENCH_QUERIES))
    out = io.StringIO()
    line = bench.emit(timings, medians, all_runs, sf=0.1, runs=5,
                      detail_path=str(tmp_path / "d.json"), out=out)
    assert len(line.encode()) < bench.SUMMARY_MAX_BYTES
    assert json.loads(line)["queries"] == timings


def test_summary_is_last_line(tmp_path):
    timings, medians, all_runs = _canned(3)
    out = io.StringIO()
    line = bench.emit(timings, medians, all_runs, sf=0.01, runs=2,
                      detail_path=str(tmp_path / "d.json"), out=out)
    assert out.getvalue().strip().splitlines()[-1] == line
