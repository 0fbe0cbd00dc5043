"""Round-4 fixes pinned by unit tests (VERDICT r3 'Next round' items).

Item 3: queries() rotation must order never-green first, then
least-recently-green (ascending round of newest hash-green row), with
static-dict order breaking ties inside each tier.

Item 1: bench.py's final stdout line must stay under the driver's
~2,000-char capture window.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __ray_entry__ import _rotate_never_green_first  # noqa: E402


def _fake_corr(tmp_path, rnd, greens):
    rows = {k: {"hash_match": True, "rows_match": True} for k in greens}
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


def test_rotation_never_green_then_least_recently_green(tmp_path):
    order = {k: (lambda sf, _k=k: _k) for k in "abcdef"}
    # a,b green in r1; c green in r2; d re-verified in r3 (newest wins);
    # e,f never green.
    _fake_corr(tmp_path, 1, ["a", "b", "d"])
    _fake_corr(tmp_path, 2, ["c"])
    _fake_corr(tmp_path, 3, ["d"])
    out = list(_rotate_never_green_first(order, _here=str(tmp_path)))
    assert out == ["e", "f", "a", "b", "c", "d"]


def test_rotation_no_files_preserves_static_order(tmp_path):
    order = {k: (lambda sf: None) for k in ["z", "m", "a"]}
    out = list(_rotate_never_green_first(order, _here=str(tmp_path)))
    assert out == ["z", "m", "a"]


def test_rotation_non_green_rows_do_not_count(tmp_path):
    order = {k: (lambda sf: None) for k in ["a", "b"]}
    rows = {"a": {"hash_match": False}, "b": {"hash_match": True}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    out = list(_rotate_never_green_first(order, _here=str(tmp_path)))
    assert out == ["a", "b"]


def test_bench_final_line_fits_driver_capture():
    """The compact-line fallback in bench.py __main__ trims the queries
    map until the line fits ~1,900 chars; simulate an oversized summary
    through the same logic."""
    out = {
        "metric": "m" * 100,
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "num_cpus": 32,
        "queries": {f"query_with_a_long_name_{i:03d}": 1.2345 for i in range(200)},
    }
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) > 1900  # the simulated overflow
    while len(line) > 1900 and out["queries"]:
        out["queries"].pop(next(reversed(out["queries"])))
        line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["queries"]  # still carries a per-query map
