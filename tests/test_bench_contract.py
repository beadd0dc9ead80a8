"""Pin the bench.py stdout contract.

The driver keeps only the last 2,000 chars of bench stdout and json-parses
the final line.  Round 3 lost its graded bench because the line (74 per-query
timings) outgrew that window (VERDICT.md r3, finding #1).  These tests build
a worst-case result line and assert it stays parseable from a tail capture.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _worst_case_inputs():
    # every headline query present, with the widest plausible float reprs
    timings = {name: 9999.999 for name in bench.HEADLINE}
    fm = {
        "n_images": 100000000,
        "pip_rows": 25817999,
        "sec": 99999.999,
        "rows_per_sec": 99999.9,
    }
    fs = dict(fm)
    return timings, fm, fs


def test_final_line_fits_driver_tail_capture():
    timings, fm, fs = _worst_case_inputs()
    line, detail = bench.make_result(timings, fm, fs, sf=0.1, cpus=32)
    assert len(line) < bench.MAX_LINE_CHARS
    # driver keeps the LAST 2000 chars; the line must survive that window
    # even with a trailing newline and a stray stderr-free prefix
    assert len(line) + 1 <= 2000
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    assert parsed["value"] == round(sum(timings.values()) + fm["sec"], 3)
    assert parsed["flagship"]["rows_per_sec"] == fm["rows_per_sec"]
    assert 0 < len(parsed["queries"]) <= len(bench.KEY_QUERIES)
    # detail keeps the full map
    assert set(detail["queries"]) == set(bench.HEADLINE)
    assert detail["n_queries"] == len(bench.HEADLINE)


def test_key_queries_are_registered_headliners():
    assert set(bench.KEY_QUERIES) <= set(bench.HEADLINE)
