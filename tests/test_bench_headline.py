"""Guard bench.py's final stdout line against the driver's 2000-char
tail window.

Rounds 4 and 5 both lost their machine-readable bench because the
last stdout line outgrew the window as the headline set grew. The
line now carries only totals + the top-10 slowest queries; this test
reconstructs it with worst-case widths (the 10 LONGEST query names in
the headline set, maximal float widths) and asserts it stays under
1900 chars no matter how many queries are added to HEADLINE.
"""

import json

import bench


def _worst_case_line() -> str:
    longest = sorted(bench.HEADLINE, key=len, reverse=True)[:10]
    slowest = {name: 99999.999 for name in longest}
    return json.dumps({
        "metric": "headline query wall time (noop sink, local)",
        "value": 9999999.999,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(bench.HEADLINE),
        "medians_file": "BENCH_MEDIANS.json",
        "sf": 0.1,
    })


def test_headline_line_fits_driver_tail_window():
    line = _worst_case_line()
    assert len(line) < 1900, (
        f"bench headline line would be {len(line)} chars; the driver "
        "tail-captures 2000 — trim the top-10 payload"
    )


def test_headline_names_are_registered():
    from chill_spark import queries as Q

    registry = Q.queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"bench.HEADLINE names unregistered queries: {missing}"
