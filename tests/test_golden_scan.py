"""Golden-file test in the reference's style (SURVEY §5:
matchcode/utils.py:50-94 `check_codebase` with a FIXTURES_REGEN switch):
run the scan-JSON ingest, serialize every output table canonically, compare
to the checked-in expected JSON. Regenerate with

    PURLDB_SPARK_FIXTURES_REGEN=1 python -m pytest tests/test_golden_scan.py
"""

from __future__ import annotations

import json
import os

from purldb_spark.sources.scan_json import ingest_scan

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDEN = os.path.join(FIXTURES, "scan1_expected.json")
REGEN = os.environ.get("PURLDB_SPARK_FIXTURES_REGEN") == "1"


def _canonical(out) -> dict:
    """Deterministic JSON form: every table as sorted row dicts."""
    doc = {}
    for table, df in sorted(out.items()):
        rows = [r.asDict(recursive=True) for r in df.collect()]
        doc[table] = sorted(rows, key=lambda r: json.dumps(r, sort_keys=True, default=str))
    return doc


def test_scan_ingest_matches_golden(spark):
    out = ingest_scan(spark, os.path.join(FIXTURES, "scan1.json"))
    actual = _canonical(out)
    if REGEN or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(actual, f, indent=1, sort_keys=True, default=str)
        assert os.path.exists(GOLDEN)
        return
    with open(GOLDEN) as f:
        expected = json.load(f)
    assert json.loads(json.dumps(actual, default=str)) == expected