#!/usr/bin/env python3
"""Derive the authoritative test count from sbt's JUnit report XMLs.

SURVEY.md / round-close notes must quote THIS number, not a hand-kept
tally (round 14 committed 460 while the XMLs said 461). Usage:

    sbt -batch test && python3 tools/testcount.py

Prints one line: `<tests> tests, <failures> failures, <errors> errors
across <suites> suites`. Exits 1 if any failure/error or no reports.
"""
import glob
import os
import sys
import xml.etree.ElementTree as ET

report_dir = sys.argv[1] if len(sys.argv) > 1 else "target/test-reports"
files = sorted(glob.glob(os.path.join(report_dir, "*.xml")))
if not files:
    print(f"no report XMLs under {report_dir} — run `sbt test` first", file=sys.stderr)
    sys.exit(1)

tests = failures = errors = 0
for f in files:
    suite = ET.parse(f).getroot()
    tests += int(suite.get("tests", 0))
    failures += int(suite.get("failures", 0))
    errors += int(suite.get("errors", 0))

print(f"{tests} tests, {failures} failures, {errors} errors across {len(files)} suites")
sys.exit(0 if failures == 0 and errors == 0 else 1)
