#!/usr/bin/env python3
"""Aggregate per-suite wall-clock seconds from ScalaTest's JUnit XML.

Usage: python3 scripts/suite_times.py [reports_dir]

Reads target/test-reports/TEST-*.xml (written because build.sbt passes
`-u target/test-reports` to ScalaTest), prints one line per suite
sorted by descending seconds plus the total, in the markdown shape the
README budget table uses. Suite `time` attributes are the framework's
own per-suite wall clock; with sbt's parallel suite execution the sum
exceeds elapsed wall time — the table is for ATTRIBUTION (which suite
grew), the `sbt test` footer is the budget number.
"""
import glob
import re
import sys

reports = sys.argv[1] if len(sys.argv) > 1 else "target/test-reports"
rows = []
for path in glob.glob(f"{reports}/TEST-*.xml"):
    # regex, not an XML parser: ScalaTest's <properties> dump embeds
    # raw JVM system-property values that break strict parsing; the
    # attributes we need are all on the opening <testsuite> tag
    head = open(path, encoding="utf-8", errors="replace").read(2048)
    attr = dict(re.findall(r'(\w+)="([^"]*)"',
                           head.split("<properties", 1)[0]))
    rows.append((float(attr.get("time", "0")), int(attr.get("tests", "0")),
                 attr.get("name", "?").split(".")[-1]))
if not rows:
    sys.exit(f"no TEST-*.xml under {reports}; run `sbt test` first")
rows.sort(reverse=True)
print("| Suite | tests | seconds |")
print("|---|---|---|")
for secs, tests, name in rows:
    print(f"| {name} | {tests} | {secs:.1f} |")
print(f"| **total ({len(rows)} suites)** | **{sum(r[1] for r in rows)}** | "
      f"**{sum(r[0] for r in rows):.1f}** |")
