#!/usr/bin/env python3
"""Pin the SURVEY section 2.12 operator-row count.

Counting rule (the one cross-round totals use): every BODY row of the
section 2.12 markdown table is ONE operator row — a row that bundles
several gates still counts once. The table runs from the '### 2.12'
heading to the next '###' heading; header and separator rows are skipped.

Usage: python3 tools/count_survey.py [SURVEY.md]
"""
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "SURVEY.md"
text = open(path, encoding="utf-8").read()
sec = text.split("### 2.12", 1)[1].split("\n### ", 1)[0]
rows = [l for l in sec.splitlines() if l.startswith("|")]
body = [l for l in rows if not l.lstrip("|").lstrip().startswith("-")]
# drop the single header row ("| operator | impl | gate |")
print(len(body) - 1)
