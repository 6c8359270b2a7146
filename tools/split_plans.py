#!/usr/bin/env python3
"""Split a graft.PlanAudit stdout log into per-query plan files.

Usage: split_plans.py <log> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt holding the section from the query's
"== Physical Plan ==" line to the next query header (log-noise lines with
a LEVEL tag like " INFO "/" WARN " are dropped).
"""
import re
import sys
import pathlib

log, outdir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
outdir.mkdir(parents=True, exist_ok=True)
cur, buf = None, []
header = re.compile(r"^=+ (q\S+) =+$")
noise = re.compile(r"\d{2}:\d{2}:\d{2} (INFO|WARN|ERROR) ")

def flush():
    if cur is None:
        return
    text = "\n".join(buf).strip() + "\n"
    assert "== Physical Plan ==" in text, f"no plan for {cur}"
    (outdir / f"{cur}_{suffix}.txt").write_text(text)
    print(f"wrote {cur}_{suffix}.txt ({len(text)} bytes)")

for line in open(log):
    line = line.rstrip("\n")
    m = header.match(line.strip())
    if m:
        flush()
        cur, buf = m.group(1), []
        continue
    if cur is not None and not noise.search(line):
        buf.append(line)
flush()
