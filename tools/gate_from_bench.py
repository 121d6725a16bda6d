#!/usr/bin/env python3
"""Derive the SURVEY §8 bench gate sentence from a bench artifact.

Usage: gate_from_bench.py <BENCH_rN.json | target/bench.json>

Accepts either the raw one-line bench JSON emitted by graft.Bench or
the driver's wrapper JSON (whose "tail" embeds — possibly a truncated
suffix of — that line). Prints the gate sentence the survey should
paste VERBATIM, so gate numbers always byte-match the artifact they
claim to come from (VERDICT r10 #6).
"""
import json, os, re, sys


def main(path):
    raw = open(path).read()
    src = raw.strip()
    if not src.startswith('{"metric"'):
        try:
            src = json.loads(raw).get("tail", "")
        except Exception:
            pass
    # Tolerate head-truncated wrappers (the r6/r7 mangling): recover
    # per-query pairs by scan, like Bench.parseBenchFile's fallback.
    pair_re = re.compile(r'"([A-Za-z][A-Za-z0-9]*_[A-Za-z0-9_]+)":(-?[0-9.eE+]+)')
    cut = src.split('"regressions":')[0]
    queries = {m.group(1): float(m.group(2)) for m in pair_re.finditer(cut)}
    sf = re.search(r'"sf":"([^"]*)"', src)
    reps = re.search(r'"repeats":(\d+)', src)
    total_m = re.search(r'"value":(-?[0-9.eE+]+)', src)
    total = float(total_m.group(1)) if total_m else sum(queries.values())
    sf_base = os.path.basename(sf.group(1)) if sf else "?"
    reps_s = reps.group(1) if reps else "?"
    if not (src.strip().startswith('{"metric"') and total_m and sf and reps):
        # The driver wrapper keeps only a 2000-char suffix of the line
        # (BENCH_r10.json: 56 of 123 queries, no total) — a partial
        # recovery must not masquerade as the gate number. The full
        # line persists at target/bench.json from the same run.
        print("WARNING: artifact is a truncated wrapper tail — "
              f"recovered only {len(queries)} queries; use the "
              "target/bench.json written by the same run instead.",
              file=sys.stderr)
    print(f"bench **{total:.1f}s median-of-{reps_s} for ALL "
          f"{len(queries)} queries at {sf_base}**")


if __name__ == "__main__":
    main(sys.argv[1])
