#!/usr/bin/env python3
"""Regenerate scripts/bench_envelope.json from a bench log.

Usage: python3 scripts/make_bench_envelope.py BENCH_LOCAL_rN.txt

Reads the `steady_sec` line (short-key ascending map) of an EXCLUSIVE
bench run and writes the per-query steady envelope that graft.Bench's
post-steady recheck pass compares against: a query whose steady min
lands above 2x its envelope entry on the next run is re-measured once
after the machine settles, so a co-tenant JVM during the driver's run
cannot manufacture a phantom regression in the official artifact.

Regenerate from each round's exclusive round-end bench so the envelope
tracks the current query surface.
"""
import json
import re
import sys


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    steady = None
    with open(sys.argv[1]) as f:
        for line in f:
            m = re.search(r'\{"metric":"steady_sec".*\}', line)
            if m:
                steady = json.loads(m.group(0))["queries"]
    if steady is None:
        sys.exit("no steady_sec line found")
    env = {k: v for k, v in sorted(steady.items()) if v >= 0}
    out = "scripts/bench_envelope.json"
    with open(out, "w") as f:
        json.dump(env, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(env)} queries")


if __name__ == "__main__":
    main()
