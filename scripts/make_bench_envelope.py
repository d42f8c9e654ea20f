#!/usr/bin/env python3
"""Regenerate scripts/bench_envelope.json from bench logs.

Usage: python3 scripts/make_bench_envelope.py BENCH_LOCAL_rN.txt [more...]

Reads the `steady_sec` line (short-key ascending map) of one or more
EXCLUSIVE bench runs and writes the per-query steady envelope that
graft.Bench's post-steady recheck pass compares against: a query whose
steady min lands above 2x its envelope entry on the next run is
re-measured once after the machine settles, so a co-tenant JVM during
the driver's run cannot manufacture a phantom regression in the
official artifact.

With multiple logs the envelope takes the per-query MIN — min-of-N is
the steady estimator, and JVM-to-JVM variance on heavy graph queries
is ±15-30%, so one run's slow JVM should not loosen the envelope.
Regenerate from each round's exclusive round-end bench(es) so the
envelope tracks the current query surface.
"""
import json
import re
import sys


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    env = {}
    for path in sys.argv[1:]:
        steady = None
        with open(path) as f:
            for line in f:
                m = re.search(r'\{"metric":"steady_sec".*\}', line)
                if m:
                    steady = json.loads(m.group(0))["queries"]
        if steady is None:
            sys.exit(f"no steady_sec line found in {path}")
        for k, v in steady.items():
            if v >= 0 and (k not in env or v < env[k]):
                env[k] = v
    out = "scripts/bench_envelope.json"
    with open(out, "w") as f:
        json.dump(env, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(env)} queries")


if __name__ == "__main__":
    main()
