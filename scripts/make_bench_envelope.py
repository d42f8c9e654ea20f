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

The envelope is load-bearing for the artifact's integrity, so inputs
must themselves be CLEAN: a log whose final summary line carries
load1_start above MAX_LOAD1_START (a co-tenant was already running
when the bench launched) is REFUSED — regenerating from a loaded run
would quietly loosen every threshold and disarm the recheck pass.
Override with --force only when you have checked the per-query
steady_ctx stamps yourself.
"""
import json
import re
import sys

# an exclusive launch starts from an idle machine; anything above this
# at t=0 means another JVM was mid-flight (the r17 driver run started
# at load1 6.63)
MAX_LOAD1_START = 2.0


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    env = {}
    for path in args:
        steady = None
        load1_start = None
        with open(path) as f:
            for line in f:
                m = re.search(r'\{"metric":"steady_sec".*\}', line)
                if m:
                    steady = json.loads(m.group(0))["queries"]
                m = re.search(r'\{"metric":"total".*"load1_start".*\}', line)
                if m:
                    load1_start = json.loads(m.group(0))["load1_start"]
        if steady is None:
            sys.exit(f"no steady_sec line found in {path}")
        if load1_start is None:
            sys.exit(f"no load1_start summary line found in {path} — "
                     "regenerate only from complete bench logs")
        if load1_start > MAX_LOAD1_START and not force:
            sys.exit(
                f"REFUSED: {path} started at load1 {load1_start} > "
                f"{MAX_LOAD1_START} — not an exclusive run; an envelope "
                "from a loaded machine loosens every recheck threshold. "
                "Re-run the bench exclusively, or pass --force after "
                "checking the per-query steady_ctx stamps.")
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
