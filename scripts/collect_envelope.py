"""Assemble BENCH_VARIANTS artifact from an envelope-run log.

scripts/run_envelope.sh appends one JSON line per (variant, res) run of
scripts/bench_variants.py; this gathers them (last line wins per
metric), attaches the protocol note, and writes the artifact the judge
reads against the reference's 5-resolution speed claim
(/root/reference/README.md "Measure compression speed",
d3x3.cu:7-25 hint tables).

Usage: python scripts/collect_envelope.py /tmp/bench_env.log \
           artifacts/BENCH_VARIANTS_r05.json [--note "..."]
"""

import json
import sys


def main():
    log, out = sys.argv[1], sys.argv[2]
    note = ("per-variant speed on the tunneled v5e dev chip "
            "(protocol: bench.py — skip_thres 0.15, warm-up discarded, "
            "bit-exact round-trip gate; dec_device_fps = decode device "
            "compute with host entropy hops removed; _devec = Pallas "
            "on-device entropy decode, zero blocking host hops)")
    if "--note" in sys.argv:
        note = sys.argv[sys.argv.index("--note") + 1]
    results = {}
    with open(log, errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in rec:
                results[rec["metric"]] = rec
    art = {"note": note, "results": results}
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"{len(results)} metrics -> {out}")


if __name__ == "__main__":
    main()
