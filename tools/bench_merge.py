#!/usr/bin/env python3
"""Merge per-segment Bench JSON lines into one round artifact.

Usage: python3 tools/bench_merge.py SEG1.json SEG2.json ... > OUT.json

Each input holds the one `"metric"` JSON line a forked-JVM segment
printed (tools/bench_seg.sh collects them). The merge:
  - unions `queries` / `rows_out` / `failures` / `stage_of` (duplicate
    query keys across segments are an ERROR — the segmenter guarantees
    disjointness, and a silent overwrite would hide a double-billed
    staged build);
  - concatenates `failed`;
  - sums `value` (total seconds);
  - records `segments` = input count so readers know the window shape;
  - ORs the per-segment `contended` stamps into a top-level
    `contended` and keeps every segment's raw contention sample under
    `contention_segments` (r14 verdict #2: the merge used to DROP the
    stamps, so a contended segment produced a clean-looking merged
    artifact — absence read as uncontended).

Optionally, isolation re-measure passes can be folded in with
--isolated NAME=ISO.json — only the NAMED row is taken from each file
(an isolation run also re-builds stage dependencies incidentally;
folding those too would overwrite the window's deliberate stage
measurements with whichever isolation run happened last — r13
advisor). The folded rows land under the `isolated` key;
tools/slope.py then flags on those numbers. A bare --isolated ISO.json
(no NAME=) keeps the legacy fold-every-positive-row behavior for
hand-built A/B files. An isolation file stamped `contended` is
REFUSED (warned, not folded): a fresh-JVM re-measure exists to remove
noise, so folding a contended one would launder contention back in as
clean evidence.
"""
import json
import sys


def load(path):
    line = [l for l in open(path) if '"metric"' in l][0]
    return json.loads(line[line.index("{") :])


def main(argv):
    iso_paths, seg_paths = [], []
    it = iter(argv)
    for a in it:
        if a == "--isolated":
            iso_paths.append(next(it))
        else:
            seg_paths.append(a)
    if not seg_paths:
        sys.exit("no segment files given")
    segs = [load(p) for p in seg_paths]
    out = {
        "metric": "total",
        "value": 0.0,
        "unit": "sec",
        "queries": {},
        "rows_out": {},
        "failed": [],
        "failures": {},
        "stage_of": {},
        "segments": len(segs),
        "sf": segs[0].get("sf"),
    }
    out["contended"] = False
    out["contention_segments"] = []
    for p, s in zip(seg_paths, segs):
        if s.get("sf") != out["sf"]:
            sys.exit(f"{p}: sf {s.get('sf')} != {out['sf']}")
        for k in ("queries", "rows_out", "failures"):
            for q, v in s.get(k, {}).items():
                if k == "queries" and q in out[k]:
                    sys.exit(f"{p}: duplicate query row {q} across segments")
                out[k][q] = v
        out["stage_of"].update(s.get("stage_of", {}))
        out["failed"] += s.get("failed", [])
        out["value"] += s["value"]
        out["contended"] = out["contended"] or bool(s.get("contended"))
        out["contention_segments"].append(
            {"segment": s.get("segment"),
             "contended": s.get("contended"),
             "contention": s.get("contention")})
    if iso_paths:
        iso = {}
        for spec in iso_paths:
            if "=" in spec:
                name, path = spec.split("=", 1)
                f = load(path)
                v = f["queries"].get(name, -1)
                if f.get("contended"):
                    print(f"[bench_merge] REFUSED isolated row {name}: "
                          f"{path} is stamped contended — a contended "
                          f"re-measure is not isolation evidence",
                          file=sys.stderr)
                elif v > 0:
                    iso[name] = v
                else:
                    print(f"[bench_merge] WARN isolated row {name} "
                          f"missing/failed in {path}; not folded",
                          file=sys.stderr)
            else:
                f = load(spec)
                if f.get("contended"):
                    print(f"[bench_merge] REFUSED isolated file {spec}: "
                          f"stamped contended", file=sys.stderr)
                    continue
                for q, v in f["queries"].items():
                    if v > 0:
                        iso[q] = v
        out["isolated"] = iso
    json.dump(out, sys.stdout, separators=(",", ":"))
    print()


if __name__ == "__main__":
    main(sys.argv[1:])
