"""Merge several closed-tree bench runs into a round-anchored artifact
with an explicit variance band.

Round 7 measured three closed-tree runs spanning 146-170 s (this host's
~1.15-1.4x drift band) and could only document the spread in SCALE.md
prose; the round-8 tripwire then had to guess whether a slow key was
"outside the band" or a "slow-band re-measurement" (r7 verdict item 5).
This tool makes the band part of the artifact:

    python bench.py                      # run 1 -> cp BENCH_full.json /tmp/b1.json
    python bench.py                      # run 2 -> cp BENCH_full.json /tmp/b2.json
    python bench.py                      # run 3 -> cp BENCH_full.json /tmp/b3.json
    python tools/merge_bench_band.py BENCH_full_r08.json /tmp/b1.json /tmp/b2.json /tmp/b3.json

Output schema = bench.py's BENCH_full schema plus:
    "band":       {key: [min_sec, max_sec]}   across the input runs
    "value_band": [min_total, max_total]      across the input runs
    "runs_n":     number of merged runs
    "queries":    per-key ANCHOR = the MAX across runs (the conservative
                  slow-band anchor round 7 chose deliberately, so ratio
                  gates never flatter a fast-band fluke), failures (-1)
                  preserved if any run failed
    "value_sum_of_max": sum of the per-key MAX anchors — an upper bound
                  that structurally exceeds value_band's max (it mixes
                  each key's slowest run); kept for the tripwire's
                  per-key math, never for headline comparison
bench.py's tripwire reads band max as the baseline (load_prev_bench).

The headline "value" is the NEWEST run's measured total (a real
wall-clock number inside value_band), not the sum of per-key maxes —
r8 advice: a sum-of-maxes headline always reads as out-of-band to any
consumer comparing it against value_band.
"""

from __future__ import annotations

import json
import sys


def merge(paths: list[str]) -> dict:
    runs = []
    for p in paths:
        with open(p) as fh:
            runs.append(json.load(fh))
    if not runs:
        raise SystemExit("no input runs")
    # merge inputs must be RAW bench runs: a previously-merged artifact
    # carries the union of all its runs' suspect_contention keys, so
    # re-feeding it would misclassify it as contended and silently drop it
    # (r10 advice).  Refuse loudly instead.
    for p, r in zip(paths, runs):
        if "runs_n" in r or "value_band" in r:
            raise SystemExit(
                f"{p} is already a merged band artifact (carries runs_n/"
                "value_band) — merge only raw BENCH_full runs"
            )
    # "newest run" must mean newest by MEASUREMENT TIME, not by CLI
    # argument order (r9 advice: a caller passing runs out of order would
    # silently publish a stale total as the headline).  bench.py stamps
    # "ts"; runs missing it keep their relative CLI order (stable sort).
    runs.sort(key=lambda r: float(r.get("ts", 0)))
    # contended-run gate (mechanical, not curated): a run where bench's
    # own tripwire flagged >15% of keys as suspect_contention is a
    # contended host snapshot, not a band sample — its per-key maxes
    # would poison every anchor.  Drop such runs loudly, as long as at
    # least two clean runs remain (otherwise keep everything: a band
    # from one run is worse than a wide honest band).
    def _contended(r: dict) -> bool:
        n = max(len(r.get("queries") or {}), 1)
        return len(r.get("suspect_contention") or []) > 0.15 * n

    clean = [r for r in runs if not _contended(r)]
    if len(clean) >= 2 and len(clean) < len(runs):
        for r in runs:
            if _contended(r):
                print(
                    f"dropping contended run (ts={r.get('ts')}, total="
                    f"{r.get('value')}s, {len(r.get('suspect_contention') or [])} "
                    "suspect keys > 15% of the sweep)",
                )
        runs = clean
    # a band across runs at different scales (or protocols) is meaningless
    # and would silently poison the tripwire baseline: refuse to merge
    for field in ("sf", "reps", "metric"):
        vals = {json.dumps(r.get(field)) for r in runs}
        if len(vals) > 1:
            raise SystemExit(
                f"input runs disagree on {field!r}: {sorted(vals)} — "
                "merge only same-scale, same-protocol closed-tree runs"
            )
    keys: set[str] = set()
    for r in runs:
        keys |= set(r.get("queries") or {})
    queries: dict[str, float] = {}
    band: dict[str, list[float]] = {}
    for k in sorted(keys):
        vals = [float(r["queries"][k]) for r in runs if k in r.get("queries", {})]
        ok = [v for v in vals if v >= 0]
        if len(ok) < len(vals):  # any failed run must stay visible
            queries[k] = -1.0
            continue
        queries[k] = round(max(ok), 4)
        band[k] = [round(min(ok), 4), round(max(ok), 4)]
    totals = [float(r.get("value", -1)) for r in runs if float(r.get("value", -1)) >= 0]
    suspects = sorted({s for r in runs for s in r.get("suspect_contention", [])})
    if not totals:
        raise SystemExit(
            "every input run has a failed total (value < 0) — nothing to anchor"
        )
    base = dict(runs[-1])  # metric/unit/reps/sf from the newest run
    newest_total = float(runs[-1].get("value", -1))
    if newest_total < 0:
        # a failed newest run must not publish a negative headline while
        # value_band stays populated: fall back to the in-band max
        newest_total = max(totals)
    base.update(
        {
            "queries": queries,
            "queries_n": len(queries),
            # headline = the newest run's real measured total (inside
            # value_band); the sum-of-max-anchors upper bound is kept
            # under its own honest name
            "value": round(newest_total, 4),
            "value_sum_of_max": round(sum(v for v in queries.values() if v >= 0), 4),
            "value_band": [round(min(totals), 4), round(max(totals), 4)] if totals else [],
            "band": band,
            "runs_n": len(runs),
            "suspect_contention": suspects,
        }
    )
    return base


def compare_prev(prev: dict, merged: dict) -> dict:
    """Symmetric round-over-round comparison (r10 verdict item 4).

    The clean-run vs prev-band-MAX ratio the tripwire uses can flatter the
    new round (it compares this round's floor against last round's worst
    sample).  Record the symmetric numbers alongside it: band-floor vs
    band-floor totals over the SHARED keys, and the median per-key
    floor/floor ratio, so SCALE.md claims carry both automatically.
    """

    def _floor(art: dict, k: str) -> float:
        b = (art.get("band") or {}).get(k)
        if b:
            return float(b[0])
        return float(art["queries"][k])

    shared = [
        k
        for k, v in merged.get("queries", {}).items()
        if v >= 0 and float(prev.get("queries", {}).get(k, -1)) >= 0
    ]
    if not shared:
        return {"shared_keys_n": 0}
    new_floors = {k: _floor(merged, k) for k in shared}
    prev_floors = {k: _floor(prev, k) for k in shared}
    ratios = sorted(
        new_floors[k] / prev_floors[k] for k in shared if prev_floors[k] > 0
    )
    if not ratios or sum(prev_floors.values()) <= 0:
        # degenerate prev (every shared floor 0): no ratio is computable —
        # report the share count with a note instead of crashing (r11 advice)
        return {
            "shared_keys_n": len(shared),
            "note": "prev floors are all zero; ratios not computable",
        }
    mid = len(ratios) // 2
    median = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return {
        "shared_keys_n": len(shared),
        "floor_total_prev": round(sum(prev_floors.values()), 4),
        "floor_total_new": round(sum(new_floors.values()), 4),
        "floor_vs_floor_ratio": round(
            sum(new_floors.values()) / sum(prev_floors.values()), 4
        ),
        "median_key_floor_ratio": round(median, 4),
    }


def main() -> None:
    argv = list(sys.argv[1:])
    prev_path = None
    if "--prev" in argv:
        i = argv.index("--prev")
        if i + 1 >= len(argv):  # trailing --prev with no path: usage, not IndexError
            raise SystemExit(__doc__)
        prev_path = argv[i + 1]
        del argv[i : i + 2]
    if len(argv) < 2:
        raise SystemExit(__doc__)
    out, inputs = argv[0], argv[1:]
    payload = merge(inputs)
    if prev_path:
        with open(prev_path) as fh:
            prev = json.load(fh)
        payload["prev_compare"] = compare_prev(prev, payload)
        print(f"prev_compare vs {prev_path}: {payload['prev_compare']}")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(
        f"{out}: {payload['queries_n']} keys, newest-run total {payload['value']}s "
        f"(sum-of-max anchors {payload['value_sum_of_max']}s), "
        f"band {payload['value_band']}, runs {payload['runs_n']}"
    )


if __name__ == "__main__":
    main()
