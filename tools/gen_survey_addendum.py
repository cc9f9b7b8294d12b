"""Regenerate SURVEY.md §8 (the implementation addendum) from the live
registry.  Run after adding query keys:  python tools/gen_survey_addendum.py
"""

from __future__ import annotations

import pathlib
import re

from debias_spark.registry import load_all_queries

MARK = "## §8 Implementation addendum (live registry)"
# Replace from the first §8 heading (any title suffix) to end of file, so
# retitled or duplicated sections collapse back into one generated section.
MARK_RE = r"## §8 Implementation addendum.*\Z"


def build_section() -> str:
    qs = load_all_queries()
    lines = [
        MARK,
        "",
        "Every declared operator key, its implementing module under",
        "`debias_spark/queries/`, and its correctness gate.  Generated from the",
        "live registry (`python tools/gen_survey_addendum.py`);",
        "`__spark_entry__.queries()` / `oracle_sql()` expose exactly this set",
        "to the driver.",
        "",
        "| § | query key | module | gate |",
        "|---|---|---|---|",
    ]
    for name, spec in sorted(qs.items(), key=lambda kv: (kv[1].section, kv[0])):
        mod = spec.fn.__module__.split(".")[-1]
        oracle = "duckdb-oracle" if spec.oracle else "rows-only + property test"
        lines.append(f"| {spec.section} | `{name}` | {mod} | {oracle} |")
    n_total = len(qs)
    n_oracled = sum(1 for s in qs.values() if s.oracle)
    lines += [
        "",
        f"**Totals:** {n_total} keys, {n_oracled} with DuckDB value oracles, "
        f"{n_total - n_oracled} rows-only (sketch/MLlib/streaming internals),",
        "each of which carries a set-level property or batch-equivalence test",
        "instead (tests/test_llm_ops_properties.py, tests/test_streaming.py,",
        "tests/test_report_and_stateful.py).",
        "",
        "Beyond the §2 inventory, the build adds: end-to-end pipeline surface",
        "(pipeline.py, cli.py, sources/, report.py), skew utilities + bucketing",
        "evidence (operators/skew.py, tests/test_scale_techniques.py), plan",
        "invariants (plans.py, tests/test_plan_invariants.py), and the scale",
        "design notes in SCALE.md.",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    path = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    text = path.read_text()
    section = build_section()
    if re.search(MARK_RE, text, flags=re.S):
        text = re.sub(MARK_RE, section, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n---\n\n" + section
    path.write_text(text)
    print(f"SURVEY.md §8 regenerated: {section.count(chr(10))} lines")


if __name__ == "__main__":
    main()
