"""Schema-drift regression net: the driver regenerates the testdata
parquet between rounds and its physical types have drifted before
(TIMESTAMP(NANOS) events.ts, narrower ints).  tools/drift_check.py runs
the FULL sweep; this test keeps the most drift-SENSITIVE keys green in
every suite run against a freshly manufactured drift copy — NANOS
timestamps with sub-µs ties (every ts ORDER BY tie-break crosses the
truncation), INT32 n_chars, SMALLINT l_linenumber.
"""

from __future__ import annotations

import pytest

from debias_spark.registry import load_all_queries
from debias_spark.testing import compare_to_oracle

# ts-ordering / n_chars / linenumber consumers — the drift blast radius
SENSITIVE = [
    "event_dwell_time",          # lead() ordered by ts — the round-2 ADVICE case
    "scd2_user_status",          # islands keyed on (ts, event_id) ordering
    "sessionize_batch",          # gap windows over ts
    "events_rolling_dau7",       # ts -> date
    "window_tumbling_event_time",
    "events_latency_percentiles_hourly",  # hourly percentile groups over ts
    "stream_rate_alert",         # streaming read of the NANOS file
    "docs_compaction_plan",      # n_chars arithmetic
    "docs_token_budget_curve",   # n_chars div tokens scoring
    "dedup_near_editdistance",   # n_chars blocking + length band
    "lineitem_weighted_median_price",  # l_linenumber tiebreak arithmetic
]


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory):
    from tools.drift_check import build_drift_copy

    dst = str(tmp_path_factory.mktemp("drift"))
    build_drift_copy("/root/testdata/sf0.001", dst)
    return dst


@pytest.mark.parametrize("name", SENSITIVE)
def test_drift_sensitive_key(name, spark, drift_dir):
    spec = load_all_queries()[name]
    df = spec.fn(spark, drift_dir)
    if spec.oracle is None:
        assert df.count() > 0
    else:
        compare_to_oracle(df, spec.oracle, drift_dir)
