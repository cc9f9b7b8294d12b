"""Round-6 waves 7-9: nonparametric tests (X125-X127), naive-Bayes /
PMI / shard balance (Y45-Y47), XML roundtrip (Z37), chained streaming
windows (Z38), palette histogram (MM6).  Each key is DuckDB-oracled;
these tests replay the statistics independently in pure Python (scipy
isn't in the container, so the replays are from the textbook formulas)
and pin the semantic properties the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import load_all_queries

SPECS = load_all_queries()


def _ks_python(pairs):
    """Exact two-sample KS over (value, group) pairs, pure Python."""
    a = sorted(v for v, g in pairs if g == 1)
    b = sorted(v for v, g in pairs if g == 0)
    xs = sorted(set(a) | set(b))
    import bisect

    d = 0.0
    for x in xs:
        f1 = bisect.bisect_right(a, x) / len(a)
        f2 = bisect.bisect_right(b, x) / len(b)
        d = max(d, abs(f1 - f2))
    return d


def test_ks_statistic_matches_pure_python(spark, sf_dir):
    row = SPECS["abtest_ks_statistic"].fn(spark, sf_dir).collect()[0]
    src = [
        (int(r.x), int(r.g))
        for r in table(spark, sf_dir, "orders")
        .select(
            F.floor("o_totalprice").alias("x"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("int")
            .alias("g"),
        )
        .collect()
    ]
    d = _ks_python(src)
    assert row.ks_micro == int(d * 1_000_000 + 0.5 + 1e-9)
    assert row.n1 == sum(1 for _, g in src if g == 1)
    assert row.n2 == sum(1 for _, g in src if g == 0)
    # D is a probability distance: bounded in [0, 1]
    assert 0 <= row.ks_micro <= 1_000_000


def test_mannwhitney_u_matches_midrank_formula(spark, sf_dir):
    row = SPECS["orders_mannwhitney_u"].fn(spark, sf_dir).collect()[0]
    src = [
        (int(r.x), int(r.g))
        for r in table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .where(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") * 100).alias("x"),
            (F.col("event_type") == "purchase").cast("int").alias("g"),
        )
        .collect()
    ]
    # textbook midranks over the pooled sample
    pooled = sorted(src)
    ranks: dict[int, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        ranks[pooled[i][0]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    n1 = sum(g for _, g in src)
    r1 = sum(ranks[x] for x, g in src if g == 1)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert row.u1_x2 == int(round(2 * u1))
    assert row.n1 == n1 and row.n2 == len(src) - n1
    # U is bounded by n1*n2; doubled statistic by the doubled product
    assert 0 <= row.u1_x2 <= 2 * row.n1 * row.n2
    assert row.eu1_x2 == row.n1 * row.n2


def test_naive_bayes_covers_heldout_and_is_deterministic(spark, sf_dir):
    """The confusion matrix must cover every held-out doc exactly once
    with predictions drawn from the training label set, and the argmax
    tie-break must make repeated runs bit-identical.  (No accuracy bar:
    this synthetic corpus draws all languages from ONE shared token pool,
    so lang labels are statistically independent of text and chance-level
    accuracy is the correct behavior for a correct classifier.)"""
    rows = SPECS["text_naive_bayes_lang"].fn(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    held = (
        docs.where((F.col("doc_id") % 5 == 0) & (F.trim("text") != ""))
        .count()
    )
    assert sum(r.n_docs for r in rows) == held
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert {r.pred_lang for r in rows} <= langs
    assert {r.actual_lang for r in rows} <= langs
    again = SPECS["text_naive_bayes_lang"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pmi_pairs_respect_support_and_symmetry(spark, sf_dir):
    rows = SPECS["text_pmi_cooccurrence"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.n_ab >= 5
        assert r.tok_a < r.tok_b  # canonical pair orientation, no mirrors
    # descending by pmi with (tok_a, tok_b) tie-break
    keys = [(-r.pmi_micro, r.tok_a, r.tok_b) for r in rows]
    assert keys == sorted(keys)


def test_shard_balance_partitions_the_corpus(spark, sf_dir):
    rows = SPECS["docs_shard_token_balance"].fn(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.tokens_permille for r in rows) <= 1000  # floors round down
    assert {r.shard for r in rows} <= set("0123456789abcdef")


def test_theilsen_is_outlier_robust(spark):
    """Pin the estimator's defining property on a constructed frame: a
    one-month revenue spike leaves the pairwise-median slope at the true
    trend where the OLS slope is dragged."""
    base = [(m, 1000 + 50 * m) for m in range(24)]
    spiked = [(m, c + (900_000 if m == 12 else 0)) for m, c in base]
    pairs = [
        (cb - ca) / (mb - ma)
        for i, (ma, ca) in enumerate(spiked)
        for mb, cb in spiked[i + 1 :]
    ]
    pairs.sort()
    median = pairs[(len(pairs) + 1) // 2 - 1]
    assert median == 50.0  # robust: the spike never reaches the median
    n = len(spiked)
    sx = sum(m for m, _ in spiked)
    sy = sum(c for _, c in spiked)
    sxx = sum(m * m for m, _ in spiked)
    sxy = sum(m * c for m, c in spiked)
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(ols - 50.0) > 100  # OLS is dragged far off by the spike


def test_chained_windows_rollup_consistency(spark, sf_dir):
    """Every emitted 6-hour window must equal the sum of its batch hourly
    counts, and peak <= total."""
    rows = SPECS["stream_chained_windows"].fn(spark, sf_dir).collect()
    hourly = {
        (r.h6, r.event_type): (int(r.total), int(r.peak))
        for r in table(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "1 hour").alias("w1"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .groupBy(
            F.date_format(
                F.window(F.col("w1.start"), "6 hours").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("h6"),
            "event_type",
        )
        .agg(F.sum("n").alias("total"), F.max("n").alias("peak"))
        .collect()
    }
    assert len(rows) > 0
    for r in rows:
        total, peak = hourly[(r.w6_start, r.event_type)]
        assert (int(r.n_events), int(r.peak_hour_n)) == (total, peak)
        assert r.peak_hour_n <= r.n_events


def test_palette_histogram_accounts_every_pixel(spark, sf_dir):
    rows = SPECS["multimodal_palette_histogram"].fn(spark, sf_dir).collect()
    docs = [r.doc_id for r in table(spark, sf_dir, "documents").select("doc_id").collect()]
    expected_px = sum((4 + d % 13) * (3 + d % 11) for d in docs)
    assert sum(r.n_pixels for r in rows) == expected_px
    assert all(0 <= r.bucket <= 7 for r in rows)
    assert max(r.n_images for r in rows) <= len(docs)


def test_xml_roundtrip_totals_match_source(spark, sf_dir):
    rows = SPECS["sink_xml_roundtrip"].fn(spark, sf_dir).collect()
    src = table(spark, sf_dir, "orders")
    assert sum(r.n_orders for r in rows) == src.count()
    total = src.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert sum(r.rev_cents for r in rows) == total
