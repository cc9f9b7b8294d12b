"""Deduplication operators, Spark-first.

All sketches are built from deterministic hash functions (xxhash64 with
per-hash salts), so results are reproducible across runs and cluster sizes —
no fitted models, no RNG state.  Everything below is pure DataFrame API:
higher-order array functions stay inside codegen; the only shuffles are the
band-bucket exchange and the final aggregate.

Scale notes (100 TB):
* Exact dedup is a single hash aggregate on the text (or a text digest —
  group by md5 first so the shuffle carries 16 bytes, not documents).
* MinHash-LSH candidate generation is linear: each doc emits `bands` rows;
  verification joins each doc against its bucket representative only
  (O(n*bands) verifications), never all-pairs.
* SimHash blocks on the top bits of the fingerprint, so the self-join is
  per-block, not global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (empty tokens dropped)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def word_shingles(text: Column, n: int) -> Column:
    """Distinct n-word shingles; n=1 degenerates to the distinct token set
    (appropriate for bag-of-words corpora where sequence is uninformative)."""
    toks = word_tokens(text)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays, as a double."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_distinct(F.concat(a, b))).cast("double")
    return inter / union


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: element h = min over shingles of xxhash64(s, h).
    Salting via a second hash argument gives num_hashes independent
    permutation approximations with zero stored state."""
    hashes = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        hashes,
        lambda h: F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, h))),
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band hashes: hash of each contiguous signature slice.  Two docs
    collide in a band iff that slice matches exactly."""
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    return F.transform(
        band_ids,
        lambda b: F.xxhash64(F.slice(signature, b * rows_per_band + 1, rows_per_band), b),
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 1,
    num_hashes: int = 32,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-duplicate detection: shingle -> minhash -> band ->
    bucket-join -> verify.

    Returns (id, rep_id, jaccard) rows where rep_id = the smallest doc id in
    a shared LSH bucket and exact shingle-Jaccard >= threshold.  Verifying
    only against the bucket representative keeps verification linear in
    corpus size — the standard cluster-by-bucket dedup shape, not an
    all-pairs join.
    """
    from pyspark.sql.window import Window

    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)
    # Bands only — the heavy signature expression is evaluated exactly once
    # per doc, and the band shuffle carries (id, band) rows, not shingles.
    banded = sh.select(
        "id",
        F.posexplode(
            lsh_bands(minhash_signature(F.col("sh"), num_hashes), bands, rows_per_band)
        ).alias("band_id", "band_hash"),
    )
    # bucket representative = min id per (band_id, band_hash): a window min
    # on the single band shuffle (no second aggregate + join pass)
    w = Window.partitionBy("band_id", "band_hash")
    cand = (
        banded.withColumn("rep_id", F.min("id").over(w))
        .filter(F.col("id") > F.col("rep_id"))
        .select("id", "rep_id")
        .dropDuplicates(["id", "rep_id"])
    )
    # verification joins re-attach shingles (cheap to recompute) per side
    a_sh = sh
    b_sh = sh.select(F.col("id").alias("rep_id"), F.col("sh").alias("rep_sh"))
    return (
        cand.join(a_sh, "id")
        .join(b_sh, "rep_id")
        .select(
            "id",
            "rep_id",
            F.round(jaccard(F.col("sh"), F.col("rep_sh")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def duplicate_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    pair_cols: tuple[str, str] = ("id", "rep_id"),
    max_iter: int = 10,
) -> DataFrame:
    """Connected components over a near-dup pair graph: every doc gets the
    min doc-id of its component as cluster_id — the dedup endgame (pairs ->
    clusters -> keep one representative per cluster).

    Iterative min-label propagation: per round, each node takes the min of
    its own label and its neighbors' labels.  Converges in O(diameter)
    rounds (near-dup graphs are dense, so diameter is tiny); iteration is
    driver-controlled with localCheckpoint() per round to truncate lineage
    — the standard Spark shape for iterative algorithms without GraphX.
    Genuinely non-SQL-expressible (recursive), hence rows-only + property
    tests.
    """
    a, b = pair_cols
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        # _chg is computed in the same projection (nbr_label < label) so the
        # convergence check is a scan of the already-materialized checkpoint
        # blocks — no extra join against the previous round's labels.
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.coalesce(F.col("nbr_label") < F.col("label"), F.lit(False)).alias(
                    "_chg"
                ),
            )
            .localCheckpoint(eager=True)  # truncate lineage each round
        )
        changed = new_labels.filter("_chg").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias(id_col),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


def with_simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sh): 64-bit SimHash over the distinct token set — bit b of the
    fingerprint is the majority vote of bit b across xxhash64(token) values.
    Built with SQL lambdas because shift amounts are expressions (the Python
    shiftleft/shiftright API only takes literal counts)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.array_distinct(word_tokens(F.col(text_col))).alias("toks"),
        )
        .withColumn("th", F.transform("toks", lambda t: F.xxhash64(t)))
        .withColumn(
            "bits",
            F.expr(
                "transform(sequence(0, 63), b -> "
                "CASE WHEN size(filter(th, h -> ((h >> b) & 1) = 1)) * 2 >= size(th) "
                "THEN 1 ELSE 0 END)"
            ),
        )
        .withColumn(
            "sh",
            F.expr(
                "aggregate(zip_with(bits, sequence(0, 63), "
                "(bit, b) -> shiftleft(CAST(bit AS BIGINT), b)), "
                "CAST(0 AS BIGINT), (acc, x) -> acc | x)"
            ),
        )
        .select("id", "sh")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: block on the top ``block_bits`` of the
    fingerprint (identical-prefix candidates only), then filter by Hamming
    distance.  Blocking keeps the self-join per-block instead of global;
    rotate-block multi-probe is the standard extension at higher recall."""
    sh = with_simhash64(df, id_col, text_col)
    sh = sh.withColumn("block", F.shiftright("sh", 64 - block_bits))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "block")
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "block")
    # shuffle_hash, not broadcast: a broadcast build would evaluate the
    # (interpreted, higher-order-function) fingerprint single-threaded on
    # the driver; the shuffle evaluates it once per row, fully parallel,
    # and both join inputs then read materialized values.  At 100 TB the
    # fingerprint table can't broadcast anyway.
    return (
        a.hint("shuffle_hash").join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
