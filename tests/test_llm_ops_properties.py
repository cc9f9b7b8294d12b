"""Set-level property checks for the sketch-based operators (the ones whose
internals are not SQL-expressible) + the annotator's pure client, which gets
a hypothesis sweep."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debias_spark.annotate import LexiconClient
from debias_spark.catalog import table
from debias_spark.operators.dedup import jaccard, minhash_dedup, word_shingles
from debias_spark.operators.similarity import cosine_topk
from debias_spark.registry import load_all_queries

SPECS = load_all_queries()


def test_hll_sketch_union_within_tolerance(spark, sf_dir):
    """The day-sketch union estimate is within ±5% of the flat exact
    distinct count (the query now emits that band as union_in_band — its
    banded oracle's driver hash depends on it), and the day/event
    bookkeeping columns are exact."""
    row = SPECS["agg_hll_sketch_union"].fn(spark, sf_dir).collect()[0]
    ev = table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    assert row.n_events == ev.count()
    assert row.n_days == ev.select(F.to_date("ts")).distinct().count()
    assert row.exact_uniques == exact
    assert row.union_in_band is True


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL estimate within ±5% of the exact distinct count per group (the
    query emits the band as approx_in_band for its banded oracle)."""
    rows = SPECS["agg_approx_distinct"].fn(spark, sf_dir).collect()
    exact = {
        r.event_type: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.approx_in_band is True, (r.event_type, exact[r.event_type])


def test_minhash_pairs_truly_near(spark, sf_dir):
    """Every reported near-dup pair must verify against ground truth: exact
    unigram Jaccard >= threshold, rep strictly smaller."""
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, "doc_id", "text", shingle_n=1, threshold=0.8)
    sh = docs.select(
        F.col("doc_id").alias("k"), word_shingles(F.col("text"), 1).alias("sh")
    )
    joined = (
        pairs.join(sh.withColumnRenamed("k", "id").withColumnRenamed("sh", "sa"), "id")
        .join(
            sh.withColumnRenamed("k", "rep_id").withColumnRenamed("sh", "sb"), "rep_id"
        )
        .withColumn("true_j", jaccard(F.col("sa"), F.col("sb")))
        .collect()
    )
    assert len(joined) > 0
    assert all(r.id > r.rep_id for r in joined)
    assert all(r.true_j >= 0.8 for r in joined)
    assert all(abs(r.true_j - r.jaccard) < 1e-3 for r in joined)


def test_minhash_codegen_path_matches_spec(spark, sf_dir):
    """The production explode+agg minhash signature (minhash_banded) must be
    element-for-element identical to the array-lambda SPEC form
    (minhash_signature) — the codegen rewrite may change speed, not values."""
    from debias_spark.operators.dedup import minhash_banded, minhash_signature

    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("id"), word_shingles(F.col("text"), 1).alias("sh")
    ).filter(F.size("sh") > 0)
    spec = sh.select(
        "id", F.posexplode(minhash_signature(F.col("sh"), 8)).alias("i", "v")
    )
    # the production signature, one row per (id, element) to line up with spec
    from debias_spark.operators.dedup import MINHASH_P, h60, minhash_params

    ex = sh.select("id", F.explode("sh").alias("s")).withColumn(
        "base", h60(F.col("s")) % F.lit(MINHASH_P)
    )
    flat = ex.groupBy("id").agg(
        *[
            F.min((F.col("base") * a + b) % F.lit(MINHASH_P)).alias(f"h{h}")
            for h, (a, b) in enumerate(minhash_params(8))
        ]
    )
    prod = flat.select(
        "id",
        F.posexplode(F.array(*[F.col(f"h{h}") for h in range(8)])).alias("i", "pv"),
    )
    joined = spec.join(prod, ["id", "i"])
    assert joined.count() == sh.count() * 8
    assert joined.filter("v <> pv").count() == 0
    # and the banded form runs end-to-end on the same frame
    assert minhash_banded(sh, num_hashes=8, bands=2).count() == sh.count() * 2


def test_simhash_codegen_path_matches_spec(spark, sf_dir):
    """The packed-lane simhash fingerprint must equal the interpreted
    array-lambda specification bit-for-bit on every non-empty doc."""
    from debias_spark.operators.dedup import with_simhash64

    docs = table(spark, sf_dir, "documents")
    spec = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.array_distinct(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
            ).alias("toks"),
        )
        .filter(F.size("toks") > 0)
        .withColumn(
            "th",
            F.expr(
                "transform(toks, t -> "
                "CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT))"
            ),
        )
        .withColumn(
            "bits",
            F.expr(
                "transform(sequence(0,59), b -> CASE WHEN "
                "size(filter(th, h -> ((h >> b) & 1) = 1)) * 2 >= size(th) "
                "THEN 1 ELSE 0 END)"
            ),
        )
        .withColumn(
            "sh",
            F.expr(
                "aggregate(zip_with(bits, sequence(0,59), "
                "(bit,b) -> shiftleft(CAST(bit AS BIGINT), b)), "
                "CAST(0 AS BIGINT), (acc,x) -> acc | x)"
            ),
        )
        .select("id", "sh")
    )
    prod = with_simhash64(docs, "doc_id", "text")
    assert prod.count() == spec.count()
    assert prod.alias("n").join(spec.alias("o"), "id").filter("n.sh <> o.sh").count() == 0


def test_vectorized_similarity_paths_match_spec(spark, sf_dir):
    """The Arrow-vectorized LSH bucket and IVF cell assignment must agree
    row-for-row with their expression-level spec forms."""
    from debias_spark.operators.similarity import (
        assign_cell,
        assign_cell_vectorized,
        hyperplanes,
        kmeans_fit_sample,
        lsh_bucket,
        lsh_bucket_vectorized,
    )

    emb = table(spark, sf_dir, "embeddings")
    planes = hyperplanes(4, 64)
    assert (
        emb.select(
            lsh_bucket(F.col("embedding"), planes).alias("a"),
            lsh_bucket_vectorized(planes)(F.col("embedding")).alias("b"),
        )
        .filter("a <> b")
        .count()
        == 0
    )
    cent = kmeans_fit_sample(emb, "embedding", k=8, fraction=0.5, seed=42)
    assert (
        emb.select(
            assign_cell(F.col("embedding"), cent).alias("a"),
            assign_cell_vectorized(cent)(F.col("embedding")).alias("b"),
        )
        .filter("a <> b")
        .count()
        == 0
    )


def test_ann_lsh_scores_are_exact_cosines(spark, sf_dir):
    """The ANN path approximates the candidate SET, never the scores: every
    returned sim must equal the brute-force cosine for that pair."""
    emb = table(spark, sf_dir, "embeddings")
    ann = SPECS["similarity_ann_lsh"].fn(spark, sf_dir).collect()
    exact = {
        (r.query_id, r.cand_id): r.sim
        for r in cosine_topk(emb, F.col("vec_id") < 10, k=10**9).collect()
    }
    assert len(ann) > 0
    for r in ann:
        assert r.query_id < 10
        assert exact[(r.query_id, r.cand_id)] == r.sim


def test_chunking_reconstructs_documents(spark, sf_dir):
    """Chunk coverage property: the stride-aligned prefix of each chunk
    (first 32 tokens) concatenated in chunk order reconstructs the exact
    original token stream — no token lost or duplicated by the fan-out."""
    from debias_spark.operators.text import distinct_tokens  # noqa: F401

    chunks = SPECS["text_chunk_documents"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: [t for t in r.text.lower().split() if t]
        for r in table(spark, sf_dir, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == {d for d, toks in docs.items() if toks}
    for doc_id, cl in by_doc.items():
        cl.sort(key=lambda c: c.chunk_idx)
        rebuilt = []
        for c in cl:
            rebuilt.extend(c.chunk_text.split()[:32])  # stride-aligned prefix
        assert rebuilt == docs[doc_id], doc_id
        # overlap property: chunk i's tokens past the stride reappear in i+1
        for a, b in zip(cl, cl[1:]):
            tail = a.chunk_text.split()[32:]
            assert b.chunk_text.split()[: len(tail)] == tail


def test_dedup_clusters_invariants(spark, sf_dir):
    """Connected-components correctness: both endpoints of every near-dup
    pair share a cluster; cluster_id is the min member; sizes consistent."""
    from debias_spark.operators.dedup import duplicate_clusters, minhash_dedup

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, "doc_id", "text", shingle_n=1, threshold=0.8)
    ids = docs.select(F.col("doc_id").alias("id"))
    clusters = duplicate_clusters(ids, pairs, id_col="id", pair_cols=("id", "rep_id"))
    label = {r.id: r.cluster_id for r in clusters.collect()}
    sizes = {r.id: r.cluster_size for r in clusters.collect()}
    assert set(label) == {r.id for r in ids.collect()}  # every doc labeled
    for p in pairs.collect():  # pair endpoints co-clustered
        assert label[p.id] == label[p.rep_id], (p.id, p.rep_id)
    for node, lab in label.items():
        assert lab <= node  # min-label: never above own id
        assert label[lab] == lab  # the representative is its own cluster
    from collections import Counter

    true_sizes = Counter(label.values())
    assert all(sizes[n] == true_sizes[label[n]] for n in label)


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(
        st.text(alphabet=st.sampled_from("ab slowbig "), max_size=30), max_size=5
    ),
    language=st.sampled_from(["en", "de", "xx"]),
)
def test_lexicon_client_properties(values, language):
    """Pure-client invariants for arbitrary input: one result per value,
    literals echoed, tags deduped, every tag literal a token of its line."""
    out = LexiconClient()(values, language)
    results = out["results"]
    assert [r["literal"] for r in results] == values
    for v, r in zip(values, results):
        tokens = v.lower().split()
        lits = [t["literal"] for t in r["tags"]]
        assert len(lits) == len(set(lits))
        assert all(lit in tokens for lit in lits)


def test_dedup_pipeline_survivor_invariants(spark, sf_dir):
    """End-to-end dedup composition: (a) survivors are distinct real docs,
    (b) every pair the pipeline DETECTED was removed — no detected near-dup
    pair has both endpoints surviving (LSH recall is probabilistic, so the
    invariant is over detected pairs, not ground-truth pairs), (c) exact
    copies + cluster sizes account for the whole corpus exactly once."""
    from debias_spark.operators.dedup import minhash_dedup

    docs = table(spark, sf_dir, "documents")
    out = SPECS["dedup_pipeline_survivors"].fn(spark, sf_dir).collect()
    survivor_ids = {r.doc_id for r in out}
    assert len(survivor_ids) == len(out)  # distinct
    assert survivor_ids <= {r.doc_id for r in docs.select("doc_id").collect()}
    # (b) recompute the detected pair set over the exact-unique reps
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""), r" +", " "
        )
    )
    from pyspark.sql.window import Window as W

    reps = (
        docs.select("doc_id", "text", F.md5(norm).alias("d"))
        .withColumn("rep_id", F.min("doc_id").over(W.partitionBy("d")))
        .filter(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    pairs = minhash_dedup(reps, "doc_id", "text", shingle_n=1, threshold=0.8).collect()
    assert len(pairs) > 0
    both_survive = [
        (p.id, p.rep_id)
        for p in pairs
        if p.id in survivor_ids and p.rep_id in survivor_ids
    ]
    assert both_survive == [], both_survive
    # (c) every doc counted once: exact-copy counts sum over clusters
    n_reps = reps.count()
    assert sum(r.cluster_size for r in out) == n_reps
    assert sum(r.n_exact_copies for r in out) <= docs.count()


def test_approx_percentiles_within_rank_tolerance(spark, sf_dir):
    """approx_percentile estimates must sit within ~2% RANK error of the
    requested quantile per group (the sketch's contract at accuracy=100 is
    ~1% rank error; doubled for slack on small groups)."""
    rows = SPECS["agg_percentiles_approx"].fn(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    for r in rows:
        grp = li.filter(F.col("l_returnflag") == r.l_returnflag)
        n = grp.count()
        for col, est, q in (
            ("l_quantity", r.p50_qty, 0.5),
            ("l_extendedprice", r.p90_price, 0.9),
        ):
            rank = grp.filter(F.col(col) <= est).count() / n
            assert abs(rank - q) <= 0.02 + 1.0 / n, (
                r.l_returnflag, col, est, rank, q
            )


def test_mllib_minhash_distance0_pairs_are_exact_token_set_dups(spark, sf_dir):
    """Y4's oracle contract, proven from first principles: the MLlib
    pipeline's distance-0 pair set must (a) contain every identical-TEXT
    pair (LSH cannot miss identical vectors — they share every signature)
    and (b) contain only pairs whose distinct lowercased token sets are
    equal (distance 0 on binary HashingTF vectors)."""
    import re

    pairs = {
        (r.id_a, r.id_b)
        for r in SPECS["dedup_minhash_mllib"].fn(spark, sf_dir).collect()
    }
    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}
    ws = re.compile(r"\s+")
    toksets = {
        d: frozenset(t for t in ws.split(txt.lower()) if t) for d, txt in docs.items()
    }
    # (a) identical text => must be found
    by_text = {}
    for d, txt in docs.items():
        by_text.setdefault(txt, []).append(d)
    exact_pairs = {
        (a, b)
        for ids in by_text.values()
        for a in ids
        for b in ids
        if a < b and toksets[a]  # empty-token docs are dropped by contract
    }
    assert exact_pairs <= pairs, f"LSH missed exact pairs: {exact_pairs - pairs}"
    # (b) every returned pair has equal token sets
    for a, b in pairs:
        assert toksets[a] == toksets[b], (a, b)
    assert pairs, "corpus should contain planted exact duplicates"
