"""Round-9 wave 2 (Y71): LSH band-count autotune — the fourth
diagnose->remedy loop (Z66 salt, X161 CBO reorder, Y67 ANN planes, now
the MinHash band layout): measure candidate volume, precision, and
pooled recall for three band layouts from ONE signature build, choose
the cheapest layout meeting the recall floor, and report the decision
as data.

Reference parity: the reference has no dedup at all; this is the
band-table sizing decision a 100 TB MinHash index build makes before
committing to a layout (banding theory: with 32 hashes, fewer bands =
longer band rows = fewer, higher-precision candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.operators.dedup import MINHASH_P, jaccard, minhash_params
from debias_spark.queries.llm_ops import _band_selects_duck, _DUCK_TOKENS, _h60_duck
from debias_spark.registry import register

_NH = 32
_BAND_CHOICES = (2, 4, 8)  # candidate layouts; 8 bands = loosest = truth pool
_RECALL_FLOOR_BP = 9000
_JACC_MIN = 0.8
# the tuning runs on a fixed probe shard, not the corpus: the layout
# decision needs RELATIVE recall/cost, and the loosest layout's candidate
# volume is quadratic-leaning on a near-duplicate-rich corpus — measured
# 406s at sf0.1 full-corpus vs ~3s on the shard, identical decision
_PROBE_MOD = 10

_JAC = (
    "round(len(list_intersect(a.sh, b.sh))::DOUBLE"
    " / len(list_distinct(a.sh || b.sh)), 4)"
)


def _autotune_oracle() -> str:
    sig_cols = ", ".join(
        f"min(((({_h60_duck('s')}) % {MINHASH_P}) * {a} + {b}) % {MINHASH_P})"
        f" AS h{h}"
        for h, (a, b) in enumerate(minhash_params(_NH))
    )
    per_band = []
    stats = []
    for nb in _BAND_CHOICES:
        per_band.append(f"""
    banded{nb} AS ({_band_selects_duck(_NH, nb)}),
    cand{nb} AS (
        SELECT DISTINCT x.id AS i, y.id AS j
        FROM banded{nb} x JOIN banded{nb} y
          ON x.band_id = y.band_id AND x.band_hash = y.band_hash
         AND x.id < y.id
    ),
    ver{nb} AS (
        SELECT c.i, c.j FROM cand{nb} c
        JOIN sh a ON a.id = c.i JOIN sh b ON b.id = c.j
        WHERE {_JAC} >= {_JACC_MIN}
    )""")
        stats.append(f"""
        SELECT {nb} AS bands,
               (SELECT count(*) FROM cand{nb}) AS n_cand,
               (SELECT count(*) FROM ver{nb}) AS n_ver,
               (SELECT count(*) FROM ver{nb} v
                JOIN ver{_BAND_CHOICES[-1]} t ON t.i = v.i AND t.j = v.j)
                   AS n_hit""")
    return f"""
    WITH sh AS MATERIALIZED (
        SELECT doc_id AS id, {_DUCK_TOKENS} AS sh FROM documents
        WHERE doc_id % {_PROBE_MOD} = 0 AND len({_DUCK_TOKENS}) > 0
    ), ex AS (
        SELECT id, unnest(sh) AS s FROM sh
    ), sig AS MATERIALIZED (
        SELECT id, {sig_cols} FROM ex GROUP BY id
    ),{",".join(per_band)},
    stats AS MATERIALIZED ({" UNION ALL ".join(stats)}),
    truth AS (SELECT n_ver AS n_true FROM stats WHERE bands = {_BAND_CHOICES[-1]}),
    rep AS (
        SELECT bands,
               CAST(n_cand AS BIGINT) AS n_cand,
               CAST(n_ver AS BIGINT) AS n_verified,
               CAST(n_ver * 10000 // nullif(n_cand, 0) AS BIGINT)
                   AS precision_bp,
               CAST(n_hit * 10000 // nullif((SELECT n_true FROM truth), 0)
                    AS BIGINT) AS recall_bp
        FROM stats
    ), picked AS (
        SELECT bands FROM rep
        ORDER BY (recall_bp >= {_RECALL_FLOOR_BP}) DESC,
                 CASE WHEN recall_bp >= {_RECALL_FLOOR_BP}
                      THEN -bands ELSE recall_bp END DESC,
                 bands ASC
        LIMIT 1
    )
    SELECT r.bands, r.n_cand, r.n_verified, r.precision_bp, r.recall_bp,
           CAST(CASE WHEN r.bands = (SELECT bands FROM picked)
                     THEN 1 ELSE 0 END AS BIGINT) AS chosen
    FROM rep r ORDER BY r.bands
    """


@register("dedup_band_autotune", "Y71", oracle=_autotune_oracle())
def dedup_band_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-layout autotune: from ONE 32-hash signature build, band
    the corpus three ways (2/4/8 bands), measure each layout's candidate
    volume, verified-pair precision, and recall against the pooled truth
    (the loosest layout's verified pairs — the standard pooled-recall
    protocol when exact all-pairs truth is unaffordable), then choose
    the layout with the FEWEST candidate pairs (fewest bands) meeting a
    90% recall floor — falling back to best recall if none does.  The
    decision ships as a data column, so the oracle re-derives it from
    the same measurements.

    Scale shape: signatures are built once (codegen explode + 32 min
    aggregates) and localCheckpointed; each layout adds only its band
    hashes and a bucket self-join (never all-pairs), and every verified
    set is bounded by its candidates.  At 100 TB this report is run on a
    fixed sample shard, and the chosen layout sizes the full index
    build — candidate volume IS the cost model, which is why it is the
    tiebreak.  The probe shard here is doc_id % 10 == 0 (spelled
    identically in the oracle): tuning needs the layouts' RELATIVE
    behavior, and the loosest layout's candidate volume over a
    near-dup-rich full corpus is the one cost this key exists to avoid
    paying blind."""
    from debias_spark.operators.dedup import (
        bands_from_sig,
        minhash_sig_wide,
        word_shingles,
    )

    docs = table(spark, sf_dir, "documents")
    sh = (
        docs.filter(F.col("doc_id") % _PROBE_MOD == 0)
        .select(
            F.col("doc_id").alias("id"), word_shingles(F.col("text"), 1).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True)  # reused by sig build + 2 jaccard joins
    )
    sig = minhash_sig_wide(sh, _NH).localCheckpoint(eager=True)  # reused 3x

    a_sh = sh.select(F.col("id").alias("i"), F.col("sh").alias("a_sh"))
    b_sh = sh.select(F.col("id").alias("j"), F.col("sh").alias("b_sh"))
    rep = None
    vers: dict[int, DataFrame] = {}
    for nb in _BAND_CHOICES:
        banded = bands_from_sig(sig, _NH, nb)
        x = banded.select("id", "band_id", "band_hash")
        y = banded.select(
            F.col("id").alias("y_id"),
            F.col("band_id").alias("y_band"),
            F.col("band_hash").alias("y_hash"),
        )
        cand = (
            x.join(
                y,
                (F.col("band_id") == F.col("y_band"))
                & (F.col("band_hash") == F.col("y_hash"))
                & (F.col("id") < F.col("y_id")),
            )
            .select(F.col("id").alias("i"), F.col("y_id").alias("j"))
            .distinct()
        )
        ver = (
            cand.join(a_sh, "i")
            .join(b_sh, "j")
            .filter(F.round(jaccard(F.col("a_sh"), F.col("b_sh")), 4) >= _JACC_MIN)
            .select("i", "j")
            .localCheckpoint(eager=True)  # reused: count + truth intersection
        )
        vers[nb] = ver
        row = (
            cand.agg(F.count("*").alias("n_cand"))
            .crossJoin(ver.agg(F.count("*").alias("n_verified")))
            .select(F.lit(nb).alias("bands"), "n_cand", "n_verified")
        )
        rep = row if rep is None else rep.unionByName(row)

    truth = vers[_BAND_CHOICES[-1]]
    hits = None
    for nb in _BAND_CHOICES:
        h = (
            vers[nb]
            .join(
                truth.select(F.col("i").alias("t_i"), F.col("j").alias("t_j")),
                (F.col("i") == F.col("t_i")) & (F.col("j") == F.col("t_j")),
            )
            .agg(F.lit(nb).alias("h_bands"), F.count("*").alias("n_hit"))
        )
        hits = h if hits is None else hits.unionByName(h)

    n_true = truth.agg(F.count("*").alias("n_true"))
    rep2 = (
        rep.join(hits, F.col("bands") == F.col("h_bands"))
        .crossJoin(F.broadcast(n_true))
        .select(
            "bands",
            "n_cand",
            "n_verified",
            F.expr("n_verified * 10000 div nullif(n_cand, 0)").alias(
                "precision_bp"
            ),
            F.expr("n_hit * 10000 div nullif(n_true, 0)").alias("recall_bp"),
        )
    )
    meets = F.col("recall_bp") >= _RECALL_FLOOR_BP
    picked = rep2.agg(
        F.max(
            F.struct(
                meets.cast("int").alias("m"),
                F.when(meets, -F.col("bands")).otherwise(F.col("recall_bp")).alias(
                    "k2"
                ),
                (-F.col("bands")).alias("k3"),
                F.col("bands").alias("bands"),
            )
        ).alias("c")
    ).select(F.col("c.bands").alias("picked_bands"))
    return (
        rep2.crossJoin(F.broadcast(picked))
        .select(
            "bands",
            "n_cand",
            "n_verified",
            "precision_bp",
            "recall_bp",
            (F.col("bands") == F.col("picked_bands")).cast("long").alias("chosen"),
        )
        .orderBy("bands")
    )
