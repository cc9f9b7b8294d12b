"""Round-13 wave 1 (Y78): post-tombstone index compaction — closing the
index-maintenance triad (r12 verdict item 2).

Y75 absorbs inserts (per-drop appends into cell-partitioned state), Y77
masks deletes at read time (merge-on-read anti-join), Z73 compacts
append-only state — but nobody proved compaction AFTER deletes: the
rewrite that physically drops the tombstoned rows and merges the small
per-drop files, after which the deletion vector can be retired.  This
key builds the fragmented state, applies the Y77 tombstone mask,
REWRITES the inverted lists (one shuffle on the cell key, one file per
cell out), asserts the rewrite really compacted (strictly fewer parquet
files) and really dropped the masked rows (zero tombstoned ids in the
readback; live set otherwise exactly preserved, exceptAll both ways),
then runs Y74's search verbatim over the COMPACTED state under Y77's
oracle — so the driver hash-proves compacted-index search == search
over a corpus that never contained the deleted vectors.

The per-drop state is staged as four id-range BATCH appends (narrow
shuffle width, several part files per cell partition per drop — the
streaming small-file failure mode), not another availableNow drain:
Y75 already proves the drain path end-to-end, and re-paying its
orchestration fixed cost here would buy no additional semantics
(r12 verdict item 1).

Reference parity: the reference re-runs its whole program per
invocation (call-debias.py:177-196); no vector surface exists there —
north-star extension per SURVEY §2.H.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.queries.io_roundtrip import _WAREHOUSE, _sink_dir
from debias_spark.queries.llm_ops36 import _IVF_K
from debias_spark.queries.llm_ops37 import (
    _PQ_CODES,
    _ivfpq_oracle,
    ivfpq_search,
    pq_codebook,
    pq_index_frame,
)
from debias_spark.queries.llm_ops38 import _TOMB_DUCK, _TOMB_MOD, _TOMB_REM
from debias_spark.queries.pipeline_e2e4 import _count_parquet_files
from debias_spark.registry import register

# two drops (the r13 family-wide drop-count discipline): fragmentation
# for the strictly-fewer-files proof needs >= 2 appends per cell (8
# narrow-shuffle tasks x 2 appends leave multiple files per cell)
_N_DROPS = 2


@register(
    "similarity_ann_ivfpq_compacted",
    "Y78",
    oracle=_ivfpq_oracle(where=_TOMB_DUCK),
)
def similarity_ann_ivfpq_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search over a POST-TOMBSTONE COMPACTED index: the state
    that accumulated per-drop appends (Y75's inverted-list layout) and
    a deletion vector (Y77's pinned tombstone set) is rewritten so the
    masked rows are physically gone and each cell's inverted list is
    one file again — after which the tombstone set can be retired and
    reads stop paying the anti-join.

    Proof obligations, all raised in-key (must survive -O is NOT
    assumed: these are RuntimeErrors, not asserts):
      * the rewrite COMPACTED: strictly fewer parquet files than the
        fragmented pre-state (``_N_DROPS`` appends x narrow shuffle
        width leave several files per cell partition);
      * the rewrite DELETED: zero tombstoned vec_ids in the readback,
        row count == live count, and the live frame is exactly
        preserved (exceptAll in both directions — no row lost beyond
        the masked ones, none duplicated, none altered);
      * the SEARCH is unchanged: registered with Y77's oracle string,
        so the driver hash-proves compacted == masked == a corpus
        that never held the deleted vectors (no ghost candidates).

    Scale shape: compaction reads the NARROW index rows (vec_id, nrm,
    8 codes — never the 64 doubles), shuffles once on the cell key,
    writes one file per cell; cost is O(index), independent of corpus
    text/vector payload.  At 100 TB this is the per-shard background
    rewrite that retires deletion-vector bitmaps (the lakehouse
    merge-on-read -> copy-on-write handoff), run per cell-partition
    range; the exceptAll pair here pins the per-partition content
    digest that job would compare."""
    emb = table(spark, sf_dir, "embeddings")
    book = pq_codebook(emb)

    idx_dir = _sink_dir(spark, sf_dir, "y78_state")  # prunes stale y78_state_*
    base = os.path.basename(idx_dir)
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    compact_dir = os.path.join(_WAREHOUSE, base.replace("y78_state", "y78_compact"))
    from debias_spark.warehouse import prune_stale_siblings

    prune_stale_siblings(_WAREHOUSE, f"y78_compact_{tag}_", os.path.basename(compact_dir))
    for d in (idx_dir, compact_dir):
        shutil.rmtree(d, ignore_errors=True)

    # fixture staging: _N_DROPS id-range batch appends (the Y75 drop
    # bounds doctrine — ID-RANGE derived, sparse/offset-id safe), narrow
    # shuffle width so each append leaves several files per cell
    mm = emb.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")).first()
    lo, hi = mm.lo, mm.hi + 1
    bounds = sorted(set([lo + ((hi - lo) * i) // _N_DROPS for i in range(_N_DROPS)] + [hi]))
    if len(bounds) - 1 < 2:
        raise RuntimeError(
            f"vec_id-range staging produced {len(bounds) - 1} drop(s); the "
            "corpus is too small to exercise post-append compaction"
        )
    _SP = "spark.sql.shuffle.partitions"
    prev_sp = spark.conf.get(_SP, None)
    spark.conf.set(_SP, "8")
    try:
        for i in range(len(bounds) - 1):
            batch = emb.filter(
                (F.col("vec_id") >= bounds[i]) & (F.col("vec_id") < bounds[i + 1])
            )
            # each drop indexes itself: pure projection, no state read
            pq_index_frame(batch, book).write.mode("append").partitionBy(
                "cell"
            ).parquet(idx_dir)
    finally:
        if prev_sp is None:
            spark.conf.unset(_SP)
        else:
            spark.conf.set(_SP, prev_sp)

    files_before = _count_parquet_files(idx_dir)
    state = spark.read.parquet(idx_dir)
    tombs = emb.select("vec_id").filter(
        (F.col("vec_id") % _TOMB_MOD == _TOMB_REM) & (F.col("vec_id") >= _PQ_CODES)
    )
    live = state.join(F.broadcast(tombs), "vec_id", "anti")

    # THE COMPACTION REWRITE: one shuffle on the inverted-list key, one
    # file per cell out; masked rows are dropped by the anti-join ABOVE
    # the write, so they never reach the new files
    live.repartition(_IVF_K, "cell").write.partitionBy("cell").parquet(compact_dir)
    files_after = _count_parquet_files(compact_dir)
    if files_after >= files_before:
        raise RuntimeError(
            f"compaction did not shrink the file count: {files_before} -> "
            f"{files_after}"
        )

    comp = spark.read.parquet(compact_dir)
    cols = ["vec_id", "nrm", "cell", "codes"]
    # deletion proof + preservation proof (one pass each way; narrow rows)
    g = comp.agg(
        F.count("*").alias("n"),
        F.sum(
            (
                (F.col("vec_id") % _TOMB_MOD == _TOMB_REM)
                & (F.col("vec_id") >= _PQ_CODES)
            ).cast("long")
        ).alias("ghosts"),
    ).first()
    if g.ghosts:
        raise RuntimeError(
            f"compacted index still holds {g.ghosts} tombstoned row(s)"
        )
    missing = live.select(*cols).exceptAll(comp.select(*cols)).count()
    extra = comp.select(*cols).exceptAll(live.select(*cols)).count()
    if missing or extra:
        raise RuntimeError(
            f"compacted index differs from the live set: {missing} rows "
            f"lost, {extra} rows added"
        )

    return ivfpq_search(spark, emb, comp, book)
