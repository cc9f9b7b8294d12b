"""Sequence packing for context-window training batches.

Next-fit-decreasing (NFD) is the one-pass streaming-friendly packer: within
a shard, docs sorted by token count (desc, doc_id tiebreak) fill fixed-
capacity bins; a doc that overflows the open bin starts a new one.  FFD's
bin SEARCH needs random access to all open bins, which breaks the
sequential-fold shape; NFD wastes a bounded tail per bin in exchange for
O(1) state.  Factored out of the Y55 key so the corpus-build capstone
(Z75) provably packs with the IDENTICAL policy; the DuckDB twin
(``nfd_pack_duck_ctes``) replays every bin decision with a recursive CTE.

Scale shape: shards are independent (one shuffle on shard id), each a
bounded per-shard python loop inside applyInPandas — exactly the
per-partition-imperative escape hatch; pack ids are globally unique via
the shard prefix.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

PACK_CAP = 512  # context-window token budget per bin
PACK_SHARD = 100  # docs per shard (doc_id // PACK_SHARD)


def nfd_pack(t: DataFrame, cap: int = PACK_CAP) -> DataFrame:
    """Pack a (doc_id, shard, n_tokens) frame, n_tokens > 0 rows only,
    into NFD bins per shard.  Returns (doc_id, n_tokens, pack_id) with
    pack_id = shard * 10000 + bin_id."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bin_id, remaining = 0, cap
        bins = []
        first = True
        for n in pdf["n_tokens"]:
            if first:
                remaining = cap - int(n)
                first = False
            elif int(n) > remaining:
                bin_id += 1
                remaining = cap - int(n)
            else:
                remaining -= int(n)
            bins.append(bin_id)
        pdf["pack_id"] = pdf["shard"] * 10000 + pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "n_tokens", "pack_id"]]

    return t.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, n_tokens long, pack_id long"
    )


def nfd_pack_duck_ctes(src: str, cap: int = PACK_CAP) -> str:
    """DuckDB CTE chain ``seq, pack`` replaying the NFD fold over a source
    CTE ``src`` exposing (doc_id, shard, n_tokens) with n_tokens > 0.
    Helper CTEs joined, never correlated (the X136 doctrine); the caller's
    WITH must be RECURSIVE."""
    return f"""seq AS MATERIALIZED (
        SELECT doc_id, shard, n_tokens,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY n_tokens DESC, doc_id) AS rn
        FROM {src}
    ), pack AS (
        SELECT doc_id, shard, n_tokens, rn,
               0::BIGINT AS bin_id,
               {cap} - n_tokens AS remaining
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.doc_id, s.shard, s.n_tokens, s.rn,
               CASE WHEN s.n_tokens > p.remaining
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN s.n_tokens > p.remaining
                    THEN {cap} - s.n_tokens
                    ELSE p.remaining - s.n_tokens END
        FROM pack p JOIN seq s ON s.shard = p.shard AND s.rn = p.rn + 1
    )"""
