"""Sequence packing: group documents into fixed token-budget training
sequences (the GPT/T5 data-prep step that turns a ragged corpus into
dense model inputs).

Exact global bin packing is inherently sequential, so — as in
production pipelines — packing runs greedily WITHIN each partition:
token counts are computed JVM-side, rows are hash-repartitioned by id
(deterministic) and sorted within the partition, then an Arrow-batched
``mapInPandas`` fills bins first-fit in id order. The result is
deterministic for a fixed ``num_shards`` and never shuffles documents
twice; per-shard greedy wastes at most one document's tokens per bin
versus the (uncomputable at 100 TB) global optimum.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_foundation_spark.operators.text import whitespace_token_count

ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("pack_id", T.LongType(), False),
    ]
)


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int = 32,
) -> DataFrame:
    """Assign every document to a pack of total token count <= budget.

    Documents longer than ``budget`` get a pack of their own (the
    caller decides whether to truncate or split downstream). Returns
    (doc_id, n_tokens, pack_id); pack_id encodes (shard, local bin) so
    ids are globally unique and stable.
    """
    counted = df.select(
        F.col(id_col).alias("doc_id"),
        whitespace_token_count(text_col).cast("long").alias("n_tokens"),
    )
    sharded = counted.repartition(num_shards, "doc_id").sortWithinPartitions("doc_id")

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        bins: list[int] = []  # remaining capacity per open bin
        out_ids, out_tok, out_pack = [], [], []
        for pdf in batches:
            for doc, n in zip(pdf["doc_id"], pdf["n_tokens"]):
                n = int(n)
                # first-fit over open bins
                placed = None
                for i, cap in enumerate(bins):
                    if n <= cap:
                        bins[i] = cap - n
                        placed = i
                        break
                if placed is None:
                    # Oversize docs (n > budget) get a CLOSED pack of
                    # their own: capacity -1 so nothing — not even a
                    # zero-token doc — ever joins it (a 0-capacity bin
                    # would admit n == 0 and break the pack-of-their-own
                    # contract; found by the hypothesis invariant test).
                    bins.append(budget - n if n <= budget else -1)
                    placed = len(bins) - 1
                out_ids.append(int(doc))
                out_tok.append(n)
                out_pack.append(pid * 1_000_000 + placed)
        if out_ids:
            yield pd.DataFrame({"doc_id": out_ids, "n_tokens": out_tok, "pack_id": out_pack})

    return sharded.mapInPandas(fill, ASSIGN_SCHEMA)


def pack_summary(assignments: DataFrame, budget: int = 512) -> DataFrame:
    """Per-corpus packing stats: pack count, mean fill ratio, and the
    share of packs at/above 90% fill — the numbers you tune ``budget``
    against."""
    per_pack = assignments.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("_tok"), F.count("*").alias("_docs")
    )
    return per_pack.agg(
        F.count("*").cast("bigint").alias("n_packs"),
        F.sum("_docs").cast("bigint").alias("n_docs"),
        F.round(F.avg(F.col("_tok") / F.lit(float(budget))), 6).alias("avg_fill"),
        F.round(
            F.avg((F.col("_tok") >= F.lit(0.9 * budget)).cast("double")), 6
        ).alias("pct_90_full"),
    )
