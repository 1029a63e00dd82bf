"""Incremental near-dup detection over a DOCUMENT STREAM.

The batch LSH pipeline (operators/dedup.py) re-pairs the whole corpus;
a firehose needs the incremental form: per micro-batch, signatures are
computed for NEW docs only, appended to a persisted signature table,
and candidate pairs are found by bucket-joining the new signatures
against the table — work per batch is O(new × bucket density), never
O(corpus²), and the signature table doubles as the durable LSH index.

Equivalence to batch (the property qs4's oracle checks): with every
doc arriving exactly once, a pair (a, b) is emitted exactly when the
later of a, b arrives — the union of per-batch pair sets equals
``lsh_candidate_pairs`` over the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.dedup import (
    lsh_candidate_pairs_between,
    minhash_signatures,
)


def incremental_lsh_sink(
    sig_path: str,
    pairs_path: str,
    shingle_k: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
):
    """foreachBatch callable maintaining the signature table and the
    discovered-pairs log.

    REPLAY-IDEMPOTENT: Spark re-runs a failed epoch through
    foreachBatch, so both tables are partitioned by epoch and written
    with DYNAMIC partition overwrite — a replay rewrites its own
    epoch's partition instead of appending duplicates; other epochs
    are untouched. Per-epoch increments are also compacted to a few
    files (post-compute repartition) so the long-running tables don't
    accrete one tiny file per task per epoch.
    """

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs_new = minhash_signatures(batch_df, shingle_k=shingle_k)
        (
            sigs_new.withColumn("epoch", F.lit(int(epoch_id)))
            .repartition(4)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(sig_path)
        )
        all_sigs = spark.read.parquet(sig_path)
        pairs = lsh_candidate_pairs_between(
            sigs_new, all_sigs, bands=bands, rows_per_band=rows_per_band
        )
        (
            pairs.withColumn("epoch", F.lit(int(epoch_id)))
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(pairs_path)
        )

    return _write
