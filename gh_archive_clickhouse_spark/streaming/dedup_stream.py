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

Retention: both tables are epoch-partitioned for replay idempotency,
and epochs older than the replayable window are periodically FOLDED
into one consolidated ``epoch=-1`` partition — total file count stays
O(keep_epochs), not O(stream lifetime). See ``_compact_old_epochs``.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.dedup import (
    lsh_candidate_pairs_between,
    minhash_signatures,
)

# Reserved partition value for the consolidated (compacted) epochs.
COMPACTED_EPOCH = -1

PAIRS_SCHEMA = "doc_a long, doc_b long, epoch int"
SIGS_SCHEMA = "doc_id long, minhash array<bigint>, epoch int"


def _epoch_dirs(path: str) -> list[tuple[int, Path]]:
    """(epoch, dir) for every epoch partition currently on disk."""
    root = Path(path)
    if not root.exists():
        return []
    out = []
    for child in root.iterdir():
        if child.is_dir() and child.name.startswith("epoch="):
            try:
                out.append((int(child.name.split("=", 1)[1]), child))
            except ValueError:
                continue
    return out


def _compact_old_epochs(
    spark: SparkSession,
    path: str,
    schema: str,
    current_epoch: int,
    dedup_cols: list[str],
    keep_epochs: int = 4,
    partition_cols: list[str] | None = None,
) -> bool:
    """Fold committed epoch partitions into the consolidated
    ``epoch=-1`` partition so the long-running table's file count is
    O(keep_epochs), not O(stream lifetime).

    Safety argument (at-least-once foreachBatch): once epoch E starts,
    epochs < E are committed and will never be replayed, so folding
    them cannot collide with a dynamic-overwrite replay; the CURRENT
    epoch's partition is never touched. Crash-safety ordering: the
    consolidated partition is (1) materialized via eager
    localCheckpoint (so the write below doesn't overwrite files it is
    still reading), (2) written, and only then (3) the folded epoch
    dirs are removed — a crash between (2) and (3) leaves duplicate
    rows, which ``dedup_cols`` de-duplicates on the next fold and
    every consumer tolerates (pair logs and signature tables are
    sets).

    Local-filesystem partition surgery; an object-store deployment
    routes the same fold through a table format's REPLACE/compaction
    (Delta OPTIMIZE, Iceberg rewrite_data_files) instead of renames.
    ``partition_cols`` (default ``["epoch"]``) must lead with
    ``epoch`` — tables that also partition by a pruning key (the
    IVF-PQ index's cluster_id) keep that sublayout through the fold.
    Returns True if a fold ran.
    """
    partition_cols = partition_cols or ["epoch"]
    if partition_cols[0] != "epoch":
        raise ValueError(
            f"partition_cols must lead with 'epoch', got {partition_cols}"
        )
    old = [
        (e, d)
        for e, d in _epoch_dirs(path)
        if e not in (current_epoch, COMPACTED_EPOCH)
    ]
    if len(old) < keep_epochs:
        return False
    folded = (
        spark.read.schema(schema)
        .parquet(path)
        .filter(F.col("epoch") != current_epoch)
        .dropDuplicates(dedup_cols)
        .withColumn("epoch", F.lit(COMPACTED_EPOCH))
        .repartition(1)
        .localCheckpoint(eager=True)
    )
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    import shutil

    for _e, d in old:
        shutil.rmtree(d, ignore_errors=True)
    return True


def incremental_lsh_sink(
    sig_path: str,
    pairs_path: str,
    shingle_k: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    keep_epochs: int = 4,
):
    """foreachBatch callable maintaining the signature table and the
    discovered-pairs log.

    REPLAY-IDEMPOTENT: Spark re-runs a failed epoch through
    foreachBatch, so both tables are partitioned by epoch and written
    with DYNAMIC partition overwrite — a replay rewrites its own
    epoch's partition instead of appending duplicates; other epochs
    are untouched. Per-epoch increments are compacted to a few files
    (post-compute repartition), and epochs older than the replayable
    window fold into one consolidated partition per
    ``_compact_old_epochs`` — the table's total file count is bounded
    by O(keep_epochs) for the stream's whole lifetime.
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
        all_sigs = spark.read.schema(SIGS_SCHEMA).parquet(sig_path).drop(
            "epoch"
        )
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
        _compact_old_epochs(
            spark,
            sig_path,
            SIGS_SCHEMA,
            int(epoch_id),
            dedup_cols=["doc_id"],
            keep_epochs=keep_epochs,
        )
        _compact_old_epochs(
            spark,
            pairs_path,
            PAIRS_SCHEMA,
            int(epoch_id),
            dedup_cols=["doc_a", "doc_b"],
            keep_epochs=keep_epochs,
        )

    return _write
