"""Streaming fact ingestion -> incremental fixpoint maintenance.

The reference engine has NO streaming surface (SURVEY §2.9); its closest
feature is deferred/incremental imports re-evaluated during reasoning
(``nemo/src/io/formats.rs:41-49``,
``nemo-physical/src/tabular/operations/incremental_import.rs``). The Spark-
native generalization: facts arrive as a Structured Streaming source; each
micro-batch becomes a semi-naive DELTA and the engine continues the fixpoint
from it (:meth:`SemiNaiveEngine.extend`) — incremental view maintenance for
monotone programs, full recompute fallback otherwise.

At scale: the engine's accumulated tables live behind a CheckpointStore
(parquet/Iceberg snapshots), so the stream is resumable; watermarks/late data
are a non-issue because Datalog facts are set-monotone (arrival order cannot
change the fixpoint).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from nemo_spark.engine.seminaive import SemiNaiveEngine
from nemo_spark.model.rules import Program


def stream_facts_into(
    engine: SemiNaiveEngine,
    program: Program,
    stream: DataFrame,
    pred: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_location: str | None = None,
    trigger_available_now: bool = True,
):
    """Drive ``engine.extend`` from a streaming DataFrame of new facts.

    ``stream`` must be a streaming DataFrame; ``transform`` maps a raw
    micro-batch to the predicate's positional fact columns. Returns the
    started StreamingQuery (caller awaits/stops)."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = transform(batch_df) if transform is not None else batch_df
        engine.extend(program, {pred: df})

    writer = stream.writeStream.foreachBatch(on_batch)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
