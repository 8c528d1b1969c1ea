"""Streaming fact ingestion -> incremental fixpoint maintenance.

The reference engine has NO streaming surface (SURVEY §2.9); its closest
feature is deferred/incremental imports re-evaluated during reasoning
(``nemo/src/io/formats.rs:41-49``,
``nemo-physical/src/tabular/operations/incremental_import.rs``). The Spark-
native generalization: facts arrive as a Structured Streaming source; each
micro-batch becomes a semi-naive DELTA and the engine continues the fixpoint
from it (:meth:`SemiNaiveEngine.extend`) — incremental view maintenance for
monotone programs, full recompute fallback otherwise.

Resumability contract: Structured Streaming's own checkpoint
(``checkpoint_location``) makes the SOURCE exactly-once — committed batches
are never redelivered — but the engine's accumulated tables live in the
driver process. Restarting with only ``checkpoint_location`` therefore
silently loses every already-committed batch. Pass ``store=`` (a
:class:`~nemo_spark.engine.checkpoint.CheckpointStore`) to persist each
micro-batch delta BEFORE it feeds the fixpoint; after a restart,
:func:`restore_streamed_facts` re-injects the persisted batches into the
fresh engine, then the restarted query continues from the first uncommitted
batch. Snapshots are step-keyed by batch id, so a crash between snapshot and
commit is safe: the redelivered batch overwrites its own snapshot
idempotently. Watermarks/late data are a non-issue because Datalog facts are
set-monotone (arrival order cannot change the fixpoint).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from nemo_spark.engine.seminaive import SemiNaiveEngine
from nemo_spark.model.rules import Program


def _store_name(pred: str, store_name: str | None) -> str:
    return store_name if store_name is not None else f"stream_{pred}"


def stream_facts_into(
    engine: SemiNaiveEngine,
    program: Program,
    stream: DataFrame,
    pred: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_location: str | None = None,
    trigger_available_now: bool = True,
    store: Any | None = None,
    store_name: str | None = None,
):
    """Drive ``engine.extend`` from a streaming DataFrame of new facts.

    ``stream`` must be a streaming DataFrame; ``transform`` maps a raw
    micro-batch to the predicate's positional fact columns. When ``store``
    is given, each batch delta is snapshotted (step = batch id) before the
    fixpoint consumes it — see the module docstring for the restart
    protocol. Returns the started StreamingQuery (caller awaits/stops)."""
    name = _store_name(pred, store_name)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = transform(batch_df) if transform is not None else batch_df
        if store is not None:
            # snapshot() returns the re-read parquet frame: the fixpoint
            # then consumes durable data, not the transient batch plan
            df = store.snapshot(name, df, int(batch_id))
        engine.extend(program, {pred: df})

    writer = stream.writeStream.foreachBatch(on_batch)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def restore_streamed_facts(
    engine: SemiNaiveEngine,
    program: Program,
    store: Any,
    pred: str,
    store_name: str | None = None,
) -> int:
    """Re-inject every batch delta persisted by :func:`stream_facts_into`
    into a fresh engine (one union + one ``extend`` fixpoint, not one per
    batch). Call BEFORE restarting the streaming query with the same
    ``checkpoint_location``. Returns the number of batches restored."""
    name = _store_name(pred, store_name)
    steps = store.steps(name)
    if not steps:
        return 0
    union = None
    for step in steps:
        df = store.load(name, step)
        union = df if union is None else union.unionByName(df)
    engine.extend(program, {pred: union})
    return len(steps)
