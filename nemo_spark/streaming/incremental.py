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
micro-batch delta BEFORE it feeds the fixpoint. The restart protocol, in
order:

1. build a fresh engine, register the non-streamed EDB tables, and
   ``engine.run(program)`` — :meth:`SemiNaiveEngine.extend` seeds only
   DELTA rounds, so rules whose bodies contain no streamed predicate
   (and inline program facts) derive ONLY in this initial full run;
2. :func:`restore_streamed_facts` — re-injects every persisted batch in
   one flat scan + one extend fixpoint;
3. restart the streaming query with the same ``checkpoint_location``
   (and the same ``store_name``, if one was passed) — it continues from
   the first uncommitted batch.

Snapshots are step-keyed by batch id, so a crash between snapshot and
commit is safe: the redelivered batch overwrites its own snapshot
idempotently. Two queries feeding the SAME predicate must not share a
snapshot name (their batch ids both start at 0 and would overwrite each
other) — the default name folds in ``checkpoint_location`` precisely so
concurrent queries get disjoint names; queries without a checkpoint
share the bare ``stream_{pred}`` name and need explicit ``store_name``s.
Watermarks/late data are a non-issue because Datalog facts are
set-monotone (arrival order cannot change the fixpoint).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from nemo_spark.engine.seminaive import SemiNaiveEngine
from nemo_spark.model.rules import Program


def _store_name(pred: str, store_name: str | None, checkpoint_location: str | None) -> str:
    if store_name is not None:
        return store_name
    if checkpoint_location:
        # fold the query's checkpoint into the default name: two queries
        # streaming into the SAME predicate each start batch ids at 0, so a
        # shared stream_{pred} name would let one query's step=N snapshot
        # silently overwrite the other's
        import hashlib

        digest = hashlib.md5(checkpoint_location.encode()).hexdigest()[:8]
        return f"stream_{pred}_{digest}"
    return f"stream_{pred}"


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
    name = _store_name(pred, store_name, checkpoint_location)

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
    checkpoint_location: str | None = None,
) -> int:
    """Re-inject every batch delta persisted by :func:`stream_facts_into`
    into a fresh engine (ONE flat multi-path scan + one ``extend``
    fixpoint — not an N-deep union of N reads). Step 2 of the restart
    protocol (module docstring): run AFTER ``engine.run(program)`` and
    BEFORE restarting the streaming query. Pass the same ``store_name`` /
    ``checkpoint_location`` the query was started with, so the derived
    snapshot name matches. Returns the number of batches restored."""
    name = _store_name(pred, store_name, checkpoint_location)
    steps = store.steps(name)
    if not steps and checkpoint_location:
        # pre-round-6 stores snapshotted under the bare stream_{pred} name
        # (no checkpoint digest); fall back so their batches still restore
        name = _store_name(pred, None, None)
        steps = store.steps(name)
    if not steps:
        return 0
    engine.extend(program, {pred: store.load_all(name)})
    return len(steps)
