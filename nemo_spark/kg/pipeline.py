"""End-to-end KG construction: transcripts -> canonical (subj, pred, obj)
triples -> fixpoint closure.

Stages (each checkpointable to a :class:`CheckpointStore` snapshot with
per-partition lineage + metrics, so runs resume mid-pipeline):

1. extract   — vectorized Arrow-batched triple extraction per turn
2. link      — broadcast alias-dictionary join (exact) per mention
3. canonical — hash-min connected components over the alias/entity graph
4. triples   — canonicalized, set-semantics (subj, pred, obj)
5. closure   — semi-naive fixpoint: transitive predicates materialized
               through the generic rule engine (nemo's evaluation core)

The closure stage IS nemo re-imagined: derived triples are produced by
repeatedly joining a delta against the accumulating fact table until no new
facts appear (``nemo/src/execution/execution_engine.rs:295-345``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nemo_spark.engine.checkpoint import CheckpointStore
from nemo_spark.engine.seminaive import SemiNaiveEngine
from nemo_spark.kg import transcripts as T
from nemo_spark.kg.canonicalize import canonical_map_from_alias_dict
from nemo_spark.kg.extract import extract_triples_expr, extract_triples_pandas
from nemo_spark.model.rules import Atom, Program, Rule, Var


@dataclass
class PipelineResult:
    triples_raw: DataFrame
    canonical_map: DataFrame
    triples: DataFrame
    closure: DataFrame
    metrics: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    alias_dict: DataFrame | None = None,
    checkpoint_store: CheckpointStore | None = None,
    use_pandas_extractor: bool = True,
    transitive_preds: tuple[str, ...] = ("located_in",),
) -> PipelineResult:
    metrics: dict = {}
    t_start = time.time()

    # resume support: skip completed stages when a store is given
    def stage(name: str, build, step: int) -> DataFrame:
        if checkpoint_store is not None:
            cached = checkpoint_store.load(name)
            if cached is not None:
                metrics[name] = {"resumed": True}
                return cached
        t0 = time.time()
        df = build()
        if checkpoint_store is not None:
            df = checkpoint_store.snapshot(name, df, step)
        metrics[name] = {"wall_sec": time.time() - t0}
        return df

    alias_dict = alias_dict if alias_dict is not None else T.alias_dict(spark)

    # 1. extract
    extractor = extract_triples_pandas if use_pandas_extractor else extract_triples_expr
    triples_raw = stage("triples_raw", lambda: extractor(transcripts), 1)

    # 2+3. canonical map: CC over the (alias, entity) bipartite graph.
    # The alias dictionary is dimension-sized, so the canonical map is small
    # and broadcastable; mentions never shuffle for linking.
    canonical_map = stage("canonical_map", lambda: canonical_map_from_alias_dict(alias_dict), 1)

    # 4. canonical triples (set semantics)
    def build_triples() -> DataFrame:
        cm = F.broadcast(canonical_map)
        s = cm.withColumnRenamed("node", "__sn").withColumnRenamed("canonical_id", "subj")
        o = cm.withColumnRenamed("node", "__on").withColumnRenamed("canonical_id", "obj")
        return (
            triples_raw
            .join(s, F.concat(F.lit("a:"), F.col("subj_alias")) == F.col("__sn"), "inner")
            .join(o, F.concat(F.lit("a:"), F.col("obj_alias")) == F.col("__on"), "inner")
            .select("subj", "pred", "obj")
            .dropDuplicates()
        )

    triples = stage("triples", build_triples, 1)

    # 5. fixpoint closure of transitive predicates via the rule engine
    def build_closure() -> DataFrame:
        out = None
        for pred in transitive_preds:
            edges = triples.filter(F.col("pred") == pred).select("subj", "obj")
            eng = SemiNaiveEngine(spark, checkpoint_store=checkpoint_store)
            eng.register("edge", edges)
            Xv, Yv, Zv = Var("X"), Var("Y"), Var("Z")
            prog = Program(
                rules=[
                    Rule(Atom("closure", Xv, Yv), [Atom("edge", Xv, Yv)]),
                    Rule(Atom("closure", Xv, Zv), [Atom("closure", Xv, Yv), Atom("edge", Yv, Zv)]),
                ]
            )
            eng.run(prog)
            part = eng.table("closure").select(
                F.col("c0").alias("subj"), F.lit(pred).alias("pred"), F.col("c1").alias("obj")
            )
            out = part if out is None else out.unionByName(part)
        if out is None:
            return triples.limit(0)
        return out.dropDuplicates()

    closure = stage("closure", build_closure, 1)

    metrics["total_wall_sec"] = time.time() - t_start
    return PipelineResult(triples_raw, canonical_map, triples, closure, metrics)


def materialized_triples(result: PipelineResult) -> DataFrame:
    """Final KG: canonical triples plus closure-derived facts (set union)."""
    return result.triples.unionByName(result.closure).dropDuplicates()
