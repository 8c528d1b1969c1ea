"""Distributed semi-naive fixpoint evaluation over Spark DataFrames.

This is the Spark-first re-imagination of nemo's execution core
(reference: ``nemo/src/execution/execution_engine.rs:295-345`` fixpoint loop,
``nemo/src/execution/planning/operations/join_seminaive.rs:47-102`` delta
variants, ``nemo/src/execution/planning/operations/duplicates.rs:24-46``
dedup-vs-history, ``nemo/src/execution/selection_strategy/*`` scheduling).

Key mapping decisions:
- A predicate's facts = one DataFrame (``all``) + one per-round ``delta``,
  replacing nemo's step-tagged subtables (``nemo/src/table_manager.rs:67``).
- Rule application = chain of DataFrame equi-joins; Catalyst/AQE choose the
  physical join (vs nemo's single-threaded leapfrog triejoin,
  ``nemo-physical/src/tabular/operations/join.rs:196``). Small deltas are
  broadcast explicitly (row counts are already materialized for termination
  checks, so the decision is free).
- Set semantics / dedup vs history = ``dropDuplicates`` + ``left_anti`` join
  against the accumulated table — THE hot operator of semi-naive.
- Plan-lineage control: iterative jobs grow logical plans without bound;
  ``localCheckpoint`` every ``checkpoint_every`` rounds is the analogue of
  nemo's subtable defragmentation (``execution_engine.rs:263-292``). With a
  ``CheckpointStore`` the engine instead persists parquet/Iceberg snapshots,
  making runs resumable mid-fixpoint.

Semi-naive soundness note: in round t, the variant for body atom i joins
atom i's previous-round delta against the FULL current tables of the other
atoms. This derives a superset of the textbook new/old split
(nemo's ``UnionRange`` windows); the extra derivations are removed by the
dedup-vs-history anti-join, so results are identical and the plan stays
simple (one cached table per predicate instead of per-step subtables).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nemo_spark.engine.stratify import stratify
from nemo_spark.model.rules import Aggregate, Atom, Program, Rule, Var

log = logging.getLogger("nemo_spark.engine")

_AGG_FN = {"min": F.min, "max": F.max, "sum": F.sum, "count": F.count}


def _cols(n: int) -> list[str]:
    return [f"c{i}" for i in range(n)]


@dataclass
class RoundMetrics:
    stratum: int
    round: int
    rule: str
    derived_rows: int
    wall_sec: float


@dataclass
class EngineStats:
    rounds: int = 0
    derived_total: int = 0
    per_rule: list[RoundMetrics] = field(default_factory=list)


class SemiNaiveEngine:
    """Evaluate a :class:`Program` to fixpoint over registered EDB DataFrames.

    Usage::

        eng = SemiNaiveEngine(spark)
        eng.register("edge", edge_df)          # EDB: any DataFrame, any col names
        eng.run(program)
        result = eng.table("reach")            # columns c0..c{n-1}
    """

    def __init__(
        self,
        spark: SparkSession,
        broadcast_threshold: int = 2_000_000,
        checkpoint_every: int = 6,
        checkpoint_store: Any | None = None,
        max_rounds: int = 10_000,
    ) -> None:
        self.spark = spark
        self.broadcast_threshold = broadcast_threshold
        self.checkpoint_every = checkpoint_every
        self.checkpoint_store = checkpoint_store
        self.max_rounds = max_rounds
        self._tables: dict[str, DataFrame] = {}
        self._arity: dict[str, int] = {}
        self.stats = EngineStats()

    # ------------------------------------------------------------------ setup

    def register(self, pred: str, df: DataFrame) -> None:
        """Register an EDB table; columns are positional (renamed c0..cn-1)."""
        n = len(df.columns)
        df = df.toDF(*_cols(n)).dropDuplicates()
        self._tables[pred] = df
        self._arity[pred] = n

    def has_table(self, pred: str) -> bool:
        return pred in self._tables

    def table(self, pred: str) -> DataFrame:
        """Facts of a predicate (columns c0..cn-1). Empty-typed table if the
        predicate was never derived."""
        if pred not in self._tables:
            return self._empty(self._arity.get(pred, 1))
        return self._tables[pred]

    def tables(self) -> dict[str, DataFrame]:
        return dict(self._tables)

    # -------------------------------------------------------------------- run

    def run(self, program: Program) -> EngineStats:
        arities = program.predicates()
        for p, n in arities.items():
            if p in self._arity and self._arity[p] != n:
                raise ValueError(f"predicate {p}: registered arity {self._arity[p]} != program arity {n}")
            self._arity.setdefault(p, n)

        # inline facts (nemo: SimpleTable, management/database/sources.rs:14)
        for p, rows in program.facts.items():
            df = self.spark.createDataFrame(rows, _cols(self._arity[p]))
            self._tables[p] = self._tables[p].unionByName(df).dropDuplicates() if p in self._tables else df

        for stratum_idx, rules in enumerate(stratify(program)):
            self._run_stratum(stratum_idx, rules)
        return self.stats

    # ---------------------------------------------------------------- stratum

    def _run_stratum(self, stratum_idx: int, rules: list[Rule]) -> None:
        idb = {r.head.pred for r in rules}

        # Round 0: full evaluation of every rule against current tables.
        round_idx = 0
        delta: dict[str, DataFrame] = {}
        delta_counts: dict[str, int] = {}
        new_any = False
        for ri, rule in enumerate(rules):
            t0 = time.time()
            derived = self._eval_rule(rule, {}, {}, use_delta_atom=None)
            if derived is None:
                continue
            fresh, cnt = self._merge(rule.head.pred, derived)
            self._record(stratum_idx, round_idx, rule.label(ri), cnt, time.time() - t0)
            if cnt:
                new_any = True
                # freshes of the same pred are disjoint (each rule's anti-join
                # ran against the table already containing earlier freshes),
                # so plain union + summed counts are exact — no recount job.
                delta[rule.head.pred] = (
                    delta[rule.head.pred].unionByName(fresh) if rule.head.pred in delta else fresh
                )
                delta_counts[rule.head.pred] = delta_counts.get(rule.head.pred, 0) + cnt

        # Rounds 1..: semi-naive — only delta-reading variants of rules whose
        # body touches a predicate that changed last round.
        while new_any and round_idx < self.max_rounds:
            round_idx += 1
            new_any = False
            next_delta: dict[str, DataFrame] = {}
            next_counts: dict[str, int] = {}
            for ri, rule in enumerate(rules):
                hot = [
                    i
                    for i, a in enumerate(rule.body)
                    if a.pred in delta and delta_counts.get(a.pred, 0) > 0
                ]
                if not hot:
                    continue
                t0 = time.time()
                parts = [
                    self._eval_rule(rule, delta, delta_counts, use_delta_atom=i)
                    for i in hot
                ]
                parts = [p for p in parts if p is not None]
                if not parts:
                    continue
                derived = parts[0]
                for p_ in parts[1:]:
                    derived = derived.unionByName(p_)
                fresh, cnt = self._merge(rule.head.pred, derived)
                self._record(stratum_idx, round_idx, rule.label(ri), cnt, time.time() - t0)
                if cnt:
                    new_any = True
                    next_delta[rule.head.pred] = (
                        next_delta[rule.head.pred].unionByName(fresh)
                        if rule.head.pred in next_delta
                        else fresh
                    )
                    next_counts[rule.head.pred] = next_counts.get(rule.head.pred, 0) + cnt
            delta, delta_counts = next_delta, next_counts
            # checkpoint cadence: truncate plan lineage (nemo defrag analogue)
            if round_idx % self.checkpoint_every == 0:
                for p in idb:
                    if p in self._tables:
                        self._tables[p] = self._checkpoint(p, self._tables[p], round_idx)

    # ------------------------------------------------------------- rule eval

    def _eval_rule(
        self,
        rule: Rule,
        delta: dict[str, DataFrame],
        delta_counts: dict[str, int],
        use_delta_atom: int | None,
    ) -> DataFrame | None:
        """Evaluate one rule body; returns head-layout DataFrame (c0..cn-1),
        or None when some positive atom's predicate has no facts at all."""
        bound: DataFrame | None = None
        bound_vars: list[str] = []
        for i, atom in enumerate(rule.body):
            if use_delta_atom is not None and i == use_delta_atom:
                src = delta[atom.pred]
                small = delta_counts.get(atom.pred, 0) <= self.broadcast_threshold
            else:
                if atom.pred not in self._tables:
                    return None
                src = self._tables[atom.pred]
                small = False
            adf = self._bind_atom(src, atom)
            if small:
                adf = F.broadcast(adf)
            if bound is None:
                bound, bound_vars = adf, [v.name for v in _uniq(atom.variables())]
            else:
                atom_var_names = {x.name for x in atom.variables()}
                keys = [v for v in bound_vars if v in atom_var_names]
                new_vars = [v.name for v in _uniq(atom.variables()) if v.name not in bound_vars]
                bound = bound.join(adf, on=keys, how="inner") if keys else bound.crossJoin(adf)
                bound_vars = bound_vars + new_vars
        if bound is None:
            raise ValueError(f"rule {rule.name}: empty body not supported")

        # assignments (nemo Function op: computed columns; null/error => drop,
        # nemo-physical/src/function/definitions/numeric/integer64.rs semantics)
        for var_name, fn in rule.assignments:
            bound = bound.withColumn(var_name, fn(_colmap(bound)))
            bound = bound.filter(F.col(var_name).isNotNull())
            bound_vars.append(var_name)

        # filters (nemo Filter op; null-valued predicate drops the row)
        for fn in rule.filters:
            bound = bound.filter(fn(_colmap(bound)))

        # negation: anti-join on shared variables (nemo Subtract,
        # tabular/operations/subtract.rs:166; planning negation.rs)
        for natom in rule.negated:
            if natom.pred not in self._tables:
                continue  # negating an empty predicate filters nothing
            ndf = self._bind_atom(self._tables[natom.pred], natom)
            keys = [v.name for v in _uniq(natom.variables()) if v.name in bound_vars]
            if not keys:
                raise ValueError(f"unsafe negation in rule {rule.name}: no shared variables")
            ndf = ndf.select(*keys).dropDuplicates()
            bound = bound.join(ndf, on=keys, how="left_anti")

        aggregate = rule.head_aggregate()
        if aggregate is not None:
            return self._project_aggregate(bound, rule.head, aggregate)
        return self._project_head(bound, rule.head)

    def _bind_atom(self, df: DataFrame, atom: Atom) -> DataFrame:
        """Rename positional cols to variable names; constants -> filters;
        repeated variables -> equality filters; non-variable cols projected
        away (nemo ProjectReorder + constant/equality column scans,
        ``columnar/operations/filter_constant.rs`` / ``filter_equal.rs``)."""
        n = self._arity[atom.pred]
        if len(atom.terms) != n:
            raise ValueError(f"atom {atom} arity mismatch (expected {n})")
        conds: list[Column] = []
        rename: dict[str, str] = {}
        seen_var: dict[str, str] = {}
        for i, t in enumerate(atom.terms):
            c = f"c{i}"
            if isinstance(t, Var):
                if t.name in seen_var:
                    conds.append(F.col(c) == F.col(seen_var[t.name]))
                else:
                    seen_var[t.name] = c
                    rename[c] = t.name
            elif isinstance(t, Aggregate):
                raise ValueError("aggregate terms are head-only")
            else:
                conds.append(F.col(c) == F.lit(t))
        out = df
        for cond in conds:
            out = out.filter(cond)
        return out.select(*[F.col(c).alias(v) for c, v in rename.items()])

    def _project_head(self, bound: DataFrame, head: Atom) -> DataFrame:
        exprs = []
        for i, t in enumerate(head.terms):
            if isinstance(t, Var):
                exprs.append(F.col(t.name).alias(f"c{i}"))
            else:
                exprs.append(F.lit(t).alias(f"c{i}"))
        return bound.select(*exprs).dropDuplicates()

    def _project_aggregate(self, bound: DataFrame, head: Atom, aggregate: Aggregate) -> DataFrame:
        """Nemo aggregate semantics: set-based — dedup on (group + distinct +
        aggregated) before aggregating (``tabular/operations/aggregate.rs:21-32``)."""
        group_vars = [t.name for t in head.terms if isinstance(t, Var)]
        extra = [v.name for v in aggregate.distinct]
        proj = _uniq_str(group_vars + extra + [aggregate.var.name])
        deduped = bound.select(*proj).dropDuplicates()
        agg_col = _AGG_FN[aggregate.op](F.col(aggregate.var.name))
        if aggregate.op in ("sum", "count"):
            agg_col = agg_col.cast("long")
        agg_alias = "__agg__"
        res = deduped.groupBy(*group_vars).agg(agg_col.alias(agg_alias)) if group_vars else deduped.agg(agg_col.alias(agg_alias))
        exprs = []
        for i, t in enumerate(head.terms):
            if isinstance(t, Aggregate):
                exprs.append(F.col(agg_alias).alias(f"c{i}"))
            elif isinstance(t, Var):
                exprs.append(F.col(t.name).alias(f"c{i}"))
            else:
                exprs.append(F.lit(t).alias(f"c{i}"))
        return res.select(*exprs)

    # ------------------------------------------------------------ bookkeeping

    def _merge(self, pred: str, derived: DataFrame) -> tuple[DataFrame, int]:
        """Dedup derived facts against history; merge; return (fresh, count).

        nemo: new := candidate \\ union(all prior subtables)
        (``planning/operations/duplicates.rs:24-46``).
        """
        # localCheckpoint (eager) rather than persist: truncates the logical
        # plan every round — without this, round t's plan embeds round t-1's
        # join trees recursively and analysis cost grows exponentially.
        if pred in self._tables:
            existing = self._tables[pred]
            fresh = derived.dropDuplicates().join(
                existing, on=list(existing.columns), how="left_anti"
            ).localCheckpoint(eager=True)
            cnt = fresh.count()
            if cnt:
                self._tables[pred] = existing.unionByName(fresh)
        else:
            fresh = derived.dropDuplicates().localCheckpoint(eager=True)
            cnt = fresh.count()
            if cnt:
                self._tables[pred] = fresh
        return fresh, cnt

    def _checkpoint(self, pred: str, df: DataFrame, round_idx: int) -> DataFrame:
        if self.checkpoint_store is not None:
            return self.checkpoint_store.snapshot(pred, df, round_idx)
        return df.localCheckpoint(eager=True)

    def _record(self, stratum: int, round_idx: int, rule: str, cnt: int, wall: float) -> None:
        self.stats.rounds = max(self.stats.rounds, round_idx + 1)
        self.stats.derived_total += cnt
        self.stats.per_rule.append(RoundMetrics(stratum, round_idx, rule, cnt, wall))
        log.debug("stratum=%d round=%d rule=%s derived=%d %.2fs", stratum, round_idx, rule, cnt, wall)

    def _empty(self, arity: int) -> DataFrame:
        schema = ", ".join(f"c{i} string" for i in range(max(arity, 1)))
        return self.spark.createDataFrame([], schema)


def _colmap(df: DataFrame) -> dict[str, Column]:
    return {c: F.col(c) for c in df.columns}


def _uniq(vs: list[Var]) -> list[Var]:
    seen: set[str] = set()
    out = []
    for v in vs:
        if v.name not in seen:
            seen.add(v.name)
            out.append(v)
    return out


def _uniq_str(xs: list[str]) -> list[str]:
    seen: set[str] = set()
    return [x for x in xs if not (x in seen or seen.add(x))]
