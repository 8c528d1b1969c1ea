#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``; print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode: run the KG pipeline at local[8] and local[32] on the SAME
input and report throughput at both plus scaling efficiency — the sandbox
proxy for the north rule's N vs 4N executor criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_kg_pipeline(spark, n_turns: int) -> dict:
    from nemo_spark.kg.pipeline import materialized_triples, run_pipeline
    from nemo_spark.kg.transcripts import synth_transcripts

    t0 = time.time()
    tr = synth_transcripts(spark, n_turns)
    res = run_pipeline(spark, tr)
    n_triples = materialized_triples(res).count()
    wall = time.time() - t0
    return {"wall": wall, "turns": n_turns, "turns_per_sec": n_turns / wall, "triples": n_triples}


def bench(sf_dir: str, master: str | None = None) -> dict:
    from nemo_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="nemo_spark_bench", master=master)
    sf = _sf_from_dir(sf_dir)
    queries = {}

    # KG pipeline headline: turns scaled with sf (2M turns/sf-unit)
    n_turns = max(int(2_000_000 * sf), 20_000)
    kg = run_kg_pipeline(spark, n_turns)
    queries["kg_pipeline"] = round(kg["wall"], 3)

    heads = [
        "pricing_summary",
        "join_customer_order_nation",
        "anti_customers_no_orders",
        "count_distinct_events",
        "tc_nations",
        "cc_users",
        "dedup_minhash",
        "dedup_exact",
        "text_quality",
        "knn_cosine",
        "kg_extract",
        "kg_materialized",
    ]
    qmap = entrymod.queries()
    for name in heads:
        t0 = time.time()
        df = qmap[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "e2e_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "turns": kg["turns"],
        "turns_per_sec": round(kg["turns_per_sec"], 1),
        "triples": kg["triples"],
        "master": spark.sparkContext.master,
    }
    spark.stop()
    return out


def bench_scaling(sf_dir: str) -> dict:
    """Same KG job at local[8] vs local[32]; efficiency = T8 / (4 * T32)."""
    from nemo_spark.session import get_spark

    sf = _sf_from_dir(sf_dir)
    n_turns = max(int(2_000_000 * sf), 20_000)
    results = {}
    for cores in (8, 32):
        spark = get_spark(app_name=f"nemo_spark_scaling_{cores}", master=f"local[{cores}]")
        kg = run_kg_pipeline(spark, n_turns)
        results[cores] = kg
        spark.stop()
    t8, t32 = results[8]["wall"], results[32]["wall"]
    eff = t8 / (4 * t32)
    return {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "turns": n_turns,
        "local8": {"sec": round(t8, 3), "turns_per_sec": round(results[8]["turns_per_sec"], 1)},
        "local32": {"sec": round(t32, 3), "turns_per_sec": round(results[32]["turns_per_sec"], 1)},
        "sf": sf,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling(sf_dir)))
    else:
        print(json.dumps(bench(sf_dir)))
