#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for registry queries into a plans dir.

    python tools/dump_plans.py q1,q2 --out plans/r15 --suffix after
    python tools/dump_plans.py q1 --out /root/repo/plans/r15 --suffix before \
        --repo /tmp/oldcode_r14   # run against an archived tree

For the CC-family queries the returned frame sits on checkpointed RDDs
(the iterative loop already ran), so ``--cc-round`` additionally dumps
the plan of ONE label-propagation round over a toy edge set — the plan
the graph optimization actually changed.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--cc-round", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from vectorsearch_scylla_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from vectorsearch_scylla_spark.plans.registry import REGISTRY

    os.makedirs(args.out, exist_ok=True)
    for name in [n for n in args.names.split(",") if n]:
        df = REGISTRY[name].fn(spark, args.sf_dir)
        out = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        import contextlib as _ctx
        import io as _io

        buf = _io.StringIO()
        with _ctx.redirect_stdout(buf):
            df.explain("formatted")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print("wrote", out)

    if args.cc_round:
        # one label-propagation round, explained pre-execution: the
        # shape connected_components runs per iteration
        import vectorsearch_scylla_spark.operators.graph as G
        from pyspark.sql import functions as F

        edges = spark.range(100).selectExpr(
            "id AS id_a", "pmod(id * 7, 100) AS id_b"
        )
        sym = (
            edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
            .union(edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
            .distinct()
        )
        labels = (
            sym.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
        )
        # reproduce the round body WITHOUT the localCheckpoint so the
        # full round plan (joins/aggregations/exchanges) is visible
        src = open(os.path.join(args.repo, "vectorsearch_scylla_spark/operators/graph.py")).read()
        fused = "own_lbl" in src
        contact = sym.unionByName(
            labels.select(F.col("node").alias("u"), F.col("lbl").alias("v"))
        )
        if fused:
            contact = contact.unionByName(
                labels.select(F.col("node").alias("u"), F.col("node").alias("v"))
            )
            new_labels = (
                contact.join(labels.withColumnRenamed("node", "v"), "v")
                .groupBy("u")
                .agg(
                    F.min("lbl").alias("new_lbl"),
                    F.min(F.when(F.col("v") == F.col("u"), F.col("lbl"))).alias("own_lbl"),
                )
                .select(
                    F.col("u").alias("node"),
                    F.col("new_lbl").alias("lbl"),
                    (F.col("new_lbl") < F.col("own_lbl")).alias("chg"),
                )
            )
        else:
            nbr_min = (
                contact.join(labels.withColumnRenamed("node", "v"), "v")
                .groupBy("u")
                .agg(F.min("lbl").alias("nbr_lbl"))
                .withColumnRenamed("u", "node")
            )
            new_labels = labels.join(nbr_min, "node").select(
                "node",
                F.least(F.col("lbl"), F.col("nbr_lbl")).alias("lbl"),
                (F.col("nbr_lbl") < F.col("lbl")).alias("chg"),
            )
        out = os.path.join(args.out, f"cc_round_{args.suffix}.txt")
        buf = _io.StringIO()
        with _ctx.redirect_stdout(buf):
            new_labels.explain("formatted")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
