"""Dump the round-13 BEFORE plans: the r12 forms of int_assign_sql and
the capped ngram cascade, reconstructed exactly (see scripts/ab_r13.py),
so plans/r13/<name>_before.txt shows the plan the round started from.

Usage: python scripts/dump_r13_before_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_r13 import _old_int_assign_sql, _old_pair_intersections  # noqa: E402

from cassandra_sql_spark import sources  # noqa: E402
from cassandra_sql_spark.pipeline import dedup, similarity  # noqa: E402
from cassandra_sql_spark.queries import REGISTRY  # noqa: E402
from cassandra_sql_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r13",
)


def dump(df, name):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(OUT, f"{name}_before.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path}")


def main():
    os.makedirs(OUT, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-r13-before-plans")
    data = sources.optimize_layout(sf_dir)

    new_assign = similarity.int_assign_sql
    similarity.int_assign_sql = _old_int_assign_sql
    try:
        for name in ("emb_kmeans_clusters", "sim_ivf_topk", "sim_pq_topk",
                     "sim_ivfpq_topk"):
            dump(REGISTRY[name].fn(spark, data), name)
    finally:
        similarity.int_assign_sql = new_assign

    # the old capped cascade, wrapped exactly like dedup_ngram_jaccard
    from pyspark.sql import functions as F
    from cassandra_sql_spark.io import load

    docs = load(spark, data, "documents")
    inter = _old_pair_intersections(docs, "doc_id", "text", 3, 64)
    pairs = inter.select(
        "da", "db",
        (F.col("_inter").cast("double")
         / (F.col("na") + F.col("nb") - F.col("_inter"))).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.5)
    dump(pairs, "dedup_ngram_jaccard")

    # representative cascade consumers on the OLD pair source
    dump(dedup.dup_clusters(pairs), "dedup_clusters")
    cont = inter.filter(
        F.least(F.col("na"), F.col("nb")) >= 5
    ).select(
        "da", "db", F.col("na"), F.col("nb"),
        (F.col("_inter").cast("double")
         / F.least(F.col("na"), F.col("nb"))).alias("containment"),
    ).filter(F.col("containment") >= 0.8)
    dump(
        cont.select(
            "da", "db",
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            "containment",
        ),
        "dedup_containment",
    )


if __name__ == "__main__":
    main()
