"""Round-13 sandwich A/Bs, one JVM, interleaved old/new (guide §1).

Measures:
  1. the lambda-bound assignment argmin (similarity.int_assign_sql) vs
     the round-12 double-evaluation form, on the ANN/k-means family;
  2. the partition-preserving persisted ngram-cascade index vs the
     round-12 localCheckpoint form, on the capped cascade family.

Each variant is noop-timed (full rebuild inside the timed region, like
bench.py's rebuild protocol), alternating variants within one session so
box drift cancels. Also records executed-plan Exchange counts.

Usage: python scripts/ab_r13.py <assign|cascade> [reps] [sf_dir]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cassandra_sql_spark import sources  # noqa: E402
from cassandra_sql_spark.pipeline import dedup, similarity  # noqa: E402
from cassandra_sql_spark.queries import REGISTRY  # noqa: E402
from cassandra_sql_spark.session import get_spark  # noqa: E402


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def _timed(spark, build, label):
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df = build()
    _noop(df)
    dt = time.time() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    spark.sparkContext.setJobDescription(None)
    return dt, n_ex


# ---- variant plumbing -------------------------------------------------

def _old_int_assign_sql(cents, xq_sql="_xq"):
    """Round-12 form: distance array textually duplicated, xq inlined."""
    dists = ",".join(
        similarity._int_sq_dist_sql(c, xq_sql) for c in cents
    )
    return (
        f"CAST(array_position(array({dists}), "
        f"array_min(array({dists}))) - 1 AS INT)"
    )


def _old_pair_intersections(df, id_col, text_col, k=3, df_cutoff=None):
    """Round-12 capped branch: localCheckpoint, both aggs re-shuffle."""
    grams = F.expr(
        f"element_at(transform(array({dedup.shingles_sql(f'`{text_col}`', k)}), "
        f"s -> transform(s, g -> named_struct("
        f"'_n', size(s), '_g', xxhash64(g)))), 1)"
    )
    ex = (
        dedup.spread(df)
        .select(F.col(id_col).alias("_id"), F.explode(grams).alias("_e"))
        .select(
            F.struct("_id", F.col("_e._n").alias("_n")).alias("_d"),
            F.col("_e._g").alias("_g"),
        )
    )
    assert df_cutoff is not None
    ex = ex.localCheckpoint(eager=True)
    hot = ex.groupBy("_g").count().filter(F.col("count") > df_cutoff)
    posting = (
        ex.join(F.broadcast(hot.select("_g")), "_g", "left_anti")
        .groupBy("_g")
        .agg(F.collect_list("_d").alias("_ds"))
        .filter(F.size("_ds") >= 2)
    )
    cand = (
        posting.select(F.explode("_ds").alias("_a"), "_ds")
        .select("_a", F.explode("_ds").alias("_b"))
        .filter(F.col("_a._id") < F.col("_b._id"))
    )
    return cand.groupBy(
        F.col("_a._id").alias("da"),
        F.col("_b._id").alias("db"),
        F.col("_a._n").alias("na"),
        F.col("_b._n").alias("nb"),
    ).agg(F.count(F.lit(1)).alias("_inter"))


def main():
    which = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("ab-r13")
    data = sources.optimize_layout(sf_dir)

    if which == "assign":
        names = [
            "emb_kmeans_clusters", "sim_ivf_topk", "sim_pq_topk",
            "sim_ivfpq_topk",
        ]
        new_fn = similarity.int_assign_sql
        for name in names:
            # warm both variants once
            for fn in (new_fn, _old_int_assign_sql):
                similarity.int_assign_sql = fn
                _noop(REGISTRY[name].fn(spark, data))
            res = {"new": [], "old": []}
            ex_counts = {}
            for _ in range(reps):
                for tag, fn in (("new", new_fn), ("old", _old_int_assign_sql)):
                    similarity.int_assign_sql = fn
                    dt, n_ex = _timed(
                        spark, lambda: REGISTRY[name].fn(spark, data),
                        f"{name}:{tag}")
                    res[tag].append(round(dt, 3))
                    ex_counts[tag] = n_ex
            similarity.int_assign_sql = new_fn
            mo = sorted(res["old"])[len(res["old"]) // 2]
            mn = sorted(res["new"])[len(res["new"]) // 2]
            print(f"{name}: old={res['old']} new={res['new']} "
                  f"median old={mo:.3f} new={mn:.3f} "
                  f"speedup={mo / mn:.3f} exchanges={ex_counts}")

    elif which == "cascade":
        docs = None

        def new_build():
            return dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.5, df_cutoff=64)

        def old_build():
            inter = _old_pair_intersections(
                docs, "doc_id", "text", k=3, df_cutoff=64)
            pairs = inter.select(
                "da", "db",
                (F.col("_inter").cast("double")
                 / (F.col("na") + F.col("nb") - F.col("_inter"))
                 ).alias("jaccard"),
            )
            return pairs.filter(F.col("jaccard") >= 0.5)

        from cassandra_sql_spark.io import load
        docs = load(spark, data, "documents")
        # identity check first: exceptAll both ways
        a, b = new_build(), old_build()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        print("identity: new == old (exceptAll both ways)")
        for fn in (new_build, old_build):
            _noop(fn())  # warm
        res = {"new": [], "old": []}
        ex_counts = {}
        for _ in range(reps):
            for tag, fn in (("new", new_build), ("old", old_build)):
                dt, n_ex = _timed(spark, fn, f"cascade:{tag}")
                res[tag].append(round(dt, 3))
                ex_counts[tag] = n_ex
        mo = sorted(res["old"])[len(res["old"]) // 2]
        mn = sorted(res["new"])[len(res["new"]) // 2]
        print(f"dedup_ngram_jaccard: old={res['old']} new={res['new']} "
              f"median old={mo:.3f} new={mn:.3f} "
              f"speedup={mo / mn:.3f} exchanges={ex_counts}")


if __name__ == "__main__":
    main()
