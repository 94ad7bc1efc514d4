"""Round-12 identity pins for the reworked exact-integer training paths.

The optimizations (one materialized quantized frame, one shared seed
fetch, merged per-iteration multi-subspace training, single-parse SQL
assignment/ADC expressions, lambda-bound assignment beside the explode)
must be invisible in the values: every centroid, codeword and argmin is
the same int64 arithmetic over the same rows.
"""

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import similarity


def _quant(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return similarity.quantized_vectors(emb, unit=True).localCheckpoint(
        eager=True
    )


def test_pq_books_int_matches_per_subspace_lloyd(spark, sf_dir):
    """The merged one-job-per-iteration trainer returns exactly the
    books the m independent lloyd_int loops produced."""
    m, k_codes, iters = 4, 16, 2
    subdim = similarity.DIM // m
    quant = _quant(spark, sf_dir)
    old = []
    for s in range(m):
        sliced = quant.select(
            "vec_id", F.slice("_xq", s * subdim + 1, subdim).alias("_xq")
        )
        old.append(similarity.lloyd_int(sliced, k_codes, iters))
    new = similarity.pq_books_int(quant, m, subdim, k_codes, iters)
    assert new == old


def test_seed_rows_prefix_property(spark, sf_dir):
    """One fetch of max(k) seed rows serves every consumer: a smaller
    k's seeds are exactly the prefix, and per-subspace seeds are slices
    of the same rows (the ordering ignores coordinates)."""
    quant = _quant(spark, sf_dir)
    s16 = similarity.seed_rows(quant, 16)
    s8 = similarity.seed_rows(quant, 8)
    assert s8 == s16[:8]
    subdim = similarity.DIM // 4
    sliced = quant.select(
        "vec_id", F.slice("_xq", subdim + 1, subdim).alias("_xq")
    )
    assert similarity.seed_rows(sliced, 16) == [
        r[subdim: 2 * subdim] for r in s16
    ]


def test_int_assign_sql_matches_column_form(spark, sf_dir):
    """The single-parse SQL assignment is value-identical to the
    Column-API argmin, including ties (array_position first-match)."""
    quant = _quant(spark, sf_dir)
    cents = similarity.seed_rows(quant, 8)
    old = quant.select(
        "vec_id", similarity.int_assign_col(cents).alias("c")
    )
    new = quant.select(
        "vec_id", F.expr(similarity.int_assign_sql(cents)).alias("c")
    )
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_lloyd_int_seeds_param_is_identity(spark, sf_dir):
    """lloyd_int(seeds=pre-fetched) == lloyd_int fetching its own."""
    quant = _quant(spark, sf_dir)
    seeds = similarity.seed_rows(quant, 8)
    assert similarity.lloyd_int(quant, 8, 2) == similarity.lloyd_int(
        quant, 8, 2, seeds=seeds
    )
    # a larger shared fetch truncates to the first n_clusters rows
    seeds16 = similarity.seed_rows(quant, 16)
    assert similarity.lloyd_int(
        quant, 8, 2, seeds=seeds16
    ) == similarity.lloyd_int(quant, 8, 2)
