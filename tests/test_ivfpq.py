"""IVF-PQ composite index: both prunings must be visible in the probe
plan — partition (directory) pruning from the coarse quantizer AND
column pruning down to the codes column for the ADC stage."""

from __future__ import annotations

import pytest

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import similarity


@pytest.fixture(scope="module")
def ivfpq(spark, sf_dir, tmp_path_factory):
    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    cents, books = similarity.write_ivfpq_index(
        emb, path, n_centroids=8, m=4, k_codes=16
    )
    return emb, path, cents, books


def test_ivfpq_probe_prunes_partitions_and_columns(spark, ivfpq):
    emb, path, cents, books = ivfpq
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    out = similarity.topk_ivfpq_pruned(
        spark, path, cents, books, qv, k=10, nprobe=2, shortlist=40
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # directory pruning: the coarse-centroid IN-list reaches the scan as
    # a PartitionFilter (not a post-scan Filter)
    assert "PartitionFilters: [" in plan
    assert "_cid" in plan.split("PartitionFilters:", 1)[1][:200], plan
    # column pruning: the ADC stage's scan reads codes, never the vector
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert any(
        "_codes" in ln and "embedding" not in ln for ln in scans
    ), plan
    got = out.collect()
    assert len(got) == 10
    assert got == sorted(got, key=lambda r: (r["dist"], r["vec_id"]))


def test_ivfpq_runtime_reads_subset_of_partitions(spark, ivfpq):
    emb, path, cents, books = ivfpq
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    # nprobe=1 must read strictly fewer files than the full index
    import glob

    n_parts = len(glob.glob(f"{path}/_cid=*"))
    assert n_parts >= 4  # coarse quantizer actually spread the data
    one = similarity.topk_ivfpq_pruned(
        spark, path, cents, books, qv, k=5, nprobe=1, shortlist=20
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_ivfpq_models_are_deterministic(spark, sf_dir, ivfpq, tmp_path):
    emb, _, cents, books = ivfpq
    path2 = str(tmp_path / "idx2")
    cents2, books2 = similarity.write_ivfpq_index(
        emb, path2, n_centroids=8, m=4, k_codes=16
    )
    assert cents2 == cents and books2 == books


def test_ivfpq_recall_within_probed_lists(spark, ivfpq):
    """Within the probed partitions the two-stage PQ probe must find the
    same ids an exact scan of those partitions finds (shortlist large
    enough to cover): the approximation is WHICH lists are read, the
    re-rank inside them is exact."""
    emb, path, cents, books = ivfpq
    rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    qv = rows[0]
    got = [
        r["vec_id"]
        for r in similarity.topk_ivfpq_pruned(
            spark, path, cents, books, qv, k=5, nprobe=8, shortlist=10**6
        ).collect()
    ]
    # nprobe = all lists + unbounded shortlist -> exact top-k (incl. the
    # query vector itself at distance 0)
    exact = [
        i
        for _, i in sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, v)), i)
            for i, v in rows.items()
        )[:5]
    ]
    assert got == exact
