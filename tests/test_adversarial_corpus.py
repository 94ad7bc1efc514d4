"""Adversarial-corpus differential: every documents-family oracle entry
re-checked on a pathological mini-corpus — empty text, single token,
whitespace-only, exact short duplicates, all-stopwords, near-dup long
docs, multibyte unicode — against the same DuckDB oracle compare the
driver uses.

This is the net that caught the short-doc partial-gram divergence and
the empty-payload frame fabrication (Spark's sequence(0,-1) descends);
fixtures alone can't, because the synthetic corpus contains only long
ASCII docs.

The two multimodal byte-level entries are excluded for the ONE unicode
doc: their oracles replay byte arithmetic on text, which is stated to
assume ASCII (char offsets == byte offsets); DuckDB has no blob
substring/md5 to express the byte-true form.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from cassandra_sql_spark.queries import REGISTRY
from cassandra_sql_spark.testing import compare

pytestmark = pytest.mark.slow

ADV_ROWS = [
    (1, "", "en", "src0", 0),
    (2, "one", "en", "src0", 3),
    (3, "   ", "de", "src1", 3),
    (4, "a b", "fr", "src1", 3),
    (5, "a b c", "en", "src2", 5),
    (6, "a b c", "en", "src2", 5),          # exact short duplicate
    (7, "the the the the the the", "en", "src3", 23),  # all stopwords
    (8, "the quick brown fox jumps over the lazy dog again and again",
     "en", "src3", 60),
    (9, "the quick brown fox jumps over the lazy dog again and again!",
     "zh", "src4", 61),                      # near-dup of 8
    (10, "café naïve 中文 tokens mixed in here today", "es", "src4", 40),
]

# oracles replay byte arithmetic on chars — ASCII-only by contract
BYTE_ORACLE_ENTRIES = {"multimodal_frame_sample", "multimodal_resize"}


def _doc_only_targets():
    import re as _re

    out = []
    others = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events")
    for name, q in REGISTRY.items():
        if q.oracle is None or name in BYTE_ORACLE_ENTRIES:
            continue
        o = q.oracle.lower()
        # word-boundary: "part" must not match PARTITION etc.
        if _re.search(r"\bdocuments\b", o) and not any(
            _re.search(rf"\b{t}\b", o) for t in others
        ):
            out.append(name)
    return out


@pytest.fixture(scope="module")
def adv_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("advcorpus"))
    spark.createDataFrame(
        ADV_ROWS,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    src = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{d}/embeddings.parquet")
    else:
        shutil.copy(src, f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        p = f"{adv_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_doc_only_targets()))
def test_adversarial_corpus_matches_oracle(name, spark, adv_dir, adv_duck):
    q = REGISTRY[name]
    df = q.fn(spark, adv_dir)
    srows = [tuple(r) for r in df.collect()]
    res = adv_duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = compare(srows, df.columns, orows, ocols, strict=True)
    assert not problems, f"{name}: {problems}"
