"""Round-10 advisor fixes: the sparse-vec_id training-prefix guard in
the PQ and IVF builders (ADVICE r9: a corpus whose vec_ids all sit at or
above the training cap seeded an EMPTY codebook, and ``_kmeans``'s
empty-init branch silently returned an empty assignment — with the
oracle mirroring the bug, so certification could not catch it).

The guard: ``corpus_fingerprint`` now carries ``min_vec_id``; when no id
falls under the cap, training falls back to the full relation (the
pre-sample recipe) on the Spark side, and the oracle CTEs mirror it with
a ``NOT EXISTS`` branch — so the fix itself stays cross-engine-certified
on exactly the corpus shape that used to break.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from waterbear_spark.queries import llm, wave20
from waterbear_spark.testing import compare_frames

_OFFSET = 20000  # > both training caps (PQ 16384, IVF max(16384, 32*kneed))


@pytest.fixture()
def sparse_corpus(spark, tmp_path, monkeypatch):
    """A tiny embeddings corpus whose vec_ids ALL exceed the training
    caps, with a fresh staged-index dir and cleared memos."""
    monkeypatch.setenv("SPARK_GRAFT_ANN_INDEX_DIR", str(tmp_path / "idx"))
    sf_dir = str(tmp_path / "corpus")
    rows = [
        (_OFFSET + i, [float((7 * i + j * j) % 13) for j in range(8)])
        for i in range(24)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    llm._IVF_MEMO.clear()
    wave20._PQ_MEMO.clear()
    yield sf_dir
    llm._IVF_MEMO.clear()
    wave20._PQ_MEMO.clear()


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    glob = os.path.join(sf_dir, "embeddings.parquet", "*.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{glob}')"
    )
    res = con.execute(sql)
    return [d[0] for d in res.description], res.fetchall()


def test_pq_codes_nonempty_on_sparse_ids(spark, sparse_corpus):
    codes, cb = wave20._pq_codes(spark, sparse_corpus)
    n_codes = codes.filter(F.col("code").isNotNull()).count()
    assert n_codes == 24 * wave20._PQ_M  # every (vector, subspace) coded
    assert cb.count() > 0


def test_pq_audit_oracle_parity_on_sparse_ids(spark, sparse_corpus):
    sdf = wave20.pq_reconstruction_audit(spark, sparse_corpus)
    d_cols, d_rows = _duck(sparse_corpus, wave20.PQ_AUDIT_SQL)
    assert compare_frames(sdf.columns, sdf.collect(), d_cols, d_rows) == []


def test_ivf_cells_assigned_on_sparse_ids(spark, sparse_corpus):
    cells, centroids, params = llm._ivf_index(spark, sparse_corpus)
    assert cells.filter(F.col("cell").isNotNull()).count() == 24
    assert centroids.count() > 0


def test_ivf_kmeans_oracle_parity_on_sparse_ids(spark, sparse_corpus):
    sdf = llm.ann_ivf_kmeans(spark, sparse_corpus)
    d_cols, d_rows = _duck(sparse_corpus, llm.ANN_IVF_SQL)
    assert compare_frames(sdf.columns, sdf.collect(), d_cols, d_rows) == []
