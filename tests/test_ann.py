"""IVF ANN: full-probe exactness vs brute force, partial-probe recall on
clustered data, determinism."""

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.operators import ann


@pytest.fixture(scope="module")
def clustered(spark):
    """8 well-separated gaussian clusters in 16-d (unit-normalized)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 16)) * 4
    rows = []
    for i in range(800):
        c = i % 8
        v = centers[c] + rng.normal(size=16) * 0.3
        rows.append((i, (v / np.linalg.norm(v)).astype("float32").tolist(), f"c{c}"))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    return spark.createDataFrame(pdf), pdf


def _brute_topk(pdf, qpdf, k):
    m = np.asarray([np.asarray(v, float) for v in pdf["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for qid, qv in zip(qpdf["query_id"], qpdf["qemb"]):
        q = np.asarray(qv, float)
        q = q / np.linalg.norm(q)
        sims = m @ q
        order = np.lexsort((pdf["vec_id"].to_numpy(), -sims))[:k]
        out[qid] = [int(pdf["vec_id"].iloc[i]) for i in order]
    return out


def test_full_probe_equals_bruteforce(spark, clustered):
    df, pdf = clustered
    qpdf = pd.DataFrame(
        {"query_id": [0, 1, 2], "qemb": [pdf["embedding"].iloc[i] for i in (0, 1, 2)]}
    )
    q = spark.createDataFrame(qpdf)
    out = ann.ann_ivf(df, q, k=5, n_centroids=8, n_probe=8).toPandas()
    exp = _brute_topk(pdf, qpdf, 5)
    for qid, ids in exp.items():
        got = list(out[out["query_id"] == qid].sort_values("rank")["vec_id"])
        assert got == ids


def test_partial_probe_recall(spark, clustered):
    """Probing 2 of 8 clusters on well-separated data must still recover
    ≥90% of the true top-5 (each query's neighbours live in its cluster)."""
    df, pdf = clustered
    qids = list(range(0, 40, 5))
    qpdf = pd.DataFrame(
        {"query_id": qids, "qemb": [pdf["embedding"].iloc[i] for i in qids]}
    )
    q = spark.createDataFrame(qpdf)
    out = ann.ann_ivf(df, q, k=5, n_centroids=8, n_probe=2).toPandas()
    exp = _brute_topk(pdf, qpdf, 5)
    hits = total = 0
    for qid, ids in exp.items():
        got = set(out[out["query_id"] == qid]["vec_id"])
        hits += len(got & set(ids))
        total += len(ids)
    assert hits / total >= 0.9


def test_empty_queries_and_empty_corpus(spark, clustered):
    """ADVICE round 2 (low): empty query/corpus frames used to crash
    createDataFrame schema inference / argmax-over-empty; both now
    early-return a typed empty (query_id, rank, vec_id, sim) frame."""
    df, pdf = clustered
    empty_q = spark.createDataFrame(
        pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                      "qemb": pd.Series([], dtype=object)}),
        schema="query_id long, qemb array<double>",
    )
    out = ann.ann_ivf(df, empty_q, k=5, n_centroids=8, n_probe=8)
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "vec_id", "sim"]

    empty_c = df.limit(0)
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "qemb": [pdf["embedding"].iloc[0]]})
    )
    out2 = ann.ann_ivf(empty_c, q, k=5, n_centroids=8, n_probe=8)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "rank", "vec_id", "sim"]


def test_deterministic(spark, clustered):
    df, pdf = clustered
    qpdf = pd.DataFrame({"query_id": [3], "qemb": [pdf["embedding"].iloc[3]]})
    q = spark.createDataFrame(qpdf)
    a = ann.ann_ivf(df, q, k=5, n_centroids=8, n_probe=3).toPandas()
    b = ann.ann_ivf(df, q, k=5, n_centroids=8, n_probe=3).toPandas()
    assert a.equals(b)
