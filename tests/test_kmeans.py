"""kmeans_fit: distributed Lloyd's iterations must match a NumPy
reference run from the same deterministic init."""

from __future__ import annotations

import numpy as np

SF_DIR = "/root/testdata/sf0.001"
K, ITERS = 4, 3


def _numpy_kmeans(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    cents = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        # lowest-cid tie-break == argmin's first-match semantics
        assign = d2.argmin(axis=1)
        for c in range(k):
            pts = X[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def test_kmeans_matches_numpy_reference(spark):
    from prox_spark.queries.similarity import _emb_n, kmeans_fit

    emb = _emb_n(spark, SF_DIR)
    got = kmeans_fit(emb, k=K, max_iters=ITERS)
    assert [cid for cid, _ in got] == list(range(K))

    X = np.array(
        [r["dd"] for r in emb.select("vec_id", "dd").orderBy("vec_id").collect()]
    )
    want = _numpy_kmeans(X, K, ITERS)
    got_arr = np.array([vec for _, vec in got])
    # distributed mean sums in nondeterministic order -> allclose, not equal
    assert np.allclose(got_arr, want, rtol=1e-9, atol=1e-12)


def test_kmeans_reduces_sse(spark):
    from prox_spark.queries.similarity import _emb_n, kmeans_fit

    emb = _emb_n(spark, SF_DIR)
    X = np.array([r["dd"] for r in emb.select("dd").collect()])

    def sse(cents):
        C = np.array([vec for _, vec in cents])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    c0 = kmeans_fit(emb, k=K, max_iters=0)
    c1 = kmeans_fit(emb, k=K, max_iters=1)
    c3 = kmeans_fit(emb, k=K, max_iters=3)
    assert sse(c1) <= sse(c0)
    assert sse(c3) <= sse(c1) + 1e-9


def test_ivf_index_partition_prunes(spark, tmp_path):
    import contextlib
    import io

    from prox_spark.queries.similarity import (
        _emb_n,
        build_ivf_index,
        kmeans_fit,
        probe_ivf_index,
    )

    emb = _emb_n(spark, SF_DIR)
    cents = kmeans_fit(emb, k=K, max_iters=1)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, cents, path)

    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("cid="))
    assert len(dirs) == K  # every cluster materialized

    probed = probe_ivf_index(spark, path, [0, 2])
    got_cids = {r.cid for r in probed.select("cid").distinct().collect()}
    assert got_cids == {0, 2}
    # the filter must prune at planning time, not post-scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cid" in line
    # total rows across all clusters == corpus
    assert spark.read.parquet(path).count() == emb.count()
