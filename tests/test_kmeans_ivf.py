"""Integer-exact k-means IVF trainer (operators/similarity.py).

The training loop's whole correctness story is "any engine replays it
bit-for-bit", so the pin here is a pure-Python replica: quantize with
floor(x * 2^20), Lloyd-iterate with int squared-L2 / exact floor division,
and require the Spark trainer to match EXACTLY on a seeded random corpus —
including the empty-cell keep-previous rule and the (distance, cell)
tie-break.
"""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import Row, functions as F

from postgresql_cdc_spark.operators import similarity as sim

SCALE = sim.KMEANS_SCALE


def _quant(vec):
    return [math.floor(float(x) * SCALE) for x in vec]


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _assign(qv, cents):
    return min(range(len(cents)), key=lambda j: (_d2(qv, cents[j]), j))


def _py_kmeans(vecs_by_id, k, iters):
    """Pure-Python replica of train_centroids_kmeans."""
    ids = sorted(vecs_by_id)
    q = {i: _quant(vecs_by_id[i]) for i in ids}
    cents = [q[i] for i in ids[:k]]
    for _ in range(iters):
        members = {}
        for i in ids:
            members.setdefault(_assign(q[i], cents), []).append(i)
        new = list(cents)
        for cell, mids in members.items():
            dim = len(cents[cell])
            new[cell] = [
                sum(q[i][p] for i in mids) // len(mids) for p in range(dim)
            ]
        cents = new
    return q, cents


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(20260814)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-0.6, 0.6) for _ in range(8)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    # floats went through a float32 round trip on the Spark side; replicate
    # for the Python reference by collecting the stored values back.
    stored = {r.vec_id: r.embedding for r in df.collect()}
    return df, stored


class TestKmeansTrainer:
    def test_matches_python_replica(self, corpus):
        df, stored = corpus
        cents = sim.train_centroids_kmeans(df, n_centroids=5, iters=2)
        _, expect = _py_kmeans(stored, 5, 2)
        assert cents == expect

    def test_assignment_matches_python(self, corpus):
        df, stored = corpus
        cents = sim.train_centroids_kmeans(df, n_centroids=5, iters=2)
        got = {
            r.vec_id: r.cell
            for r in sim.assign_cells_trained(df, cents).collect()
        }
        q, _ = _py_kmeans(stored, 5, 2)
        expect = {i: _assign(q[i], cents) for i in q}
        assert got == expect

    def test_empty_cell_keeps_previous_centroid(self, spark):
        # Two tight clusters; seeds 0/1/2 all land in cluster A, so after one
        # iteration at least one seed cell is empty and must keep its seed
        # centroid verbatim.
        rows = [Row(vec_id=i, embedding=[0.1 + i * 1e-6, 0.1]) for i in range(3)]
        rows += [Row(vec_id=10 + i, embedding=[0.5, 0.5 + i * 1e-6]) for i in range(3)]
        df = spark.createDataFrame(rows).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        stored = {r.vec_id: r.embedding for r in df.collect()}
        cents = sim.train_centroids_kmeans(df, n_centroids=3, iters=2)
        _, expect = _py_kmeans(stored, 3, 2)
        assert cents == expect

    def test_probe_order_matches_python(self, corpus):
        df, stored = corpus
        cents = sim.train_centroids_kmeans(df, n_centroids=5, iters=2)
        out = df.select(
            "vec_id",
            F.expr(
                sim.topn_cells_sql(sim.quantize_sql("embedding"), cents, 3)
            ).alias("cells"),
        ).collect()
        q, _ = _py_kmeans(stored, 5, 2)
        for r in out:
            order = sorted(range(5), key=lambda j: (_d2(q[r.vec_id], cents[j]), j))
            assert list(r.cells) == order[:3]
