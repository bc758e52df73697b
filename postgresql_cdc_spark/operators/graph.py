"""Iterative graph computation in plain DataFrame ops: connected components
by min-label propagation — the step that turns near-duplicate PAIRS into
dedup GROUPS (every doc gets the smallest doc-id reachable through the
similarity graph; keep one representative per label, drop the rest) — and
integer-exact weighted PageRank (``pagerank_int``).

Shape: the classic bounded-iteration dataflow loop (what GraphX/Pregel do
under the hood) written in plain DataFrame ops —

    labels(i+1) = min(labels(i), min over neighbors of labels(i))

Each iteration is one equi-join + one hash agg, both keyed on node id, so
every round is a co-partitioned shuffle of the (skinny) label table; the
edge table never re-shuffles after the first iteration under AQE reuse.
Convergence needs at most graph-diameter rounds — for near-dup clusters
(tiny cliques and chains) that is single digits; ``max_iter`` bounds the
pathological case. ``localCheckpoint`` truncates the growing lineage each
round — without it the plan doubles per iteration and the driver dies on
analysis long before the cluster breaks a sweat.

The driver-side loop controls ITERATION COUNT ONLY (a convergence scalar per
round) — no data ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component is
    the minimum node id in the connected component. Isolated nodes (absent
    from edges) are the caller's to add — they are their own component.

    Raises ``RuntimeError`` if labels are still changing after ``max_iter``
    rounds (component diameter exceeds the bound): wrong-but-plausible labels
    would otherwise surface only as a hard-to-diagnose downstream mismatch.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)  # edges reused every round

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    # Convergence from monotonicity, same trick as ``bfs_hops``: the node
    # set is fixed and labels only ever decrease, so sum(label) is invariant
    # exactly at the fixpoint — one tiny scalar agg per round over the
    # just-materialized checkpoint blocks, no changed-flag column and no
    # second scan. DECIMAL(38,0) keeps the sum exact (node ids can be
    # near-2^63 hashes; a wrapped BIGINT sum could in principle collide
    # across rounds).
    label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    prev = labels.agg(label_sum).first()[0]
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neighbor_min, labels.id == F.col("a"), "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur = labels.agg(label_sum).first()[0]
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter — "
            "labels at this point would be plausible but wrong"
        )
    return labels.select(F.col("id"), F.col("label").alias("component"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, hops) = shortest hop count from the seed set, by min-distance
    relaxation: dist(i+1) = min(dist(i), 1 + min over in-neighbors dist(i)).

    Directed: follows ``src -> dst`` edges as given; pass a symmetrized edge
    list for undirected semantics. Nodes unreachable from the seeds are
    absent from the output (never a fake sentinel distance).

    Shape per round: one equi-join of the edge list against the skinny
    (id, d) frontier table + one min-agg on the node id — co-partitioned
    shuffles only, same dataflow-loop contract as ``connected_components``
    (localCheckpoint truncates lineage; the driver sees one scalar per
    round). Convergence detection uses monotonicity: under min-relaxation
    the reached-node count never shrinks and no distance ever grows, so the
    (count, sum(d)) pair is invariant exactly at the fixpoint — one tiny
    agg per round, no join against the previous state.

    Raises if still changing after ``max_iter`` rounds, for the same
    reason ``connected_components`` does: a silently-truncated BFS returns
    plausible but wrong distances.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .withColumn("d", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    row = dist.agg(F.count(F.lit(1)), F.sum("d")).first()
    prev = (row[0], row[1] or 0)
    for _ in range(max_iter):
        cand = e.join(dist, e.s == dist.id).select(
            F.col("t").alias("id"), (F.col("d") + F.lit(1)).alias("d")
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("id")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        row = dist.agg(F.count(F.lit(1)), F.sum("d")).first()
        cur = (row[0], row[1] or 0)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"bfs_hops did not converge in {max_iter} rounds (graph "
            "diameter from the seed set exceeds the bound); raise max_iter"
        )
    return dist.select("id", F.col("d").alias("hops"))


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    n_nodes: int,
    iters: int = 3,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Weighted PageRank with INTEGER-EXACT arithmetic: ``iters`` power
    iterations at damping 0.85 (= 17/20 exactly), every rank a BIGINT in
    units of 1/``scale``.

    Floating PageRank is engine- and order-dependent (float sums); keeping
    ranks as scaled integers with the per-edge contribution floored —

        r'(v) = floor(3*scale / (20*N))
              + sum over u->v of floor(17 * r(u) * w(u,v) / (20 * W(u)))

    — makes every iteration bit-reproducible anywhere (the DuckDB oracle
    replays the identical chain), the same determinism trick as the k-means
    IVF trainer. Dangling mass and floor dust are dropped identically on
    both engines (ranks then sum slightly under ``scale``; ordering — the
    thing PageRank is FOR — is unaffected).

    Shape per iteration: one equi-join of the skinny (src,dst,w,wout) edge
    table against the rank table + one hash agg on dst + a left join back
    to the node set — all keyed shuffles, no driver data path. ``n_nodes``
    is metadata (the caller counts its dimension table, cf.
    similarity.infer_dim). Overflow bound: 17 * r * w must fit in int64;
    it is ENFORCED per row — rows where the product would overflow raise
    (``raise_error`` inside codegen, no extra pass) instead of silently
    wrapping in non-ANSI Spark while the oracle promotes to HUGEINT; shrink
    ``scale`` when edge weights grow (w scales with fact-table size).

    Persist contract: ``edges``-derived state is persisted for reuse across
    iterations; the caller clears the cache after materializing (same
    contract as operators/dedup).
    """
    # Persist the RAW edge list before deriving out-weights: ``edges`` is
    # referenced twice below (probe side and the outw aggregate), and without
    # this the whole upstream edge build — typically an expensive fact-table
    # join — executes twice inside the persisted (src,dst,w,wout) relation.
    edges = edges.persist()
    outw = edges.groupBy(src).agg(F.sum(w).alias("wout"))
    e = (
        edges.join(outw, src)
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                F.col(w).alias("w"), "wout")
        .persist()
    )
    tele = (3 * scale) // (20 * n_nodes)
    r = nodes.select(
        F.col(nodes.columns[0]).alias("id"),
        F.lit(scale // n_nodes).cast("long").alias("r"),
    )
    # Fail loudly instead of wrapping: check r against INT64_MAX DIV (17*w)
    # BEFORE forming 17*r*w (the product itself would overflow first). A
    # zero-weight edge short-circuits to 0 so the guard never divides by
    # zero (its contribution is exactly 0 regardless of r).
    _c = (
        "CAST(CASE WHEN w = 0 THEN 0 "
        f"WHEN r <= CAST({2**63 - 1} AS BIGINT) DIV (17 * w) "
        "THEN (17 * r * w) DIV (20 * wout) "
        "ELSE raise_error('pagerank_int: 17*r*w overflows int64 (r=' || r "
        "|| ', w=' || w || '); shrink scale') END AS BIGINT)"
    )
    for _ in range(iters):
        contrib = (
            e.join(r, e.src == r.id)
            .select(F.col("dst").alias("id"), F.expr(_c).alias("c"))
        )
        agg = contrib.groupBy("id").agg(F.sum("c").alias("cin"))
        r = (
            nodes.select(F.col(nodes.columns[0]).alias("id"))
            .join(agg, "id", "left")
            .select(
                "id",
                (F.lit(tele) + F.coalesce(F.col("cin"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
    return r
