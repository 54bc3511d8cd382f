"""Distributed graph ranking over an edge-list dataset: PageRank.

Crawl-curation pipelines rank hosts/documents by link structure to
weight or filter training data (quality ~ centrality).  The operator is
iterative: each round every node sends rank/outdeg to its outlinks and
new ranks are reduced per destination — the same hash-partitioned
message-delivery shape as ``georay.dedup.connected_components`` (edges
keyed by src meet rank rows keyed by node in ONE vectorized kernel per
partition; per-round shuffle volume is O(|E| + |V|) slim int64 rows,
contributions pre-aggregated per destination INSIDE the partition before
the reduce shuffle).

Arithmetic is integer fixed-point (rank scaled by ``SCALE``) so every
sum is order-independent and the result is EXACTLY reproducible — and
exactly mirrorable in SQL (floating-point PageRank would hash-mismatch
any oracle whose reduction order differs).  With damping d = 85/100:

    r_0(v)   = SCALE // N
    r_{t+1}(v) = (15 * (SCALE // N)) // 100
                 + sum over edges (u -> v) of (85 * r_t(u) // 100) // outdeg(u)

Dangling mass is NOT redistributed (nodes without outlinks leak their
rank, as in the simplified formulation); the SQL mirror does the same.
The node set is the distinct endpoints of the edge list.

No analog in the reference (a geometry utility library); this is the
mandated large-scale curation surface, same tier as dedup/ANN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 10**12
_MIX = np.uint64(0x9E3779B97F4A7C15)

#: synthetic outlink multipliers (tests/bench only; real pipelines bring
#: their own edge list).  dst_j = (src * A + (j+1) * B) % num_nodes —
#: valid while num_nodes * A < 2**63 (num_nodes < ~3.5e9), enough for
#: every test scale; the operator itself has no such bound.
LINK_A = 2654435761
LINK_B = 40503


def synthesize_outlinks_batch(batch: pa.Table, num_nodes: int, k: int = 3,
                              id_col: str = "doc_id") -> pa.Table:
    """Deterministic k-outlink edge rows per document (vectorized).
    SQL mirror: (doc_id*A + (j+1)*B) % num_nodes over range(k)."""
    src = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    srcs = np.repeat(src, k)
    j = np.tile(np.arange(1, k + 1, dtype=np.int64), len(src))
    dst = (srcs * LINK_A + j * LINK_B) % num_nodes
    return pa.table({"src": pa.array(srcs, pa.int64()),
                     "dst": pa.array(dst, pa.int64())})


def _part_of(key: np.ndarray, p: int) -> np.ndarray:
    h = key.astype(np.uint64) * _MIX
    h ^= h >> np.uint64(29)
    return (h % np.uint64(p)).astype(np.int32)


def pagerank(edges_ds, iters: int = 3, num_partitions: int | None = None):
    """Edge-list dataset (src, dst int64) -> (node, pr) integer
    fixed-point PageRank after ``iters`` synchronous rounds.

    Per round: edges (key=src) and rank rows (key=node) meet in hash
    partitions; one vectorized kernel per partition computes
    outdeg(src), gathers r(src), and emits per-destination PARTIAL sums
    (pre-aggregated inside the partition) plus a zero base row per rank
    row (so inlink-less nodes survive the reduce); a groupby(node) sum
    finishes the round.  Ranks materialize per round (slim 16 B/node).
    """
    import ray as _ray
    import ray.data as _rd
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "pr": pa.array([], pa.int64())})
    edges_ds = edges_ds.materialize()
    if edges_ds.count() == 0:
        return _rd.from_arrow(empty)
    if num_partitions is None:
        num_partitions = max(4, min(int(_ray.cluster_resources().get("CPU", 4)), 64))
    p = num_partitions

    def endpoints(b: pa.Table) -> pa.Table:
        u = b.column("src").to_numpy(zero_copy_only=False)
        v = b.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([u, v])), pa.int64())})

    def _typed(schema_cols):
        def fix(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({c: pa.array([], pa.int64()) for c in schema_cols})
            return b.select(schema_cols)
        return fix

    nodes = (
        edges_ds.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node").aggregate(_Count())  # distinct via grouped count
        .map_batches(_typed(["node"]), batch_format="pyarrow")
        .materialize()
    )
    n = nodes.count()
    r0 = SCALE // n
    base = (15 * (SCALE // n)) // 100

    def edge_msgs(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({
            "key": b.column("src"),
            "dst": b.column("dst"),
            "val": pa.array(np.full(len(src), -1, np.int64), pa.int64()),
            "part": pa.array(_part_of(src, p)),
        })

    def rank_msgs(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({
            "key": b.column("node"),
            "dst": pa.array(np.full(len(node), -1, np.int64), pa.int64()),
            "val": b.column("pr"),
            "part": pa.array(_part_of(node, p)),
        })

    def deliver(g: pd.DataFrame) -> pd.DataFrame:
        is_rank = g["dst"].to_numpy() < 0
        ranks = g[is_rank]
        r = ranks.set_index("key")["val"]
        e = g[~is_rank]
        out = [pd.DataFrame({"node": ranks["key"].to_numpy(),
                             "contrib": np.zeros(len(ranks), np.int64)})]
        if len(e):
            src = e["key"].to_numpy()
            outdeg = e.groupby("key").size()
            share = (85 * r // 100) // outdeg  # per-src contribution
            contrib = share.reindex(src).to_numpy()
            if contrib.dtype.kind == "f":  # src with no rank row: skip
                ok = ~np.isnan(contrib)
                src, contrib = src[ok], contrib[ok]
                dstv = e["dst"].to_numpy()[ok]
            else:
                dstv = e["dst"].to_numpy()
            part = pd.DataFrame({"node": dstv,
                                 "contrib": contrib.astype(np.int64)})
            # pre-aggregate per destination before the reduce shuffle
            out.append(part.groupby("node", as_index=False)["contrib"].sum())
        return pd.concat(out, ignore_index=True)

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        c = b.column("contrib").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": b.column("node"),
                         "pr": pa.array(base + c, pa.int64())})

    ranks = nodes.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "pr": pa.array(np.full(b.num_rows, r0, np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    emsgs = edges_ds.map_batches(edge_msgs, batch_format="pyarrow").materialize()
    for _ in range(iters):
        msgs = emsgs.union(ranks.map_batches(rank_msgs, batch_format="pyarrow"))
        ranks = (
            msgs.groupby("part")
            .map_groups(deliver, batch_format="pandas")
            .groupby("node")
            .aggregate(_Sum("contrib", alias_name="contrib"))
            .map_batches(_typed(["node", "contrib"]), batch_format="pyarrow")
            .map_batches(finish, batch_format="pyarrow")
            .materialize()
        )
    return ranks
