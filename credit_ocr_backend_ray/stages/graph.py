"""Distributed graph operators: connected components over an edge list.

The reference has no graph stage; this belongs to the training-data-
pipeline layer (SURVEY §2.10a): near-dup candidate pairs, session graphs
and host/link graphs all reduce to "find the components of an edge set
too large for one node". ``stages/dedup.py:cluster_pairs`` deliberately
runs union-find on the driver because verified near-dup pairs are tiny;
this module is the path for when the EDGE SET itself is cluster-scale.

Algorithm: min-label propagation (the MapReduce-CC classic — Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14, describes
this family). Every node keeps a label = the smallest node id it has
heard of; each round every node sends its label to its neighbors and
keeps the minimum of what arrives. Fixpoint = component minima. Rounds
needed = graph diameter — small for the star/near-clique components of
dedup and session graphs; the same paper's alternating large-star /
small-star variant drops it to O(log² n) if a deep-chain workload shows
up (not implemented; the round structure below would carry it
unchanged).

Scale shape per round (two coarse-shard shuffles, the same 64-shard
co-grouping used by ``relational.asof_join``):

- **send**: labels co-grouped with the adjacency by ``hash(node)``; one
  vectorized merge per shard emits (neighbor, label) messages. Moves
  O(E + V) fixed-width int64 rows — never payloads.
- **receive**: messages + current labels co-grouped by ``hash(node)``;
  one vectorized groupby-min per shard. A per-batch combiner prunes to
  one candidate row per (node, batch) before the shuffle.
- The V-row frontier is materialized per round (bounded state, same
  pattern as the k-means iteration in ``stages/similarity.py``); the
  convergence check is a single Sum aggregate over an int `changed`
  column, not a driver-side scan.

Known cost, stated: Ray Data's groupby cannot pin a cached partitioning,
so the static adjacency re-crosses the wire every round (O(E) int rows).
A multi-node engine with partition-persistent state would shuffle the
adjacency once; with Ray Data the idiomatic fix at extreme E is to
pre-bucket the adjacency into hive-partitioned parquet by shard and read
per-shard inside the round — not needed at tested scales.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


def _shard_of(nodes: np.ndarray, n_shards: int) -> np.ndarray:
    """Deterministic coarse shard of an int64 node id (Fibonacci hash)."""
    return ((nodes.astype(np.uint64) * _HASH_MULT) >> np.uint64(40)) \
        % np.uint64(n_shards)


def connected_components(edges: "rd.Dataset", src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         n_shards: int = 64) -> tuple["rd.Dataset", int]:
    """Connected components of the undirected graph given as an edge
    list. Returns ``(labels, rounds)`` where ``labels`` has columns
    ``(node, comp)`` (both int64) covering every id that appears in
    ``src`` or ``dst``, with ``comp`` = the minimum node id of the
    component; ``rounds`` is the number of propagation rounds executed
    (diameter + 1: the last round verifies the fixpoint).

    Self-loops register a node but propagate nothing; duplicate edges
    are harmless (min is idempotent) and are locally deduped per batch
    before the send shuffle.
    """

    def sym(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        # local dedup: repeated edges inside a batch would only re-send
        # identical messages
        u = pd.DataFrame({"node": node, "nbr": nbr}).drop_duplicates()
        node = u["node"].to_numpy()
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "nbr": pa.array(u["nbr"].to_numpy(), pa.int64()),
            "comp": pa.array(np.zeros(len(u), np.int64)),
            "kind": pa.array(np.zeros(len(u), np.int8)),  # 0 = edge
            "shard": pa.array(_shard_of(node, n_shards), pa.int64()),
        })

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init_nodes(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t[src].to_numpy(zero_copy_only=False).astype(np.int64),
            t[dst].to_numpy(zero_copy_only=False).astype(np.int64)])
        u = np.unique(both)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "comp": pa.array(u, pa.int64())})

    labels = edges.map_batches(init_nodes, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("comp", alias_name="__s"))

    def dedup_init(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "comp": pa.array(node, pa.int64())})

    labels = labels.map_batches(dedup_init,
                                batch_format="pyarrow").materialize()

    def tag_labels(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": t["node"],
            "nbr": pa.array(np.full(len(t), -1, np.int64)),
            "comp": t["comp"],
            "kind": pa.array(np.ones(len(t), np.int8)),  # 1 = label
            "shard": pa.array(_shard_of(node.astype(np.int64), n_shards),
                              pa.int64()),
        })

    def send(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):  # map_groups pads empty shard groups
            return _empty_msgs()
        lab = g[g["kind"] == 1][["node", "comp"]]
        edge = g[g["kind"] == 0][["node", "nbr"]]
        msgs = edge.merge(lab, on="node")[["nbr", "comp"]] \
            .rename(columns={"nbr": "node"})
        msgs["kind"] = np.int8(0)
        lab = lab.copy()
        lab["kind"] = np.int8(1)
        return pd.concat([msgs, lab], ignore_index=True)

    def receive(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "comp": pd.Series([], dtype=np.int64),
                                 "changed": pd.Series([], dtype=np.int64)})
        mins = g.groupby("node", as_index=False)["comp"].min() \
            .rename(columns={"comp": "new"})
        old = g[g["kind"] == 1][["node", "comp"]]
        m = old.merge(mins, on="node")
        return pd.DataFrame({
            "node": m["node"].to_numpy(np.int64),
            "comp": m["new"].to_numpy(np.int64),
            "changed": (m["new"] < m["comp"]).astype(np.int64),
        })

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        sent = adj.union(tagged).groupby("shard") \
            .map_groups(send, batch_format="pandas")
        pruned = sent.map_batches(
            lambda b: _combine_local(b, n_shards), batch_format="pandas")
        new_labels = pruned.groupby("shard") \
            .map_groups(receive, batch_format="pandas").materialize()
        changed = new_labels.aggregate(Sum("changed",
                                           alias_name="c"))["c"] or 0
        labels = new_labels.drop_columns(["changed"]).materialize()
        if changed == 0:
            break
    return labels, rounds


def _empty_msgs() -> pd.DataFrame:
    return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                         "comp": pd.Series([], dtype=np.int64),
                         "kind": pd.Series([], dtype=np.int8)})


def _combine_local(b: pd.DataFrame, n_shards: int) -> pd.DataFrame:
    """Per-batch combiner + destination re-shard before the receive
    shuffle (module-level so the closure pickles once per worker)."""
    msgs = b[b["kind"] == 0]
    parts = []
    if len(msgs):
        msgs = msgs.groupby("node", as_index=False)["comp"].min()
        msgs["kind"] = np.int8(0)
        parts.append(msgs)
    lab = b[b["kind"] == 1][["node", "comp", "kind"]]
    if len(lab):
        parts.append(lab)
    out = pd.concat(parts, ignore_index=True) if parts else _empty_msgs()
    out["node"] = out["node"].astype(np.int64)
    out["comp"] = out["comp"].astype(np.int64)
    out["shard"] = _shard_of(out["node"].to_numpy(np.int64), n_shards)
    return out


def session_star_edges(events: "rd.Dataset", user_col: str = "user_id",
                       id_col: str = "event_id", ts_col: str = "ts",
                       gap_s: float = 4 * 3600,
                       n_shards: int = 64) -> "rd.Dataset":
    """Per-user session graph as star edges: each event connects to the
    first event of its gap-based session (strictly-greater-than ``gap_s``
    breaks, ordered by (ts, id) — the same rule as
    ``relational.sessionize``). Session starts get a self-edge so
    singleton sessions still register as nodes. One coarse-shard
    co-grouping shuffle; per-user work is a vectorized sorted scan."""
    gap = np.timedelta64(int(gap_s * 1_000_000), "us")

    def add_shard(t: pa.Table) -> pa.Table:
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "shard", pa.array(_shard_of(u, n_shards), pa.int64()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col])
        ts = g[ts_col].to_numpy()
        eid = g[id_col].to_numpy(np.int64)
        users = g[user_col].to_numpy(np.int64)
        brk = np.ones(len(g), bool)
        if len(g) > 1:
            same_user = users[1:] == users[:-1]
            within = (ts[1:] - ts[:-1]) <= gap
            brk[1:] = ~(same_user & within)
        sid = np.cumsum(brk) - 1
        first = eid[brk][sid]
        return pd.DataFrame({"src": first, "dst": eid})

    return (events.map_batches(add_shard, batch_format="pyarrow")
                  .groupby("shard")
                  .map_groups(per_shard, batch_format="pandas"))


def pagerank(edges: "rd.Dataset", src: str = "src", dst: str = "dst",
             damping: float = 0.85, max_iter: int = 20,
             tol: float = 1e-6,
             n_shards: int = 64) -> tuple["rd.Dataset", int]:
    """Distributed PageRank by power iteration over an int64 edge list.
    Returns ``(ranks, iters)`` with ``ranks`` = (node, rank) covering
    every id in ``src`` or ``dst``; sum(rank) == #nodes (the "rank mass
    N" convention: a node with no structure has rank 1.0).

    Same message-passing skeleton as ``connected_components`` — per
    iteration two coarse-shard co-grouping shuffles (send: ranks meet
    the adjacency at hash(src), each edge emits rank/outdeg to its dst;
    receive: contributions meet the rank rows at hash(dst), one
    vectorized sum per shard), a per-batch combiner summing
    contributions per (node, batch) before the second shuffle, and a
    materialized V-row frontier per iteration (bounded state, the
    k-means/CC checkpoint pattern). Dangling mass (outdeg-0 nodes) is
    one Sum aggregate per iteration, redistributed uniformly —
    O(1) driver state. Convergence = L1 delta Sum aggregate < tol·N.
    The static adjacency re-crosses the wire per iteration — same
    stated cost (and same hive-partition fix at extreme E) as
    ``connected_components``."""

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": pa.array(a, pa.int64()),
            "nbr": pa.array(b, pa.int64()),
            "val": pa.array(np.zeros(len(a)), pa.float64()),
            "outdeg": pa.array(np.zeros(len(a), np.int64)),
            "kind": pa.array(np.zeros(len(a), np.int8)),  # 0 = edge
            "shard": pa.array(_shard_of(a, n_shards), pa.int64()),
        })

    adj = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    # node universe + out-degree, combiner-style: one (node, partial-deg)
    # row per batch crosses the degree shuffle
    def deg_partial(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        su, sc = np.unique(a, return_counts=True)
        du = np.unique(b)
        return pa.table({
            "node": pa.array(np.concatenate([su, du]), pa.int64()),
            "__d": pa.array(np.concatenate(
                [sc.astype(np.int64), np.zeros(len(du), np.int64)])),
        })

    nodes = (edges.map_batches(deg_partial, batch_format="pyarrow")
             .groupby("node").aggregate(Sum("__d", alias_name="outdeg")))

    def init_rank(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": t["node"],
            "val": pa.array(np.ones(n), pa.float64()),
            "outdeg": t["outdeg"].cast(pa.int64()),
        })

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()
    n_nodes = ranks.count()

    def tag_ranks(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": t["node"],
            "nbr": pa.array(np.full(len(t), -1, np.int64)),
            "val": t["val"],
            "outdeg": t["outdeg"],
            "kind": pa.array(np.ones(len(t), np.int8)),  # 1 = rank
            "shard": pa.array(_shard_of(node, n_shards), pa.int64()),
        })

    def send(g: pd.DataFrame) -> pd.DataFrame:
        rk = g[g["kind"] == 1][["node", "val", "outdeg"]]
        ed = g[g["kind"] == 0][["node", "nbr"]]
        srcs = rk[rk["outdeg"] > 0]
        msgs = ed.merge(srcs, on="node")
        out_m = pd.DataFrame({
            "node": msgs["nbr"].to_numpy(np.int64, copy=False),
            "val": (msgs["val"] / msgs["outdeg"]).to_numpy(np.float64),
            "outdeg": np.zeros(len(msgs), np.int64),
            "kind": np.full(len(msgs), np.int8(0)),
        }) if len(msgs) else _pr_empty()
        rk = rk.copy()
        rk["kind"] = np.int8(1)
        return pd.concat([out_m, rk[["node", "val", "outdeg", "kind"]]],
                         ignore_index=True)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        msgs = b[b["kind"] == 0]
        parts = []
        if len(msgs):
            s = msgs.groupby("node", as_index=False)["val"].sum()
            s["outdeg"] = np.int64(0)
            s["kind"] = np.int8(0)
            parts.append(s)
        rk = b[b["kind"] == 1][["node", "val", "outdeg", "kind"]]
        if len(rk):
            parts.append(rk)
        out = (pd.concat(parts, ignore_index=True) if parts
               else _pr_empty())
        out["node"] = out["node"].astype(np.int64)
        out["shard"] = _shard_of(out["node"].to_numpy(np.int64), n_shards)
        return out

    base = (1.0 - damping)
    iters = 0
    for _ in range(max_iter):
        iters += 1
        # dangling mass: one filtered Sum over the V-row frontier
        dang = ranks.map_batches(
            lambda t: pa.table({"__dv": pa.compute.if_else(
                pa.compute.equal(t["outdeg"], 0), t["val"],
                pa.scalar(0.0))}),
            batch_format="pyarrow").aggregate(Sum("__dv",
                                                  alias_name="d"))["d"] or 0.0
        share = damping * dang / n_nodes

        def receive(g: pd.DataFrame, _share=share) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame({
                    "node": pd.Series([], dtype=np.int64),
                    "val": pd.Series([], dtype=np.float64),
                    "outdeg": pd.Series([], dtype=np.int64),
                    "delta": pd.Series([], dtype=np.float64)})
            msum = (g[g["kind"] == 0].groupby("node")["val"].sum()
                    if (g["kind"] == 0).any() else None)
            rk = g[g["kind"] == 1]
            got = (rk["node"].map(msum).fillna(0.0).to_numpy(np.float64)
                   if msum is not None else np.zeros(len(rk)))
            new = base + damping * got + _share
            return pd.DataFrame({
                "node": rk["node"].to_numpy(np.int64),
                "val": new,
                "outdeg": rk["outdeg"].to_numpy(np.int64),
                "delta": np.abs(new - rk["val"].to_numpy(np.float64)),
            })

        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow")
        sent = adj.union(tagged).groupby("shard") \
            .map_groups(send, batch_format="pandas")
        pruned = sent.map_batches(combine, batch_format="pandas")
        new_ranks = pruned.groupby("shard") \
            .map_groups(receive, batch_format="pandas").materialize()
        delta = new_ranks.aggregate(Sum("delta", alias_name="s"))["s"] or 0.0
        ranks = new_ranks.drop_columns(["delta"]).materialize()
        if delta < tol * n_nodes:
            break

    return ranks.select_columns(["node", "val"]) \
        .rename_columns({"val": "rank"}), iters


def _pr_empty() -> pd.DataFrame:
    return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                         "val": pd.Series([], dtype=np.float64),
                         "outdeg": pd.Series([], dtype=np.int64),
                         "kind": pd.Series([], dtype=np.int8)})
