"""Relational building blocks: partial (combiner) aggregation, broadcast
joins, top-1-per-key, windowed aggregates.

These re-express the reference's SQL-side operators (ORDER BY ... LIMIT 1
latest-job lookup, extraction.py:455-470; FK joins; listing sorts) with
scale-conscious shapes:

- ``grouped_agg``: pre-aggregates inside ``map_batches`` (one partial row
  per key per batch) before the global ``groupby`` — the all-to-all moves
  partials, not rows.
- ``broadcast_join``: the small side is put in the object store ONCE
  (``ray.put``) and merged per batch — no shuffle (reference J1).
- ``latest_per_key``: groupby + per-group sort/head with a total tie-break
  (reference J4).
- ``windowed_agg``: event-time tumbling windows as a derived window key +
  grouped aggregate (Ray Data has no event-time machinery; SURVEY §2.9).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def grouped_agg(ds: "rd.Dataset", keys: Sequence[str],
                sum_cols: dict[str, str],
                count_alias: str | None = "n") -> "rd.Dataset":
    """groupby(keys) with Sum/Count, combiner-style: per-batch partial
    aggregation first. ``sum_cols`` maps input column -> output alias."""
    keys = list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False).agg(
            **{alias: (col, "sum") for col, alias in sum_cols.items()},
            __pn=(keys[0], "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    aggs = [Sum(alias, alias_name=alias) for alias in sum_cols.values()]
    aggs.append(Sum("__pn", alias_name=count_alias or "n"))
    out = partials.groupby(keys).aggregate(*aggs)
    if count_alias is None:
        out = out.drop_columns(["n"])
    return out


def broadcast_join(ds: "rd.Dataset", small: pd.DataFrame, on: str,
                   how: str = "inner") -> "rd.Dataset":
    """Map-side join against a broadcast small table (dimension table)."""
    ref = ray.put(small)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


def latest_per_key(ds: "rd.Dataset", key: str, order_cols: list[str],
                   ascending: list[bool] | None = None) -> "rd.Dataset":
    """Top-1 per key by order_cols (default: all descending) with the
    order columns doubling as the deterministic tie-break."""
    asc = ascending if ascending is not None else [False] * len(order_cols)

    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_cols, ascending=asc).head(1)

    return ds.groupby(key).map_groups(head1, batch_format="pandas")


def windowed_agg(ds: "rd.Dataset", ts_col: str, keys: Sequence[str],
                 window: str, sum_cols: dict[str, str]) -> "rd.Dataset":
    """Tumbling event-time windows: truncate ``ts_col`` to the window
    (pandas freq alias, e.g. "D", "h") and run the combiner aggregate over
    (window_start, *keys)."""
    keys = list(keys)

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["window_start"] = batch[ts_col].dt.floor(window)
        return batch

    windowed = ds.map_batches(add_window, batch_format="pandas")
    return grouped_agg(windowed, ["window_start", *keys], sum_cols)
