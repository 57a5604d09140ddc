"""Generic relational operators (groupby-aggregate, broadcast join,
windowed aggregate) demonstrated over the TPC-H-ish test tables.

These round out the engine's data-processing surface beyond full-text:
* ``revenue_by_flag`` — classic scan→project→aggregate with the
  projection/filter pushed into the read and partial aggregation in
  the map stage.
* ``top_customers`` — large⋈small broadcast hash join (ray.put the
  dimension side, merge inside map_batches) then a small groupby —
  the J4 pattern from SURVEY §2.4 generalized.
* ``events_window`` — tumbling event-time window aggregate over the
  events stream table (SURVEY §2.9: windows as groupby over a
  time-bucket column).

Aggregated doubles are rounded to 4 (or 2 for currency) decimals at
the boundary so the DuckDB oracle compares exactly despite summation
order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raysearch.util import round_half_away


def revenue_by_flag(lineitem):
    """l_returnflag, l_linestatus → rounded revenue + qty sums + count."""
    from ray.data.aggregate import Count, Sum

    def project(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_quantity": batch["l_quantity"],
                "revenue": rev,
            }
        )

    agg = (
        lineitem.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="revenue"),
            Count(alias_name="n_rows"),
        )
    )

    def round_cols(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_qty"] = round_half_away(batch["sum_qty"].to_numpy(), 2)
        batch["revenue"] = round_half_away(batch["revenue"].to_numpy(), 2)
        return batch

    return agg.map_batches(round_cols, batch_format="pandas")


def top_customers(orders, customer, k: int = 10):
    """Top-k customers by total order value: groupby-aggregate on the
    fact side only, Dataset-level ``sort(...).limit(k)`` for the
    reduce (the per-customer aggregate never lands on the driver), then
    the customer name attached to just the k winners from the broadcast
    dimension side — the J4 large⋈small pattern with the join deferred
    past the top-k so it touches k rows, not |customers|."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    agg = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent"), Count(alias_name="n_orders")
    )

    def round_spend(batch: pd.DataFrame) -> pd.DataFrame:
        # round BEFORE the sort so ordering matches the SQL oracle's
        # ORDER BY round(...) DESC, o_custkey
        batch["total_spent"] = round_half_away(batch["total_spent"].to_numpy(), 2)
        return batch

    top = (
        agg.map_batches(round_spend, batch_format="pandas")
        .sort(["total_spent", "o_custkey"], descending=[True, False])
        .limit(k)
    )
    pdf = top.to_pandas()  # k rows
    cust_pdf = customer.select_columns(["c_custkey", "c_name"]).to_pandas()
    names = dict(zip(cust_pdf.c_custkey, cust_pdf.c_name))
    pdf["c_name"] = pdf["o_custkey"].map(names)
    return rd.from_pandas(
        pdf[["o_custkey", "c_name", "total_spent", "n_orders"]].reset_index(drop=True)
    )


def sessionize(events, gap_minutes: int = 30):
    """Gap-based sessionization (the classic stateful streaming window
    as a batch operator): per user, events sorted by (ts, event_id);
    a new session starts when the gap to the previous event exceeds
    ``gap_minutes``.  Output: one row per session with bounds, count,
    rounded value sum.

    Ray mapping: ``groupby(user_id).map_groups`` — the one shuffle
    moves (user_id, ts, event_id, value) rows only; per-group state is
    a vectorized diff/cumsum, bounded by a single user's history.  At
    skew (one bot user with 10^9 events) the group would need
    splitting by time range with session stitching at the seams —
    documented assumption: per-user event count fits a worker."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        gap = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        brk = np.concatenate(([0], (gap > gap_minutes * 60_000_000).astype(np.int64)))
        sid = np.cumsum(brk)
        g = g.assign(session_id=sid)
        out = (
            g.groupby("session_id", sort=True)
            .agg(
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["sum_value"] = round_half_away(out["sum_value"].to_numpy(), 4)
        return out

    return (
        events.select_columns(["user_id", "ts", "event_id", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def asof_last_event(events, match_type: str = "error"):
    """As-of self-join: for every event, the timestamp of the same
    user's most recent STRICTLY PRIOR event of ``match_type`` (NaT when
    none) — the canonical as-of-join shape (trade→quote) over the
    events table.

    Ray mapping: ``groupby(user_id).map_groups`` with a vectorized
    shifted forward-fill inside the group; same partitioning assumption
    as :func:`sessionize`."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        is_m = (g["event_type"] == match_type).to_numpy()
        ts = g["ts"].to_numpy()
        # value available to row i = last match ts among rows < i
        carry = pd.Series(np.where(is_m, ts, np.datetime64("NaT")))
        prev = carry.shift(1).ffill().to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "ts": ts,
                "prev_match_ts": prev,
            }
        )

    return (
        events.select_columns(["user_id", "ts", "event_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def events_window(events, window: str = "day"):
    """Tumbling window aggregate: (event_type, window_start) → count,
    rounded value sum.  Event time = ``ts``; the bucket column is
    computed vectorized per batch, then one groupby."""
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["ts"], unit=window), pa.timestamp("us"))
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": day,
                "value": batch["value"],
            }
        )

    agg = (
        events.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def round_cols(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_value"] = round_half_away(batch["sum_value"].to_numpy(), 4)
        return batch

    return agg.map_batches(round_cols, batch_format="pandas")
