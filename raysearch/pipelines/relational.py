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
    """Top-k customers by total order value: broadcast the customer
    dimension once, join inside map_batches (no shuffle join), then one
    small groupby + driver-side top-k."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust_pdf = customer.select_columns(["c_custkey", "c_name"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust_pdf.c_custkey, cust_pdf.c_name)))

    def attach_name(batch: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(cust_ref)
        batch = batch[["o_custkey", "o_totalprice"]].copy()
        batch["c_name"] = batch["o_custkey"].map(names)
        return batch

    agg = (
        orders.map_batches(attach_name, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total_spent"), Count(alias_name="n_orders"))
    )
    pdf = agg.to_pandas()
    names = dict(zip(cust_pdf.c_custkey, cust_pdf.c_name))
    pdf["c_name"] = pdf["o_custkey"].map(names)
    pdf["total_spent"] = round_half_away(pdf["total_spent"].to_numpy(), 2)
    pdf = pdf.sort_values(
        ["total_spent", "o_custkey"], ascending=[False, True]
    ).head(k)
    return rd.from_pandas(
        pdf[["o_custkey", "c_name", "total_spent", "n_orders"]].reset_index(drop=True)
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
