"""Dataset profiling — the data-quality sanity pass run before any
expensive pipeline: per-column row/null counts and numeric ranges.

``column_profile`` is the no-shuffle tree-aggregate shape: each block
emits one tiny partial row per column (count / nulls / min / max /
sum via Arrow kernels), and one small ``groupby(col_name)`` folds
partials — the exchange moves O(blocks × columns) rows, never data.
Sums are rounded (2 dp) at the end because float addition order is
block-dependent; min/max/counts are exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raysearch.util import round_half_away


def column_profile(ds, columns: list[str], decimals: int = 2):
    """Profile numeric ``columns``: one output row per column with
    ``(col_name, n_rows, n_nulls, min_val, max_val, sum_val)``."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        rows = {
            "col_name": [], "n_rows": [], "n_nulls": [],
            "min_val": [], "max_val": [], "sum_val": [],
        }
        for c in columns:
            arr = b[c]
            mm = pc.min_max(arr)
            rows["col_name"].append(c)
            rows["n_rows"].append(len(arr))
            rows["n_nulls"].append(arr.null_count)
            rows["min_val"].append(mm["min"].as_py())
            rows["max_val"].append(mm["max"].as_py())
            rows["sum_val"].append(pc.sum(arr).as_py() or 0.0)
        return pa.table(
            {
                "col_name": pa.array(rows["col_name"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
                "min_val": pa.array(
                    [float(v) if v is not None else None for v in rows["min_val"]],
                    pa.float64(),
                ),
                "max_val": pa.array(
                    [float(v) if v is not None else None for v in rows["max_val"]],
                    pa.float64(),
                ),
                "sum_val": pa.array(
                    [float(v) for v in rows["sum_val"]], pa.float64()
                ),
            }
        )

    folded = (
        ds.select_columns(columns)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_val", alias_name="min_val"),
            Max("max_val", alias_name="max_val"),
            Sum("sum_val", alias_name="sum_val"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        s = round_half_away(b["sum_val"].to_numpy(zero_copy_only=False), decimals)
        return b.set_column(
            b.schema.get_field_index("sum_val"), "sum_val", pa.array(s, pa.float64())
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("col_name")
