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


#: Safety bound on the histogram the driver folds: distinct values of
#: the profiled column.  Length/score columns have a few thousand
#: distinct values at ANY corpus scale (the histogram size is a
#: property of the value domain, not the row count); a column that
#: blows past this (e.g. a unique id) is the wrong input for an exact
#: value-histogram quantile and should use a mergeable sketch instead.
MAX_QUANTILE_BINS = 1_000_000


def exact_quantiles(ds, col: str, qs: list[float]):
    """EXACT quantiles of an integer-domain column (lengths, counts,
    scores) at any scale, without a global sort.

    Plan: per-block value-counts (``pc.value_counts`` — each block
    emits one row per DISTINCT value it contains), one small
    ``groupby(value).sum`` folds them, and the driver walks the
    cumulative histogram — the exchange and the driver pull are both
    bounded by the value domain (≤ :data:`MAX_QUANTILE_BINS`,
    asserted), never by the row count.  This beats a distributed sort
    because a quantile only needs the CDF, and an integer column's CDF
    is a histogram.

    Semantics = SQL ``quantile_disc``/``percentile_disc``: the value
    at 1-based position ``ceil(q * n)`` of the sorted column (checked
    empirically against DuckDB in the tests).  Output one row per q:
    ``(q, value)``, sorted by ``q``; nulls are excluded (SQL
    aggregate-null semantics).
    """
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.drop_null(b[col]))
        return pa.table(
            {
                "value": pc.cast(vc.field("values"), pa.int64()),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    hist = (
        ds.select_columns([col])
        .map_batches(counts, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
    )
    import ray as _ray

    parts = [p for p in _ray.get(hist.to_arrow_refs()) if p.num_rows]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"value": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if merged.num_rows > MAX_QUANTILE_BINS:
        raise ValueError(
            f"{col}: {merged.num_rows} distinct values exceeds "
            f"MAX_QUANTILE_BINS={MAX_QUANTILE_BINS}; use a sketch"
        )
    # driver-side histogram sort: bounded by the value domain, not rows
    order = np.argsort(merged["value"].to_numpy(zero_copy_only=False),
                       kind="stable")
    values = merged["value"].to_numpy(zero_copy_only=False)[order]
    cum = np.cumsum(merged["n"].to_numpy(zero_copy_only=False)[order])
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            out_q.append(float(q)); out_v.append(None)
            continue
        pos = max(1, int(np.ceil(q * n)))  # 1-based percentile_disc
        out_q.append(float(q))
        out_v.append(int(values[np.searchsorted(cum, pos, side="left")]))
    res = pa.table({"q": pa.array(out_q, pa.float64()),
                    "value": pa.array(out_v, pa.int64())})
    import ray.data as rd

    return rd.from_arrow(res.sort_by("q"))


def exact_quantiles_by(ds, col: str, qs: list[float], *, group_col: str):
    """Per-group :func:`exact_quantiles` (e.g. length quantiles per
    language — the curation dashboard's standard cut).  Same plan with
    a ``(group, value)`` composite histogram; the fold and the driver
    pull are bounded by groups × distinct values
    (:data:`MAX_QUANTILE_BINS` asserted on the product).  Output one
    row per (group, q): ``(group_col, q, value)``, sorted."""
    from ray.data.aggregate import Sum

    qs = sorted(qs)

    def counts(b: pa.Table) -> pa.Table:
        t = b.select([group_col, col]).drop_null()
        g = t.group_by([group_col, col]).aggregate([([], "count_all")])
        return pa.table(
            {
                group_col: g[group_col],
                "value": pc.cast(g[col], pa.int64()),
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    hist = (
        ds.select_columns([group_col, col])
        .map_batches(counts, batch_format="pyarrow")
        .groupby([group_col, "value"])
        .aggregate(Sum("n", alias_name="n"))
    )
    import ray as _ray

    parts = [p for p in _ray.get(hist.to_arrow_refs()) if p.num_rows]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {group_col: pa.array([], pa.string()),
         "value": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if merged.num_rows > MAX_QUANTILE_BINS:
        raise ValueError(
            f"{group_col}×{col}: {merged.num_rows} histogram rows exceed "
            f"MAX_QUANTILE_BINS={MAX_QUANTILE_BINS}; use a sketch"
        )
    merged = merged.sort_by([(group_col, "ascending"), ("value", "ascending")])
    groups = merged[group_col].to_pylist()
    values = merged["value"].to_numpy(zero_copy_only=False)
    ns = merged["n"].to_numpy(zero_copy_only=False)
    out_g, out_q, out_v = [], [], []
    i = 0
    while i < len(groups):
        j = i
        while j < len(groups) and groups[j] == groups[i]:
            j += 1
        cum = np.cumsum(ns[i:j])
        n = int(cum[-1])
        for q in qs:
            pos = max(1, int(np.ceil(q * n)))
            out_g.append(groups[i])
            out_q.append(float(q))
            out_v.append(int(values[i:j][np.searchsorted(cum, pos, side="left")]))
        i = j
    res = pa.table({group_col: pa.array(out_g, merged.schema.field(group_col).type),
                    "q": pa.array(out_q, pa.float64()),
                    "value": pa.array(out_v, pa.int64())})
    import ray.data as rd

    return rd.from_arrow(res)


def percentile_ranks(ds, col: str, *, id_col: str = "doc_id"):
    """Annotate every row with its EXACT global ``percent_rank`` and
    ``cume_dist`` over an integer-domain column — the distributed
    window function, computed WITHOUT a global sort: ties share a
    rank, so both statistics are pure functions of (value, histogram)
    and the histogram is the only exchange (domain-bounded, the
    :func:`exact_quantiles` pattern).

    ``pr_qi = (count_less · 10⁹) // (n − 1)`` (SQL
    ``(rank() − 1)/(n − 1)``) and ``cd_qi = (count_le · 10⁹) // n``
    (SQL ``cume_dist``) — integer floor arithmetic end-to-end, so
    rows are bit-identical across parallelism and vs the window-twin.
    (BIGINT headroom: count × 10⁹ caps the exact path at ~9·10⁹ rows;
    past that the SQL twin needs HUGEINT and the engine 128-bit
    Python ints — same structure.)  Plan: one value-counts fold →
    driver prefix sums (≤ MAX_QUANTILE_BINS rows) → one broadcast
    zero-shuffle annotate pass; the curriculum-bucketing primitive
    (train on the easiest X %, anneal by percentile)."""
    import ray
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.drop_null(b[col]))
        return pa.table(
            {"value": pc.cast(vc.field("values"), pa.int64()),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    hist = (
        ds.select_columns([col])
        .map_batches(counts, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
    )
    parts = [p for p in ray.get(hist.to_arrow_refs()) if p.num_rows]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"value": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if merged.num_rows > MAX_QUANTILE_BINS:
        raise ValueError(
            f"{col}: {merged.num_rows} distinct values exceeds "
            f"MAX_QUANTILE_BINS={MAX_QUANTILE_BINS}; use a sketch"
        )
    vals = merged["value"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="stable")
    vals = vals[order]
    cnts = merged["n"].to_numpy(zero_copy_only=False)[order]
    cum_le = np.cumsum(cnts)
    cum_lt = cum_le - cnts
    n = int(cum_le[-1]) if len(cum_le) else 0
    ref = ray.put((vals, cum_lt, cum_le))

    def annotate(b: pa.Table) -> pa.Table:
        values, lt, le = ray.get(ref)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(values, v)
        pr = (lt[idx] * 1_000_000_000) // max(n - 1, 1)
        cd = (le[idx] * 1_000_000_000) // max(n, 1)
        return pa.table(
            {id_col: b[id_col], col: b[col],
             "pr_qi": pa.array(pr, pa.int64()),
             "cd_qi": pa.array(cd, pa.int64())}
        )

    return (
        ds.select_columns([id_col, col])
        .map_batches(annotate, batch_format="pyarrow")
        .sort(id_col)
    )


def percentile_ranks_sql(col: str, *, id_col: str = "doc_id",
                         table: str = "documents") -> str:
    """DuckDB twin of :func:`percentile_ranks` (rank()/count() window
    form with the same integer floor scaling)."""
    return (
        f"SELECT {id_col}, {col}, "
        f"CAST(((rank() OVER (ORDER BY {col})) - 1) * 1000000000 "
        f"// greatest(count(*) OVER () - 1, 1) AS BIGINT) AS pr_qi, "
        f"CAST((count(*) OVER (ORDER BY {col})) * 1000000000 "
        f"// greatest(count(*) OVER (), 1) AS BIGINT) AS cd_qi "
        f"FROM {table} ORDER BY {id_col}"
    )
