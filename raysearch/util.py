"""Small shared helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def round_half_away(x, decimals: int = 4):
    """Round half away from zero — matches SQL ``round()`` (DuckDB),
    unlike numpy/pandas banker's rounding (0.03125 → 0.0313, not
    0.0312).  Used at every engine↔SQL comparison boundary."""
    a = np.asarray(x, dtype=np.float64)
    factor = 10.0**decimals
    return np.sign(a) * np.floor(np.abs(a) * factor + 0.5) / factor


def broadcast_id_filter(ds, col: str, ids: "np.ndarray"):
    """Semi-filter ``ds`` to rows whose ``col`` is in ``ids`` via ONE
    ``ray.put`` of the sorted id array and a searchsorted membership
    test inside ``map_batches`` — the canonical bounded small-side
    broadcast (no shuffle of ``ds`` at all).  ``ids`` must be modest
    (callers cap it, e.g. dedup.BROADCAST_ID_LIMIT / top-k winners)."""
    import ray

    ids = np.sort(np.asarray(ids))
    ids_ref = ray.put(ids)

    def keep(b: pa.Table) -> pa.Table:
        w = ray.get(ids_ref)  # sorted
        if len(w) == 0:
            return b.slice(0, 0)
        d = b[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(w, d)
        pos[pos >= len(w)] = len(w) - 1
        return b.filter(pa.array(w[pos] == d))

    return ds.map_batches(keep, batch_format="pyarrow")


def copartition_attach(
    left,
    right,
    key: str,
    left_schema: "pa.Schema",
    payload: dict[str, "pa.DataType"],
    semi: bool = False,
    anti: bool = False,
):
    """Hash-join ``right`` onto ``left`` by ``key``, expressed as a
    tagged union + ONE ``groupby(key).map_groups`` — the same
    all-to-all exchange a hash join performs, without Ray Data's join
    operator.

    Why not ``Dataset.join``: in Ray 2.49 the join aggregator's
    per-partition ``finalize`` (ray/data/_internal/execution/operators/
    join.py) builds each side from whatever blocks the partition
    received; a partition that received ZERO blocks from one side
    yields a schemaless empty table and ``pa.Table.join`` raises
    ``No match or multiple matches for key field reference`` — a hard
    crash whenever ``num_partitions`` exceeds the number of occupied
    key slots (always at small scale, possible under skew at any
    scale).  The groupby path shuffles the same tagged rows and has no
    empty-partition failure mode.

    ``left``: Dataset whose columns are exactly ``left_schema`` (must
    include ``key``).  ``right``: Dataset with columns ``[key] +
    list(payload)`` — the lookup side, typically few rows per key.
    Inner-join semantics: every (left-row × matching right-row)
    combination is emitted with the payload columns attached.  With
    ``semi=True``: left rows with ≥1 match are emitted unchanged
    (``payload`` may be ``{}``).  With ``anti=True``: left rows with
    ZERO matches are emitted unchanged — the relational anti-join,
    same exchange, inverted keep condition.

    Scale note: per-key work is O(|L_key| × |R_key|) inside one group;
    keep the right side unique-ish per key (it is, for id→set lookups)
    or pre-aggregate before calling."""
    left_cols = [f.name for f in left_schema]
    left_types = {f.name: f.type for f in left_schema}
    pay_cols = list(payload)
    out_fields = [(c, left_types[c]) for c in left_cols]
    if not (semi or anti):
        out_fields += [(c, payload[c]) for c in pay_cols]
    out_schema = pa.schema(out_fields)
    all_cols = left_cols + [c for c in pay_cols if c not in left_cols]

    def pad_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in left_cols}
        for c in pay_cols:
            cols[c] = pa.nulls(b.num_rows, payload[c])
        cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8))
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in all_cols:
            if c == key:
                cols[c] = b[key]
            elif c in pay_cols:
                cols[c] = b[c]
            else:
                cols[c] = pa.nulls(b.num_rows, left_types[c])
        cols["_side"] = pa.array(np.ones(b.num_rows, np.int8))
        return pa.table(cols)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g["_side"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if anti:
            if len(li) == 0 or len(ri) > 0:
                return out_schema.empty_table()
            kept = g.take(pa.array(li))
            return pa.table(
                {c: kept[c] for c in left_cols}
            ).cast(out_schema)
        if len(li) == 0 or len(ri) == 0:
            return out_schema.empty_table()
        if semi:
            kept = g.take(pa.array(li))
            return pa.table(
                {c: kept[c] for c in left_cols}
            ).cast(out_schema)
        rep = np.repeat(li, len(ri))
        til = np.tile(ri, len(li))
        lpart = g.take(pa.array(rep))
        rpart = g.take(pa.array(til))
        cols = {c: lpart[c] for c in left_cols}
        for c in pay_cols:
            cols[c] = rpart[c]
        # cast back to the declared schema: the tagged union carries
        # nulls in the other side's columns, and Ray's sort-based
        # map_groups may route blocks through pandas, where a nullable
        # int64 silently becomes float64 — WHICH blocks take that path
        # depends on partitioning, so without this cast the output
        # dtype (and the gate's value hash) is partitioning-dependent.
        return pa.table(cols).cast(out_schema)

    tagged = left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(pad_right, batch_format="pyarrow")
    )
    return tagged.groupby(key).map_groups(merge, batch_format="pyarrow")
