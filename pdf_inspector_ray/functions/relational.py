"""Relational / dataflow operators the rebuild adds (SURVEY.md §2.7):
global aggregates with partial pre-aggregation, broadcast joins, windowed
(tumbling) aggregates over the events stream table.

Shuffle discipline: every groupby here pre-aggregates inside map_batches
(combiner) so the all-to-all exchange moves one row per (batch × key), not
one per input row.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pricing_summary(ds) -> pa.Table:
    """TPC-H Q1-style pricing summary over lineitem: partial aggregation in
    map_batches, then a tiny groupby on (returnflag, linestatus)."""

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), batch["l_tax"]))
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": batch["l_quantity"],
            "sum_base_price": batch["l_extendedprice"],
            "sum_disc_price": disc_price,
            "sum_charge": charge,
            "count_order": pa.array(np.ones(len(batch), dtype=np.int64)),
        })
        # combine within the batch
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("sum_qty", "sum"), ("sum_base_price", "sum"),
            ("sum_disc_price", "sum"), ("sum_charge", "sum"),
            ("count_order", "sum"),
        ]).rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                           "sum_base_price", "sum_disc_price", "sum_charge",
                           "count_order"])

    def merge(group: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": [group["l_returnflag"][0].as_py()],
            "l_linestatus": [group["l_linestatus"][0].as_py()],
            "sum_qty": [round(pc.sum(group["sum_qty"]).as_py(), 2)],
            "sum_base_price": [round(pc.sum(group["sum_base_price"]).as_py(), 2)],
            "sum_disc_price": [round(pc.sum(group["sum_disc_price"]).as_py(), 2)],
            "sum_charge": [round(pc.sum(group["sum_charge"]).as_py(), 2)],
            "count_order": [pc.sum(group["count_order"]).as_py()],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .map_groups(merge, batch_format="pyarrow"))


def broadcast_join_orders_customers(orders_ds, customers_table: pa.Table) -> "ray.data.Dataset":
    """Broadcast hash join: the small side (customer) is ray.put once and
    looked up inside map_batches — no shuffle of the big side.

    Returns orders + (c_custkey → joined marker columns)."""
    import ray

    # broadcast the small side ONCE as arrow arrays; the probe is a fully
    # vectorized pc.index_in + take (no per-row Python — VERDICT r01 fix #4)
    small_ref = ray.put((customers_table["c_custkey"].combine_chunks(),
                         customers_table["c_mktsegment"].combine_chunks()))

    def join(batch: pa.Table) -> pa.Table:
        keys, segments = ray.get(small_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=keys)
        segs = pc.take(segments, idx)  # null idx (no match) → null segment
        return batch.append_column(
            pa.field("c_mktsegment", pa.string()),
            pc.cast(segs, pa.string()))

    return orders_ds.map_batches(join, batch_format="pyarrow")


def asof_join_events(ds, left_type: str, right_type: str) -> "ray.data.Dataset":
    """As-of join — an operator Ray Data lacks, composed as
    ``groupby(key).map_groups(sorted merge)``: for each ``left_type`` event,
    attach the most recent ``right_type`` event of the same user at or
    before its timestamp.

    Partitioning assumption: co-location by ``user_id`` (the groupby
    shuffle provides it); within a group a single sorted sweep is O(n).
    Skewed users would need salting by time-range + boundary pass — user
    activity here is uniform so the plain key is used.
    """
    import pyarrow.compute as pc

    def merge_group(group: pa.Table) -> pa.Table:
        # Vectorized sorted merge (VERDICT r02 fix #6): positions of left
        # rows searchsorted into positions of right rows — the "most
        # recent right at-or-before" of the old per-row sweep, in numpy.
        order = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                  ("event_id", "ascending")])
        g = group.take(order)
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        left_pos = np.nonzero(
            pc.equal(g["event_type"], left_type).to_numpy(
                zero_copy_only=False))[0]
        right_pos = np.nonzero(
            pc.equal(g["event_type"], right_type).to_numpy(
                zero_copy_only=False))[0]
        k = np.searchsorted(right_pos, left_pos, side="right") - 1
        has = k >= 0
        prior_idx = right_pos[np.clip(k, 0, None)]
        ts_arr = pa.array(ts[left_pos], pa.int64()).cast(pa.timestamp("us"))
        prior_ts = pa.array(ts[prior_idx], pa.int64(),
                            mask=~has).cast(pa.timestamp("us"))
        return pa.table({
            "event_id": pa.array(ids[left_pos], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array(
                np.full(len(left_pos), g["user_id"][0].as_py()), pa.int64()),
            "prior_event_id": pa.array(ids[prior_idx], pa.int64(), mask=~has),
            "prior_ts": prior_ts,
        })

    def prefilter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        return batch.filter(mask)

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(merge_group, batch_format="pyarrow"))


def session_windows(ds, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows (gap-based) per user: consecutive events closer than
    ``gap_minutes`` belong to one session. Ray Data has no session-window
    primitive — composed as ``groupby(user_id).map_groups(sorted sweep)``.

    Partitioning assumption: all of a user's events fit one group (events
    are small; a pathological user would need time-range salting plus a
    boundary-merge pass)."""
    import pyarrow.compute as pc

    gap_us = gap_minutes * 60_000_000

    def sessions(group: pa.Table) -> pa.Table:
        # Vectorized gap sweep (VERDICT r02 fix #6): session ids are the
        # cumulative count of gap breaks (numpy diff/cumsum); per-session
        # bounds and sums come from boundary indexing + np.add.reduceat.
        order = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                  ("event_id", "ascending")])
        g = group.take(order)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        values = g["value"].to_numpy(zero_copy_only=False)
        n = len(ts)
        breaks = np.nonzero(np.diff(ts) > gap_us)[0] + 1
        starts_idx = np.concatenate([[0], breaks])
        ends_idx = np.concatenate([breaks - 1, [n - 1]])
        sums = np.round(np.add.reduceat(values, starts_idx), 2)
        counts = np.diff(np.concatenate([starts_idx, [n]]))
        user = g["user_id"][0].as_py()
        return pa.table({
            "user_id": pa.array(np.full(len(starts_idx), user), pa.int64()),
            "session_start": pa.array(ts[starts_idx],
                                      pa.int64()).cast(pa.timestamp("us")),
            "session_end": pa.array(ts[ends_idx],
                                    pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


def windowed_event_counts(ds, window: str = "hour") -> "ray.data.Dataset":
    """Tumbling-window aggregate over the events table: count + sum(value)
    per (window_start, event_type). Pre-aggregated per batch before the
    shuffle."""
    unit_us = {"hour": 3_600_000_000, "day": 86_400_000_000}[window]

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        win = pc.multiply(pc.divide(ts, pa.scalar(unit_us, pa.int64())),
                          pa.scalar(unit_us, pa.int64()))
        t = pa.table({
            "window_start": pc.cast(win, pa.timestamp("us")),
            "event_type": batch["event_type"],
            "n_events": pa.array(np.ones(len(batch), dtype=np.int64)),
            "sum_value": batch["value"],
        })
        return (t.group_by(["window_start", "event_type"])
                 .aggregate([("n_events", "sum"), ("sum_value", "sum")])
                 .rename_columns(["window_start", "event_type",
                                  "n_events", "sum_value"]))

    def merge(group: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": [group["window_start"][0].as_py()],
            "event_type": [group["event_type"][0].as_py()],
            "n_events": [pc.sum(group["n_events"]).as_py()],
            "sum_value": [round(pc.sum(group["sum_value"]).as_py(), 2)],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["window_start", "event_type"])
              .map_groups(merge, batch_format="pyarrow"))


def hopping_window_counts(ds, window_us: int = 3_600_000_000,
                          hop_us: int = 1_800_000_000) -> "ray.data.Dataset":
    """Hopping (sliding) window aggregate: each event lands in
    ``window_us / hop_us`` overlapping windows; assignment is a vectorized
    flat-map expansion inside ``map_batches`` followed by the same
    partial-then-merge groupby as the tumbling case. Window k for event t:
    starts ``floor(t/hop)·hop − i·hop`` for i in [0, window/hop) with
    start > t − window."""
    assert window_us % hop_us == 0
    k = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us
        starts = np.concatenate([base - i * hop_us for i in range(k)])
        rep_value = np.tile(
            batch["value"].to_numpy(zero_copy_only=False), k)
        t = pa.table({
            "window_start": pa.array(starts, pa.int64()).cast(
                pa.timestamp("us")),
            "n_events": pa.array(np.ones(len(starts), dtype=np.int64)),
            "sum_value": pa.array(rep_value, pa.float64()),
        })
        return (t.group_by(["window_start"])
                 .aggregate([("n_events", "sum"), ("sum_value", "sum")])
                 .rename_columns(["window_start", "n_events", "sum_value"]))

    def merge(group: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": [group["window_start"][0].as_py()],
            "n_events": [pc.sum(group["n_events"]).as_py()],
            "sum_value": [round(pc.sum(group["sum_value"]).as_py(), 2)],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["window_start"])
              .map_groups(merge, batch_format="pyarrow"))


# -- generic large-large equi-join -------------------------------------------

JOIN_PARTITIONS = 256
# Fibonacci-hash multiplier for the key and a coprime stride for the salt
# index — shared with tests so the partition-spread probe measures the
# exact exchange the join performs.
PART_MULT = 2654435761
SALT_MULT = 40503


def hash_join(left_ds, right_ds, on: str, right_on: str | None = None,
              join_type: str = "inner",
              num_partitions: int = JOIN_PARTITIONS,
              left_schema: list | None = None,
              right_schema: list | None = None,
              hot_keys: list | None = None,
              salt: int = 8) -> "ray.data.Dataset":
    """Reduce-side hash join of two LARGE datasets (neither side fits a
    broadcast): tagged union → coarse hash(key) co-partition → per-group
    Acero ``pa.Table.join`` (vectorized C++ hash join, no Python row
    loops). Hand-rolled because Ray 2.49's native ``Dataset.join`` loses
    the schema of empty right partitions (same reason as
    ``dedup._attach_side_column``).

    ``join_type`` is passed to Acero: "inner", "left outer",
    "right outer", "full outer", "left semi", "left anti", … Outer/anti
    semantics hold because co-partitioning sends every row of BOTH sides
    with the same key hash to the same group.

    Scale notes: one all-to-all exchange carrying both sides once; each
    of the ``num_partitions`` groups holds ~1/P of either table, so P
    bounds per-task memory — raise it with data size. Keys must be
    integer-typed (castable to int64); non-key column names must not
    collide across sides — pre-rename or pre-hash string keys to int
    (e.g. the md5 scheme in ``dedup``).

    Skew (``hot_keys`` + ``salt``): a pathologically hot key
    concentrates its rows in one group. Passing its key values spreads
    each hot LEFT row over one of ``salt`` sub-partitions
    (deterministic round-robin) and REPLICATES each hot RIGHT row into
    all of them, so every left row still meets every matching right row
    exactly once. Correct for inner / left outer / left semi / left
    anti (each left row lands in exactly one group and every group
    holds the full hot right set); right/full outer would emit
    replicated unmatched right rows and raise. Find hot keys cheaply
    with ``sketch.cms_counters`` over the key column."""
    if right_on is None:
        right_on = on
    if hot_keys and join_type in ("right outer", "full outer"):
        raise ValueError(
            f"salting replicates right-side hot rows — {join_type} would "
            "emit duplicates; use it on the un-replicated side instead")

    # ``Dataset.schema()`` on a map-produced dataset EXECUTES a limit-1
    # probe; callers that know their projection pass [(name, type), …]
    # explicitly to skip it (cheaper, and avoids stacking probe datasets)
    if left_schema is None:
        left_schema = [(f.name, f.type)
                       for f in left_ds.schema().base_schema]
    if right_schema is None:
        right_schema = [(f.name, f.type)
                        for f in right_ds.schema().base_schema]
    left_names = [n for n, _ in left_schema]
    overlap = set(left_names) & {n for n, _ in right_schema}
    if overlap:
        raise ValueError(
            f"hash_join requires disjoint column names; both sides have "
            f"{sorted(overlap)} — rename before joining")
    union_schema = left_schema + right_schema

    hot = (np.asarray(sorted(hot_keys), dtype=np.int64).astype(np.uint64)
           if hot_keys else None)

    def tag(is_left: bool, key_col: str, own_schema):
        own = {n for n, _ in own_schema}

        def fn(batch: pa.Table) -> pa.Table:
            # null keys never match any row (SQL semantics) — drop them
            # before hashing (a null int64 would round-trip through numpy
            # as NaN and corrupt the partition assignment)
            batch = batch.filter(pc.is_valid(batch[key_col]))
            key = pc.cast(batch[key_col], pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.uint64)
            salt_idx = np.zeros(len(batch), dtype=np.uint64)
            if hot is not None:
                is_hot = np.isin(key, hot)
                if is_left:
                    # deterministic round-robin: same batch → same salts
                    # on retry, so the shuffle stays replay-safe
                    salt_idx[is_hot] = (np.arange(len(batch),
                                                  dtype=np.uint64)[is_hot]
                                        % np.uint64(salt))
                elif is_hot.any():
                    # replicate each hot right row into every salt group
                    reps = np.where(is_hot, salt, 1).astype(np.int64)
                    take = np.repeat(np.arange(len(batch)), reps)
                    batch = batch.take(pa.array(take))
                    key = key[take]
                    salt_idx = np.zeros(len(batch), dtype=np.uint64)
                    grew = np.repeat(is_hot, reps)
                    # 0..salt-1 within each replicated run
                    pos = np.arange(len(batch), dtype=np.int64)
                    run_start = np.repeat(
                        np.cumsum(np.concatenate([[0], reps[:-1]])), reps)
                    salt_idx[grew] = (pos - run_start)[grew].astype(
                        np.uint64)
            cols = {name: (batch[name] if name in own
                           else pa.nulls(len(batch), typ))
                    for name, typ in union_schema}
            with np.errstate(over="ignore"):
                part = ((key * np.uint64(PART_MULT)
                         + salt_idx * np.uint64(SALT_MULT))
                        % np.uint64(num_partitions)).astype(np.int32)
            cols["__part"] = pa.array(part, pa.int32())
            cols["__left"] = pa.array(
                np.full(len(batch), is_left), pa.bool_())
            return pa.table(cols)

        return fn

    def join_group(group: pa.Table) -> pa.Table:
        is_left = group["__left"]
        lt = group.filter(is_left).select(left_names)
        rt = group.filter(pc.invert(is_left)).select(
            [n for n, _ in right_schema])
        return lt.join(rt, keys=[on], right_keys=[right_on],
                       join_type=join_type)

    tagged = (left_ds.map_batches(tag(True, on, left_schema),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(tag(False, right_on, right_schema),
                                          batch_format="pyarrow")))
    return tagged.groupby("__part").map_groups(join_group,
                                               batch_format="pyarrow")


def range_join(left_ds, right_ds, key: str, left_ts: str,
               right_start: str, right_end: str,
               num_partitions: int = JOIN_PARTITIONS,
               left_schema: list | None = None,
               right_schema: list | None = None) -> "ray.data.Dataset":
    """Range (interval) join — a non-equi join Ray Data has no primitive
    for: attach to each left row the right-side interval
    ``[right_start, right_end]`` of the same ``key`` that contains
    ``left_ts`` (inclusive bounds). Composed as a tagged union
    co-partitioned by key hash (one all-to-all carrying both sides once)
    followed by a vectorized ``np.searchsorted`` probe per group — no
    per-row Python.

    Partitioning assumptions (documented per SURVEY §2.7 discipline):
    all intervals+rows of one key meet in one group (same as the asof/
    session operators — salt by coarse time range + boundary pass for a
    pathological key), and one key's intervals are NON-overlapping
    (sessions, validity windows, SCD periods). Left rows contained in no
    interval are dropped (inner semantics).

    Pass ``left_schema``/``right_schema`` ([(name, type), …]) when a side
    is map/groupby-produced: ``Dataset.schema()`` on those EXECUTES a
    probe — for a groupby side that means running the whole shuffle once
    just to learn the column types."""
    if left_schema is None:
        left_schema = [(f.name, f.type)
                       for f in left_ds.schema().base_schema]
    if right_schema is None:
        right_schema = [(f.name, f.type)
                        for f in right_ds.schema().base_schema]
    left_names = [n for n, _ in left_schema]
    out_right = [(n, t) for n, t in right_schema
                 if n in (right_start, right_end)]
    overlap = set(left_names) & {right_start, right_end}
    if overlap:
        raise ValueError(f"range_join output columns collide: {overlap}")
    union_schema = left_schema + out_right

    def tag(is_left: bool, own_schema):
        own = {n for n, _ in own_schema}

        def fn(batch: pa.Table) -> pa.Table:
            # null keys/timestamps never match an interval — drop before
            # hashing (null → NaN through numpy corrupts partitioning)
            batch = batch.filter(pc.is_valid(batch[key]))
            cols = {name: (pc.cast(batch[name], typ) if name in own
                           else pa.nulls(len(batch), typ))
                    for name, typ in union_schema}
            k = pc.cast(batch[key], pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                part = ((k * np.uint64(2654435761))
                        % np.uint64(num_partitions)).astype(np.int32)
            cols["__key"] = pc.cast(batch[key], pa.int64())
            cols["__part"] = pa.array(part, pa.int32())
            cols["__left"] = pa.array(np.full(len(batch), is_left), pa.bool_())
            return pa.table(cols)

        return fn

    def probe(group: pa.Table) -> pa.Table:
        is_left = group["__left"]
        lt = group.filter(is_left)
        rt = group.filter(pc.invert(is_left))
        # null timestamps / bounds can never satisfy the containment
        lt = lt.filter(pc.is_valid(lt[left_ts]))
        rt = rt.filter(pc.and_(pc.is_valid(rt[right_start]),
                               pc.is_valid(rt[right_end])))
        empty = pa.table({n: pa.array([], t) for n, t in union_schema})
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        # One vectorized merge over ALL keys in the partition (same shape
        # as asof_join's searchsorted sweep, generalized cross-key): sort
        # the union of interval-starts and probe timestamps by
        # (key, time, side) with interval rows winning ties, then the
        # candidate interval for each left row is the most recent
        # interval-start at or before it, validated to lie in the same
        # key block and to contain the timestamp.
        lkey = lt["__key"].to_numpy(zero_copy_only=False)
        lts = pc.cast(lt[left_ts], pa.int64()).to_numpy(zero_copy_only=False)
        rkey = rt["__key"].to_numpy(zero_copy_only=False)
        rst = pc.cast(rt[right_start],
                      pa.int64()).to_numpy(zero_copy_only=False)
        ren = pc.cast(rt[right_end], pa.int64()).to_numpy(zero_copy_only=False)
        n_r, n_l = len(rkey), len(lkey)
        key_all = np.concatenate([rkey, lkey])
        ts_all = np.concatenate([rst, lts])
        side_all = np.concatenate([np.zeros(n_r, np.int8),
                                   np.ones(n_l, np.int8)])
        order = np.lexsort((side_all, ts_all, key_all))
        k_s = key_all[order]
        side_s = side_all[order]
        n = n_r + n_l
        # last interval row at or before each sorted position
        last_right = np.maximum.accumulate(
            np.where(side_s == 0, np.arange(n), -1))
        # first sorted position of each key block (k_s is sorted)
        block_first = np.searchsorted(k_s, k_s, side="left")
        left_pos = np.nonzero(side_s == 1)[0]
        j = last_right[left_pos]
        ok = j >= block_first[left_pos]  # an interval exists in this block
        left_idx = order[left_pos] - n_r
        right_idx = order[np.clip(j, 0, n - 1)]  # < n_r where ok
        ok &= lts[left_idx] <= ren[np.clip(right_idx, 0, n_r - 1)]
        keep_l = left_idx[ok]
        keep_r = right_idx[ok]
        lt_kept = lt.take(pa.array(keep_l, pa.int64()))
        out = {nm: lt_kept[nm] for nm, _ in left_schema}
        matched = rt.take(pa.array(keep_r, pa.int64()))
        for nm, _ in out_right:
            out[nm] = matched[nm]
        return pa.table(out) if len(keep_l) else empty

    tagged = (left_ds.map_batches(tag(True, left_schema),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(tag(False, out_right + [(key, dict(right_schema)[key])]),
                                          batch_format="pyarrow")))
    return tagged.groupby("__part").map_groups(probe,
                                               batch_format="pyarrow")


def order_priority_revenue(orders_ds, lineitem_ds,
                           num_partitions: int = JOIN_PARTITIONS
                           ) -> "ray.data.Dataset":
    """Revenue per order priority — a large×large join pipeline (TPC-H
    Q4-flavored): lineitem revenue is partially pre-aggregated per
    orderkey inside map_batches (shrinks the exchange ~4×, sum is
    distributive so cross-batch partials need no reduce before the join),
    hash-joined to orders, then a tiny partial+merge groupby on
    priority. Size ``num_partitions`` to the data (rows/partition bounds
    per-task memory; at toy scale fewer partitions avoid paying the
    per-task floor 256 times)."""

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({"l_orderkey": batch["l_orderkey"], "revenue": rev})
        return (t.group_by(["l_orderkey"]).aggregate([("revenue", "sum")])
                 .rename_columns(["l_orderkey", "revenue"]))

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(orders_ds, li, on="o_orderkey", right_on="l_orderkey",
                       num_partitions=num_partitions,
                       right_schema=[("l_orderkey", pa.int64()),
                                     ("revenue", pa.float64())])

    def pr_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": batch["o_orderpriority"],
                      "revenue": batch["revenue"]})
        return (t.group_by(["o_orderpriority"])
                 .aggregate([("revenue", "sum")])
                 .rename_columns(["o_orderpriority", "revenue"]))

    def merge(group: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": [group["o_orderpriority"][0].as_py()],
            "revenue": [round(pc.sum(group["revenue"]).as_py(), 2)],
        })

    return (joined.map_batches(pr_partial, batch_format="pyarrow")
                  .groupby("o_orderpriority")
                  .map_groups(merge, batch_format="pyarrow"))


def shipping_priority(customer_ds, orders_ds, lineitem_ds,
                      limit: int = 10,
                      num_partitions: int = JOIN_PARTITIONS
                      ) -> pa.Table:
    """TPC-H Q3-flavored shipping priority: unshipped revenue per order
    for one market segment — top ``limit`` orders by revenue. The
    segment / o_orderdate < cutoff / l_shipdate > cutoff predicates are
    the CALLER's read-time filters (pushed down to the parquet scan so
    filtered rows never leave storage — see ``_q_shipping_priority``).
    Pipeline: lineitem pre-aggregates integer CENTS per orderkey inside
    map_batches (exchange shrinks to unique orderkeys per batch; cents
    make the sum order-free so it can't diverge from a SQL twin),
    orders LEFT-SEMI joins the filtered customer keys, then one
    large×large hash join + a per-orderkey cents merge. Result is
    ``limit`` rows — driver-side take is bounded."""

    def li_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.multiply(batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"])),
            100.0), 0.5)), pa.int64())
        t = pa.table({"l_orderkey": batch["l_orderkey"], "cents": cents})
        return (t.group_by(["l_orderkey"]).aggregate([("cents", "sum")])
                 .rename_columns(["l_orderkey", "cents"]))

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    cust = customer_ds.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"]}),
        batch_format="pyarrow")
    seg_orders = hash_join(
        orders_ds, cust, on="o_custkey", right_on="c_custkey",
        join_type="left semi", num_partitions=num_partitions,
        left_schema=[("o_orderkey", pa.int64()),
                     ("o_custkey", pa.int64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())],
        right_schema=[("c_custkey", pa.int64())])
    joined = hash_join(
        seg_orders, li, on="o_orderkey", right_on="l_orderkey",
        num_partitions=num_partitions,
        left_schema=[("o_orderkey", pa.int64()),
                     ("o_custkey", pa.int64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())],
        right_schema=[("l_orderkey", pa.int64()),
                      ("cents", pa.int64())])

    def merge(group: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": group["o_orderkey"][:1],
            "revenue": pa.array(
                [pc.sum(group["cents"]).as_py() / 100.0], pa.float64()),
            "o_orderdate": group["o_orderdate"][:1],
            "o_orderpriority": group["o_orderpriority"][:1],
        })

    per_order = (joined.groupby("o_orderkey")
                       .map_groups(merge, batch_format="pyarrow"))
    top = per_order.sort(["revenue", "o_orderkey"],
                         descending=[True, False]).limit(limit)
    return pa.concat_tables(list(top.iter_batches(batch_format="pyarrow")))


def revenue_by_nation(customer_ds, orders_ds, lineitem_ds,
                      nation: pa.Table, region: pa.Table,
                      region_name: str = "ASIA",
                      num_partitions: int = JOIN_PARTITIONS
                      ) -> "ray.data.Dataset":
    """Revenue per customer nation within one region — a TPC-H-Q5-flavored
    multi-way join mixing BOTH join strategies by side size:

    - nation ⋈ region (25×5 rows) joins on the DRIVER, and the resulting
      nationkey → n_name map is ``ray.put`` once and probed with
      ``pc.index_in`` inside customer's map_batches (broadcast join —
      zero shuffle for the dimension hop, rows of other regions drop
      before any exchange);
    - orders ⋈ customer and lineitem ⋈ orders are large×large
      reduce-side ``hash_join``s; lineitem revenue is pre-aggregated per
      orderkey inside map_batches before its exchange (distributive sum,
      ~4× smaller shuffle);
    - the final groupby(n_name) is a partial+merge over ≤ a handful of
      nations per region.
    """
    import ray

    dim = nation.join(region.filter(pc.equal(region["r_name"], region_name)),
                      keys=["n_regionkey"], right_keys=["r_regionkey"],
                      join_type="inner")
    dim_ref = ray.put((dim["n_nationkey"].combine_chunks(),
                       dim["n_name"].combine_chunks()))

    def cust_map(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(dim_ref)
        idx = pc.index_in(batch["c_nationkey"], value_set=keys)
        t = pa.table({"c_custkey": batch["c_custkey"],
                      "n_name": pc.cast(pc.take(names, idx), pa.string())})
        return t.filter(pc.is_valid(t["n_name"]))

    cust = customer_ds.map_batches(cust_map, batch_format="pyarrow")

    def oc_proj(t: pa.Table) -> pa.Table:
        # explicit projection, not select_columns: Ray 2.49's Project op
        # after map_groups reports a stale (pre-projection) .schema(),
        # which the downstream hash_join reads to build its union schema
        return t.select(["o_orderkey", "n_name"])

    # schemas passed explicitly: every intermediate here is map-produced,
    # and Dataset.schema() on those EXECUTES a limit-1 probe per call
    ord_cust = hash_join(orders_ds, cust,
                         on="o_custkey", right_on="c_custkey",
                         num_partitions=num_partitions,
                         left_schema=[("o_orderkey", pa.int64()),
                                      ("o_custkey", pa.int64())],
                         right_schema=[("c_custkey", pa.int64()),
                                       ("n_name", pa.string())]
                         ).map_batches(oc_proj, batch_format="pyarrow")

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({"l_orderkey": batch["l_orderkey"], "revenue": rev})
        return (t.group_by(["l_orderkey"]).aggregate([("revenue", "sum")])
                 .rename_columns(["l_orderkey", "revenue"]))

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(li, ord_cust, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=num_partitions,
                       left_schema=[("l_orderkey", pa.int64()),
                                    ("revenue", pa.float64())],
                       right_schema=[("o_orderkey", pa.int64()),
                                     ("n_name", pa.string())])

    def n_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"n_name": batch["n_name"],
                      "revenue": batch["revenue"]})
        return (t.group_by(["n_name"]).aggregate([("revenue", "sum")])
                 .rename_columns(["n_name", "revenue"]))

    def merge(group: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": [group["n_name"][0].as_py()],
            "revenue": [round(pc.sum(group["revenue"]).as_py(), 2)],
        })

    return (joined.map_batches(n_partial, batch_format="pyarrow")
                  .groupby("n_name")
                  .map_groups(merge, batch_format="pyarrow"))


def top_revenue_orders(lineitem_ds, k: int = 100) -> "ray.data.Dataset":
    """Global top-k orders by lineitem revenue — the ORDER BY … LIMIT
    shape: per-orderkey partial revenue inside map_batches, one
    groupby(orderkey) exchange, then Ray's distributed sample-based sort
    on (revenue DESC, orderkey ASC) with the limit pushed against the
    sorted stream. Revenue accumulates in integer CENTS (exact in any
    order — the ``running_totals`` discipline) so the value, and with
    the orderkey tie-break the top-k set, is a total order the SQL twin
    shares bit-for-bit.

    Scale note: the sort's input is one row per ORDER (already reduced),
    not per lineitem — at 100 TB the exchange is ~1% of the raw table;
    a top-k that skipped the per-key aggregate could instead per-batch
    prune, but revenue spans batches so the aggregate is required."""
    from ray.data.aggregate import Sum

    def li_partial(batch: pa.Table) -> pa.Table:
        # integer CENTS per lineitem (floor(x·100 + 0.5) = the SQL twin's
        # exact per-row expression): int64 partials sum exactly in any
        # accumulation order, where a float sum rounded at the end flips
        # half-cent boundaries depending on block split (seen at sf0.1)
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"])
                          ).to_numpy(zero_copy_only=False)
        cents = np.floor(rev * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"l_orderkey": batch["l_orderkey"],
                      "cents": pa.array(cents, pa.int64())})
        return (t.group_by(["l_orderkey"]).aggregate([("cents", "sum")])
                 .rename_columns(["l_orderkey", "cents"]))

    def to_revenue(batch: pa.Table) -> pa.Table:
        rev = pc.divide(pc.cast(batch["cents"], pa.float64()),
                        pa.scalar(100.0))
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "revenue": rev})

    return (lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
            .groupby("l_orderkey")
            .aggregate(Sum("cents", alias_name="cents"))
            .map_batches(to_revenue, batch_format="pyarrow")
            .sort(["revenue", "l_orderkey"], descending=[True, False])
            .limit(k))


def running_totals(ds) -> "ray.data.Dataset":
    """Cumulative window functions over events: per ``user_id`` ordered by
    ``(ts, event_id)``, running row number, running sum of ``value`` in
    integer cents, and the inter-event gap in microseconds (a LAG twin).

    The running sum is computed on ``floor(value·100)`` as int64 — exact
    integer arithmetic, so the result is independent of accumulation
    order (a float ``SUM(...) OVER`` could diverge from the oracle when
    the engine sums a frame in a different order). One shuffle (groupby
    user_id); the per-group sweep is numpy lexsort + cumsum — no Python
    row loop. At 100 TB the partitioning assumption is the usual one for
    window functions: a single user's history fits in one group.

    SQL twin: ``ROW_NUMBER() / SUM(cents) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)`` and
    ``epoch_us(ts) - LAG(epoch_us(ts)) OVER ...``."""

    def prefilter(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(
            pc.coalesce(batch["value"], pa.scalar(0.0)),
            pa.scalar(100.0))), pa.int64())
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "cents": cents,
        })

    def sweep(group: pa.Table) -> pa.Table:
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        cents = group["cents"].to_numpy(zero_copy_only=False)[order]
        gaps = np.empty(len(ts), dtype=object)
        gaps[0] = None
        gaps[1:] = (ts[1:] - ts[:-1]).tolist()
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": group["user_id"],
            "rn": pa.array(np.arange(1, len(ts) + 1), pa.int64()),
            "cum_cents": pa.array(np.cumsum(cents), pa.int64()),
            "gap_us": pa.array(gaps.tolist(), pa.int64()),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(sweep, batch_format="pyarrow"))


def rolling_event_stats(ds, window: int = 7) -> "ray.data.Dataset":
    """Bounded ROWS-frame window aggregates over events: per ``user_id``
    ordered by ``(ts, event_id)``, the rolling sum and rolling mean of
    ``value`` over the last ``window`` rows (``ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW``) — the moving-average shape
    ``running_totals``'s unbounded frame doesn't cover.

    Same exactness discipline as ``running_totals``: the frame sum is
    ``floor(value·100)`` int64 cents via a cumsum difference (exact in
    any accumulation order); the mean is then ONE float64 division
    ``cents / (100·count)`` that the SQL twin reproduces bit-for-bit.
    Rows with null ``ts`` are dropped on both sides (a null sort key has
    no well-defined frame). One shuffle (groupby user_id); the per-group
    sweep is numpy lexsort + cumsum — no Python row loop. Partitioning
    assumption at 100 TB: one user's history fits in one group.

    SQL twin: ``SUM(cents) OVER w`` / ``COUNT(*) OVER w`` with
    ``w AS (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN {window-1} PRECEDING AND CURRENT ROW)``."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def prefilter(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["ts"]))
        cents = pc.cast(pc.floor(pc.multiply(
            pc.coalesce(batch["value"], pa.scalar(0.0)),
            pa.scalar(100.0))), pa.int64())
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "cents": cents,
        })

    def sweep(group: pa.Table) -> pa.Table:
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        eid = eid[order]
        cents = group["cents"].to_numpy(zero_copy_only=False)[order]
        cum = np.cumsum(cents)
        roll = cum.copy()
        if len(cum) > window:
            roll[window:] -= cum[:-window]
        count = np.minimum(np.arange(1, len(cum) + 1), window)
        avg = roll.astype(np.float64) / (100.0 * count)
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": group["user_id"],
            "roll_cents": pa.array(roll, pa.int64()),
            "roll_avg": pa.array(avg, pa.float64()),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(sweep, batch_format="pyarrow"))


def weighted_avg_by_group(ds, group_column: str, value_column: str,
                          weight_column: str,
                          alias: str = "w_avg") -> "ray.data.Dataset":
    """Weighted mean per group — SUM(value·weight)/SUM(weight) — with the
    ``running_totals`` exactness discipline: value in floor(x·100+0.5)
    integer cents, weights cast int64 (the safe Arrow cast REJECTS
    non-integral weights instead of silently truncating), so both sums
    are exact in any accumulation order; the quotient is ONE mirrored
    float64 expression ``cents_sum / (100·weight_sum)``. Per-batch
    partials shrink the exchange to one row per (batch, group); zero- or
    null-weight rows contribute nothing. int64 partials hold to ~2^63 —
    beyond that (≳10^14 rows × 5e8/row) swap the Sum for a decimal128
    aggregate; the expression stays the same.

    SQL twin: ``CAST(CAST(SUM(cents·w) AS BIGINT) AS DOUBLE)
    / (100.0 * CAST(SUM(w) AS BIGINT)) GROUP BY group``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(batch[value_column]),
                       pc.is_valid(batch[weight_column]))
        batch = batch.filter(mask)
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(batch[value_column], pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        w = pc.cast(batch[weight_column], pa.int64())  # safe: raises if lossy
        t = pa.table({
            "grp": batch[group_column],
            "cw": pc.multiply(cents, w),
            "w": w,
        })
        return (t.group_by(["grp"]).aggregate([("cw", "sum"), ("w", "sum")])
                 .rename_columns(["grp", "cw", "w"]))

    def finish(batch: pa.Table) -> pa.Table:
        num = batch["cw"].to_numpy(zero_copy_only=False).astype(np.float64)
        den = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            group_column: batch["grp"],
            alias: pa.array(num / (100.0 * den), pa.float64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("grp")
              .aggregate(Sum("cw", alias_name="cw"), Sum("w", alias_name="w"))
              .map_batches(finish, batch_format="pyarrow"))


def distinct_count(ds, group_column: str, value_column: str,
                   alias: str = "n_distinct") -> "ray.data.Dataset":
    """COUNT(DISTINCT value) per group. Per-batch partial dedupe (arrow
    ``group_by`` on the pair) shrinks the exchange to unique pairs per
    batch, then ONE shuffle co-locates each group and a vectorized
    ``map_groups`` counts its unique values. Uniform over group keys —
    a skewed group carries only its distinct values, not its rows."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"grp": batch[group_column], "val": batch[value_column]})
        t = t.filter(pc.is_valid(t["val"]))  # COUNT(DISTINCT) ignores NULLs
        return (t.group_by(["grp", "val"]).aggregate([])
                 .rename_columns(["grp", "val"]))

    def count_group(group: pa.Table) -> pa.Table:
        n = len(pc.unique(group["val"]))
        return pa.table({
            group_column: group["grp"][:1],
            alias: pa.array([n], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("grp")
              .map_groups(count_group, batch_format="pyarrow"))


def latest_event_per_user(ds) -> "ray.data.Dataset":
    """Latest event per user (argmax-per-group / DISTINCT ON): one
    groupby(user) co-location, vectorized in-group argmax on
    (ts, event_id) — the dedup-to-canonical-row primitive (keep newest
    version of a document, last state of a session). Per-batch partial
    argmax BEFORE the shuffle ships one row per (batch, user), so a
    user's row count never exceeds the batch count."""

    def partial(batch: pa.Table) -> pa.Table:
        # in-batch argmax per user: sort desc once, keep first per user
        batch = batch.filter(pc.is_valid(batch["user_id"]))
        if batch.num_rows == 0:  # all-null batch: [[True]] would be len 1
            return batch
        idx = pc.sort_indices(batch, sort_keys=[
            ("user_id", "ascending"), ("ts", "descending"),
            ("event_id", "descending")])
        t = batch.take(idx)
        users = t["user_id"].to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], users[1:] != users[:-1]])
        return t.filter(pa.array(first))

    def merge(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[
            ("ts", "descending"), ("event_id", "descending")])
        return group.take(idx[:1])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(merge, batch_format="pyarrow"))


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = "metric", value_name: str = "value"
         ) -> "ray.data.Dataset":
    """Unpivot wide → long (pandas ``melt`` / SQL UNION ALL): each input
    row becomes ``len(value_cols)`` rows (id_cols…, metric, value).
    Stateless vectorized map — one column concat + tiled name column per
    batch, no shuffle, streams at any scale."""

    def unpivot(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: pa.concat_arrays(
                    [batch[c].combine_chunks()] * len(value_cols))
                for c in id_cols}
        cols[var_name] = pa.array(
            np.repeat(np.asarray(value_cols, dtype=object), n), pa.string())
        cols[value_name] = pa.concat_arrays(
            [pc.cast(batch[c], pa.float64()).combine_chunks()
             for c in value_cols])
        return pa.table(cols)

    return ds.map_batches(unpivot, batch_format="pyarrow")


def set_op_ids(left_ds, right_ds, column: str, op: str = "intersect"
               ) -> "ray.data.Dataset":
    """Distributed INTERSECT / EXCEPT over one key column (set
    semantics).  Null keys are DROPPED — note this diverges from SQL
    set ops, where INTERSECT/EXCEPT compare NULLs as equal (IS NOT
    DISTINCT FROM) and may emit one NULL row; callers whose key column
    can be null and who need SQL semantics must pre-map null to a
    sentinel.  Per-batch dedupe shrinks
    each side to unique keys per batch, then ONE groupby(key) merges
    side-presence flags — the exchange carries unique (batch, key)
    rows, never the raw row count."""
    if op not in ("intersect", "except"):
        raise ValueError(op)

    def tag(is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            vals = pc.unique(batch[column]).drop_null()
            flag = 1 if is_left else 2
            return pa.table({
                column: vals,
                "side": pa.array(np.full(len(vals), flag), pa.int64()),
            })
        return fn

    def merge(group: pa.Table) -> pa.Table:
        sides = set(group["side"].to_pylist())
        keep = (1 in sides and 2 in sides) if op == "intersect" \
            else (sides == {1})
        return group.select([column]).slice(0, 1 if keep else 0)

    tagged = (left_ds.map_batches(tag(True), batch_format="pyarrow")
              .union(right_ds.map_batches(tag(False),
                                          batch_format="pyarrow")))
    return tagged.groupby(column).map_groups(merge, batch_format="pyarrow")


def forecast_revenue_q6(lineitem_ds) -> pa.Table:
    """TPC-H Q6-flavored filtered global aggregate: revenue =
    Σ extendedprice·discount over the predicate window. The date /
    discount / quantity predicates are the CALLER's read-time filters
    (pushed down to the parquet scan); this stage is one vectorized
    per-batch integer-CENTS partial plus a one-row global sum — the
    cheapest possible shape: no shuffle, a scalar leaves each batch."""

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(pc.multiply(
            batch["l_extendedprice"], batch["l_discount"]),
            100.0), 0.5)), pa.int64())
        return pa.table({
            "cents": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
        })

    from ray.data.aggregate import Sum
    rows = (lineitem_ds.map_batches(partial, batch_format="pyarrow")
            .aggregate(Sum("cents", alias_name="cents")))
    total = rows["cents"] if rows and rows["cents"] is not None else 0
    return pa.table({"revenue": pa.array([total / 100.0], pa.float64())})


def grouped_covariance(ds, group_column: str, x_column: str,
                       y_column: str) -> "ray.data.Dataset":
    """Population covariance and Pearson correlation per group with an
    EXACT distributed core: x and y are floored to integers per row, so
    the per-batch partials (n, Σx, Σy, Σxy, Σx², Σy²) are exact int64
    sums (a sum-monoid — one tiny groupby merges them) and the only
    float operations are the final conversions, one multiply, one sqrt
    and one divide — each IEEE-correctly-rounded and expression-mirrored
    by the SQL twin, so the result is bit-identical. The exchange
    carries six integers per (batch, group). Caller must keep
    n·max(x)·max(y) within int64 per BATCH (the group merge uses
    arbitrary-precision Python ints, so only batch partials are
    bounded)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"grp": batch[group_column],
                      "x": pc.cast(pc.floor(pc.cast(batch[x_column],
                                                    pa.float64())),
                                   pa.int64()),
                      "y": pc.cast(pc.floor(pc.cast(batch[y_column],
                                                    pa.float64())),
                                   pa.int64())})
        t = t.filter(pc.and_(pc.is_valid(t["x"]), pc.is_valid(t["y"])))
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        t = t.append_column("xy", pa.array(x * y, pa.int64()))
        t = t.append_column("xx", pa.array(x * x, pa.int64()))
        t = t.append_column("yy", pa.array(y * y, pa.int64()))
        t = t.append_column("n", pa.array(np.ones(len(x), np.int64)))
        return (t.group_by(["grp"])
                 .aggregate([("n", "sum"), ("x", "sum"), ("y", "sum"),
                             ("xy", "sum"), ("xx", "sum"), ("yy", "sum")])
                 .rename_columns(["grp", "n", "sx", "sy", "sxy", "sxx",
                                  "syy"]))

    def finish(group: pa.Table) -> pa.Table:
        # exact big-int algebra (Python ints), float only at the end —
        # mirrored 1:1 by the twin's HUGEINT → DOUBLE expressions
        n = int(pc.sum(group["n"]).as_py())
        sx = int(pc.sum(group["sx"]).as_py())
        sy = int(pc.sum(group["sy"]).as_py())
        sxy = int(pc.sum(group["sxy"]).as_py())
        sxx = int(pc.sum(group["sxx"]).as_py())
        syy = int(pc.sum(group["syy"]).as_py())
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = float(num) / float(n * n)
        denom = math.sqrt(float(vx) * float(vy))
        corr = float(num) / denom if denom else None
        return pa.table({
            group_column: group["grp"][:1],
            "n_rows": pa.array([n], pa.int64()),
            "cov": pa.array([cov], pa.float64()),
            "corr": pa.array([corr], pa.float64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("grp")
              .map_groups(finish, batch_format="pyarrow"))


def resample_daily_counts(ds) -> pa.Table:
    """Daily event counts per type with GAP FILL: a dense
    (day × event_type) grid zero-filled where no events landed — the
    resample primitive time-series consumers expect. One pre-combined
    count exchange (one row per (batch, day, type)); the dense grid is
    built driver-side from the aggregated counts (bounded by
    days × types, never row-scaled)."""
    _DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        # filter null ts BEFORE the numpy conversion: a null slot would
        # turn the int64 array float64-with-NaN and crash the re-cast
        batch = batch.filter(pc.and_(pc.is_valid(batch["ts"]),
                                     pc.is_valid(batch["event_type"])))
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({
            "day": pa.array((ts // _DAY) * _DAY, pa.int64()),
            "event_type": batch["event_type"],
        })
        return (t.group_by(["day", "event_type"])
                 .aggregate([([], "count_all")])
                 .rename_columns(["day", "event_type", "n"]))

    from ray.data.aggregate import Sum
    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["day", "event_type"])
              .aggregate(Sum("n", alias_name="n"))
              .take_all())  # bounded: days × types
    if not rows:
        return pa.table({"day": pa.array([], pa.timestamp("us")),
                         "event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64())})
    counts = {(r["day"], r["event_type"]): r["n"] for r in rows}
    days = np.arange(min(d for d, _ in counts),
                     max(d for d, _ in counts) + _DAY, _DAY)
    types = sorted({t for _, t in counts})
    grid_days = np.repeat(days, len(types))
    grid_types = types * len(days)
    n = [counts.get((int(d), t), 0)
         for d, t in zip(grid_days, grid_types)]
    return pa.table({
        "day": pa.array(grid_days, pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(grid_types, pa.string()),
        "n_events": pa.array(n, pa.int64()),
    })


def mode_per_group(ds, group_column: str, value_column: str
                   ) -> "ray.data.Dataset":
    """Most frequent value per group (mode), ties → smallest value —
    deterministic, SQL-twin-exact. Per-batch (group, value) counts
    shrink the exchange to unique pairs per batch; one groupby(group,
    value) sums partials; a second TINY groupby(group) takes the argmax
    (its input is one row per distinct (group, value), never raw
    rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"grp": batch[group_column],
                      "val": batch[value_column]})
        t = t.filter(pc.and_(pc.is_valid(t["grp"]), pc.is_valid(t["val"])))
        return (t.group_by(["grp", "val"]).aggregate([([], "count_all")])
                 .rename_columns(["grp", "val", "cnt"]))

    from ray.data.aggregate import Sum
    pair_counts = (ds.map_batches(partial, batch_format="pyarrow")
                     .groupby(["grp", "val"])
                     .aggregate(Sum("cnt", alias_name="cnt")))

    def argmax(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("cnt", "descending"),
                                                ("val", "ascending")])
        top = group.take(idx[:1])
        return pa.table({
            group_column: top["grp"],
            "mode_value": top["val"],
            "mode_count": top["cnt"],
        })

    return pair_counts.groupby("grp").map_groups(argmax,
                                                 batch_format="pyarrow")


def rollup_agg(ds, group_cols: list[str], value_column: str):
    """GROUP BY ROLLUP(``group_cols``): every prefix level of the
    hierarchy plus the grand total, as one table with NULLs marking
    rolled-up columns — ``sum_cents`` (int64 cents, so accumulation
    order can't diverge from a SQL twin) and ``n_rows``.

    Dataflow: ONE distributed partial-agg + groupby at the FINEST level
    (the only data-sized work), then the coarser levels fold from the
    finest result, which is group-cardinality-bounded (take_all of a
    few-hundred-row table, never the input)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch[value_column], pa.float64()), 100.0), 0.5)),
            pa.int64())
        t = batch.select(group_cols).append_column("cents", cents)
        return (t.group_by(group_cols)
                 .aggregate([("cents", "sum"), ([], "count_all")])
                 .rename_columns(group_cols + ["sum_cents", "n_rows"]))

    from ray.data.aggregate import Sum
    finest = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_cols)
                .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                           Sum("n_rows", alias_name="n_rows")))
    rows = finest.take_all()  # bounded by finest group cardinality
    base = pa.table({
        **{c: pa.array([r[c] for r in rows], pa.string())
           for c in group_cols},
        "sum_cents": pa.array([r["sum_cents"] for r in rows], pa.int64()),
        "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
    })
    levels = [base]
    for lvl in range(len(group_cols) - 1, -1, -1):
        keep = group_cols[:lvl]
        agg = (base.group_by(keep)
                   .aggregate([("sum_cents", "sum"), ("n_rows", "sum")])
               if keep else pa.table({
                   "sum_cents_sum": pa.array(
                       [pc.sum(base["sum_cents"]).as_py() or 0], pa.int64()),
                   "n_rows_sum": pa.array(
                       [pc.sum(base["n_rows"]).as_py() or 0], pa.int64()),
               }))
        cols = {c: (agg[c] if c in keep
                    else pa.nulls(agg.num_rows, pa.string()))
                for c in group_cols}
        cols["sum_cents"] = agg["sum_cents_sum"]
        cols["n_rows"] = agg["n_rows_sum"]
        levels.append(pa.table(cols))
    return pa.concat_tables(levels)


def pivot_counts(ds, group_column: str, pivot_column: str,
                 categories: list[str]):
    """Long→wide conditional-count pivot: one output row per
    ``group_column`` value with an ``n_<category>`` int64 column per
    category (unlisted categories are ignored). Classic two-phase
    aggregate: per-batch vectorized partials (dictionary-encode + 2-D
    bincount — no Python row loop), then ONE groupby summing the
    per-category partial columns; the exchange carries one row per
    (batch, group), never the events."""
    import pyarrow.compute as pc

    cat_index = {c: i for i, c in enumerate(categories)}
    cat_set = pa.array(categories)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        grp = batch[group_column]
        enc_g = grp.combine_chunks().dictionary_encode()
        gcodes = enc_g.indices.to_numpy(zero_copy_only=False)
        pos = _pc.index_in(batch[pivot_column], value_set=cat_set)
        ccodes = _pc.fill_null(pos, -1).to_numpy(zero_copy_only=False)
        keep = ccodes >= 0
        n_g, n_c = len(enc_g.dictionary), len(categories)
        counts = np.zeros((n_g, n_c), dtype=np.int64)
        np.add.at(counts, (gcodes[keep], ccodes[keep]), 1)
        cols = {group_column: enc_g.dictionary}
        for c, i in cat_index.items():
            cols[f"n_{c}"] = pa.array(counts[:, i], pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_column)
              .aggregate(*[Sum(f"n_{c}", alias_name=f"n_{c}")
                           for c in categories]))


def value_histogram(ds, column: str, width: float):
    """Fixed-width histogram: ``bin = floor(value / width)`` (int64) →
    count. Per-batch vectorized bin partials, one tiny groupby-sum
    exchange (one row per (batch, bin))."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        bins = pc.cast(pc.floor(pc.divide(
            pc.cast(batch[column], pa.float64()), float(width))),
            pa.int64())
        return (pa.table({"bin": bins})
                .group_by(["bin"]).aggregate([([], "count_all")])
                .rename_columns(["bin", "n"]))

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bin").aggregate(Sum("n", alias_name="n")))


def grouped_topk(ds, group_column: str, order_column: str, k: int,
                 tie_column: str, num_partitions: int = JOIN_PARTITIONS):
    """Top-k rows per group by (``order_column`` DESC, ``tie_column``
    ASC) — the distributed QUALIFY row_number() <= k. Rows co-locate by
    hash(group) into coarse partitions (one map_groups call per
    PARTITION, not per group); inside, one lexsort + run-position prune
    over the whole partition (no per-group Python loop). Only ordering
    ever touches ``order_column`` values, so float columns are safe —
    no arithmetic to diverge from a SQL twin."""

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch[group_column].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((key * np.uint64(2654435761))
                    % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part, pa.int32()))

    def head(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["__part"])
        grp = group[group_column].to_numpy(zero_copy_only=False)
        val = group[order_column].to_numpy(zero_copy_only=False)
        tie = group[tie_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, -val, grp))
        g_sorted = grp[order]
        run_start = np.flatnonzero(np.concatenate(
            [[True], g_sorted[1:] != g_sorted[:-1]]))
        rank = np.arange(len(order)) - np.repeat(
            run_start,
            np.diff(np.concatenate([run_start, [len(order)]])))
        return (group.take(pa.array(order[rank < k], pa.int64()))
                     .drop_columns(["__part"]))

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__part").map_groups(head, batch_format="pyarrow"))


def funnel_conversion(ds, from_type: str, to_type: str,
                      within_us: int = 7 * 86_400_000_000):
    """Funnel step: for every ``from_type`` event, did the same user
    fire a ``to_type`` event in ``(ts, ts + within_us]``? One row per
    from-event with a ``converted`` flag — the per-event form that both
    feeds a global rate and joins back to cohorts.

    Same dataflow as the as-of join (groupby(user) co-location), with a
    vectorized two-searchsorted window probe per group."""

    def probe(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(order)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        types = g["event_type"]
        src = np.nonzero(pc.equal(types, from_type).to_numpy(
            zero_copy_only=False))[0]
        dst = np.nonzero(pc.equal(types, to_type).to_numpy(
            zero_copy_only=False))[0]
        dst_ts = ts[dst]
        lo = np.searchsorted(dst_ts, ts[src], side="right")
        hi = np.searchsorted(dst_ts, ts[src] + within_us, side="right")
        return pa.table({
            "event_id": pa.array(ids[src], pa.int64()),
            "user_id": pa.array(
                np.full(len(src), g["user_id"][0].as_py()), pa.int64()),
            "converted": pa.array(hi > lo, pa.bool_()),
        })

    def prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(
            batch["event_type"],
            value_set=pa.array([from_type, to_type])))

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(probe, batch_format="pyarrow"))


def cube_agg(ds, group_cols: list[str], value_column: str):
    """GROUP BY CUBE(``group_cols``): every SUBSET of the grouping
    columns (rollup's prefix lattice → the full lattice). Same dataflow
    as ``rollup_agg``: one distributed finest-level aggregate, the other
    2^k − 1 levels folded from its group-cardinality-bounded result."""
    import itertools

    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch[value_column], pa.float64()), 100.0), 0.5)),
            pa.int64())
        t = batch.select(group_cols).append_column("cents", cents)
        return (t.group_by(group_cols)
                 .aggregate([("cents", "sum"), ([], "count_all")])
                 .rename_columns(group_cols + ["sum_cents", "n_rows"]))

    from ray.data.aggregate import Sum
    finest = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_cols)
                .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                           Sum("n_rows", alias_name="n_rows")))
    rows = finest.take_all()  # bounded by finest group cardinality
    base = pa.table({
        **{c: pa.array([r[c] for r in rows], pa.string())
           for c in group_cols},
        "sum_cents": pa.array([r["sum_cents"] for r in rows], pa.int64()),
        "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
    })
    levels = [base]
    subsets = itertools.chain.from_iterable(
        itertools.combinations(group_cols, k)
        for k in range(len(group_cols)))
    for keep in subsets:
        keep = list(keep)
        agg = (base.group_by(keep)
                   .aggregate([("sum_cents", "sum"), ("n_rows", "sum")])
               if keep else pa.table({
                   "sum_cents_sum": pa.array(
                       [pc.sum(base["sum_cents"]).as_py() or 0], pa.int64()),
                   "n_rows_sum": pa.array(
                       [pc.sum(base["n_rows"]).as_py() or 0], pa.int64()),
               }))
        cols = {c: (agg[c] if c in keep
                    else pa.nulls(agg.num_rows, pa.string()))
                for c in group_cols}
        cols["sum_cents"] = agg["sum_cents_sum"]
        cols["n_rows"] = agg["n_rows_sum"]
        levels.append(pa.table(cols))
    return pa.concat_tables(levels)


def grouped_moments(ds, group_column: str, value_column: str,
                    scale: int = 1000):
    """Per-group mean and population variance via streaming (n, Σx, Σx²)
    partials — the one-pass moments shape every aggregation engine
    ships. Values are fixed-point scaled (``floor(v·scale + 0.5)``
    int64) before accumulation, so the partial sums are EXACT integers
    and the final float64 expressions ``mean = (Σx/n)/scale`` and
    ``var = (Σx²/n − (Σx/n)²)/scale²`` are bit-identical to a SQL twin
    computing the same expressions from the same integers — accumulation
    order can never diverge."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch[value_column], pa.float64()), float(scale)),
            0.5)), pa.int64())
        t = pa.table({group_column: batch[group_column], "x": v,
                      "xx": pc.multiply(v, v)})
        return (t.group_by([group_column])
                 .aggregate([("x", "sum"), ("xx", "sum"),
                             ([], "count_all")])
                 .rename_columns([group_column, "sx", "sxx", "n"]))

    from ray.data.aggregate import Sum

    def finish(batch: pa.Table) -> pa.Table:
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = batch["sxx"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean_s = sx / n
        var_s = sxx / n - mean_s * mean_s
        return pa.table({
            group_column: batch[group_column],
            "n": pc.cast(batch["n"], pa.int64()),
            "mean_value": pa.array(mean_s / scale, pa.float64()),
            "var_value": pa.array(var_s / (scale * scale), pa.float64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_column)
              .aggregate(Sum("sx", alias_name="sx"),
                         Sum("sxx", alias_name="sxx"),
                         Sum("n", alias_name="n"))
              .map_batches(finish, batch_format="pyarrow"))


_WEEK_US = 7 * 86_400_000_000
_DAY_US = 86_400_000_000


def _week_start_us(ts_us: np.ndarray) -> np.ndarray:
    """Truncate epoch-µs timestamps to ISO week starts (Monday 00:00) —
    DuckDB's date_trunc('week', ts) for non-negative timestamps.
    1970-01-01 was a Thursday, so Monday-index = (days + 3) % 7."""
    days = ts_us // _DAY_US
    return (days - (days + 3) % 7) * _DAY_US


def cohort_retention(ds):
    """Cohort retention matrix: users grouped by the ISO week of their
    FIRST event; for each (cohort_week, week_offset) count the distinct
    users active that week. Two shuffles: one groupby(user) computing
    first-ts AND emitting each user's distinct (cohort, offset) rows in
    the same co-located sweep (no join needed), then one
    count-aggregate whose exchange carries one row per
    (batch, cohort, offset)."""
    import pyarrow.compute as pc

    def per_user(group: pa.Table) -> pa.Table:
        ts = pc.cast(group["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        weeks = _week_start_us(ts)
        cohort = weeks.min()
        offsets = np.unique((weeks - cohort) // _WEEK_US)
        return pa.table({
            "cohort_week": pa.array(
                np.full(len(offsets), cohort), pa.int64()
            ).cast(pa.timestamp("us")),
            "week_offset": pa.array(offsets, pa.int64()),
        })

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["cohort_week", "week_offset"])
                     .aggregate([([], "count_all")])
                     .rename_columns(["cohort_week", "week_offset",
                                      "n_users"]))

    def fix_unit(batch: pa.Table) -> pa.Table:
        # Ray's aggregate round-trips the key through pandas and can
        # re-infer timestamp[s]; pin the µs unit the oracle emits.
        return batch.set_column(
            batch.schema.get_field_index("cohort_week"), "cohort_week",
            pc.cast(batch["cohort_week"], pa.timestamp("us")))

    from ray.data.aggregate import Sum
    return (ds.groupby("user_id")
              .map_groups(per_user, batch_format="pyarrow")
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["cohort_week", "week_offset"])
              .aggregate(Sum("n_users", alias_name="n_users"))
              .map_batches(fix_unit, batch_format="pyarrow"))


def event_transitions(ds):
    """First-order transition counts over each user's time-ordered
    event stream: (from_type, to_type) → count — the Markov-matrix /
    path-analysis primitive. One groupby(user) co-location with a
    vectorized shift inside the group, then a pre-combined count
    exchange (one row per (batch, from, to))."""
    import pyarrow.compute as pc

    def per_user(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(order)
        types = g["event_type"].combine_chunks()
        n = len(types)
        if n < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string())})
        return pa.table({"from_type": types.slice(0, n - 1),
                         "to_type": types.slice(1, n)})

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["from_type", "to_type"])
                     .aggregate([([], "count_all")])
                     .rename_columns(["from_type", "to_type", "n"]))

    from ray.data.aggregate import Sum
    return (ds.groupby("user_id")
              .map_groups(per_user, batch_format="pyarrow")
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["from_type", "to_type"])
              .aggregate(Sum("n", alias_name="n")))


def ntile_by_group(ds, group_column: str, order_column: str,
                   tiebreak_column: str, n: int = 4,
                   alias: str = "bucket") -> "ray.data.Dataset":
    """NTILE(n) OVER (PARTITION BY group ORDER BY order, tiebreak) —
    equal-frequency bucketing within each group, the standard recipe for
    stratified curriculum/quality tiers over a training corpus.

    SQL's NTILE rule: a partition of g rows gives the first ``g % n``
    tiles ``ceil(g/n)`` rows and the rest ``floor(g/n)``. One shuffle
    (groupby); the per-group pass is a numpy lexsort + closed-form rank
    arithmetic — no Python row loop. Null order/tiebreak/group rows are
    dropped up front (mirror with WHERE in the twin). Partitioning
    assumption (same as every window function here): one group's rows
    fit in a map_groups block.

    SQL twin: ``NTILE(n) OVER (PARTITION BY grp ORDER BY ord, tie)``."""

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[group_column])
        for c in (order_column, tiebreak_column):
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        return batch.filter(keep).select(
            [tiebreak_column, group_column, order_column])

    def assign(group: pa.Table) -> pa.Table:
        ordv = group[order_column].to_numpy(zero_copy_only=False)
        tie = group[tiebreak_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ordv))
        g = len(order)
        ranks = np.empty(g, dtype=np.int64)
        ranks[order] = np.arange(g, dtype=np.int64)
        base, rem = divmod(g, n)
        split = rem * (base + 1)
        # ranks < split land in the first `rem` (base+1)-sized tiles;
        # the rest in base-sized tiles. max() guards the unused branch
        # when base == 0 (np.where evaluates both).
        buckets = np.where(
            ranks < split,
            ranks // (base + 1) + 1,
            (ranks - split) // max(base, 1) + rem + 1)
        out = group.select([tiebreak_column, group_column])
        return out.append_column(alias, pa.array(buckets, pa.int64()))

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby(group_column)
              .map_groups(assign, batch_format="pyarrow"))


def share_of_total(ds, group_column: str, value_column: str,
                   alias: str = "share") -> pa.Table:
    """Ratio-to-report: each group's share of the grand total —
    SUM(cents) per group / SUM over all groups. Exact int64 cents
    partials (one row per batch × group on the exchange), ONE small
    groupby; the grand total is folded on the driver over the
    aggregated result, which is bounded by group cardinality, not row
    count. Float64 appears only in the final division of two exactly
    representable integers (exact below 2^53 total cents ≈ $90T), so
    the twin is bit-identical.

    SQL twin: ``CAST(sum_cents AS DOUBLE) /
    CAST(SUM(sum_cents) OVER () AS DOUBLE)`` over the grouped CTE."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch[group_column]),
                                     pc.is_valid(batch[value_column])))
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(batch[value_column], pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        t = pa.table({"grp": batch[group_column], "cents": cents})
        return (t.group_by(["grp"]).aggregate([("cents", "sum")])
                 .rename_columns(["grp", "cents"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("grp")
             .aggregate(Sum("cents", alias_name="cents")))
    rows = agg.take_all()  # bounded by group cardinality
    grp = [r["grp"] for r in rows]
    cents = np.array([r["cents"] for r in rows], dtype=np.int64)
    total = float(cents.sum())
    return pa.table({
        group_column: pa.array(grp),
        "sum_cents": pa.array(cents, pa.int64()),
        alias: pa.array(cents.astype(np.float64) / total, pa.float64()),
    })


def collect_distinct_sorted(ds, group_column: str, value_column: str,
                            sep: str = ",", alias: str = "vals",
                            count_alias: str = "n_vals"
                            ) -> "ray.data.Dataset":
    """ARRAY_AGG(DISTINCT v ORDER BY v) per group, rendered as a
    separator-joined string plus the distinct count — the profile/
    feature-vector shape ("which event types has this user emitted").
    Per-batch distinct-pair partial shrinks the exchange to unique
    (group, value) pairs per batch; ONE shuffle; the per-group fold is
    numpy unique + join. Values sort bytewise (numpy str ordering ==
    DuckDB's binary collation for ASCII values). Null groups/values
    dropped, as SQL aggregates do.

    SQL twin: ``string_agg(DISTINCT v, sep ORDER BY v)`` +
    ``COUNT(DISTINCT v)``."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"grp": batch[group_column],
                      "val": batch[value_column]})
        t = t.filter(pc.and_(pc.is_valid(t["grp"]), pc.is_valid(t["val"])))
        return (t.group_by(["grp", "val"]).aggregate([])
                 .rename_columns(["grp", "val"]))

    def fold(group: pa.Table) -> pa.Table:
        vals = np.unique(group["val"].to_numpy(zero_copy_only=False))
        return pa.table({
            group_column: group["grp"][:1],
            alias: pa.array([sep.join(vals.tolist())], pa.string()),
            count_alias: pa.array([len(vals)], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("grp")
              .map_groups(fold, batch_format="pyarrow"))


def dedup_consecutive(ds, group_column: str = "user_id",
                      order_columns: tuple[str, str] = ("ts", "event_id"),
                      value_column: str = "event_type"
                      ) -> "ray.data.Dataset":
    """Run-length dedup: within each group ordered by (ts, id), keep a
    row iff its value differs from the previous row's (first row always
    kept) — the streaming de-bounce used to strip repeated tool-call /
    retry turns from transcripts. Null values and keys are dropped up
    front (SQL's ``lag(v) <> v`` is NULL-poisoned otherwise; the twin
    mirrors with WHERE). One shuffle; numpy lexsort + shifted-compare
    per group, original rows returned by take() — no reconstruction.

    SQL twin: ``... WHERE prev IS NULL OR prev <> v`` over
    ``lag(v) OVER (PARTITION BY grp ORDER BY ts, id)``."""
    ts_col, id_col = order_columns

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[value_column])
        for c in (group_column, ts_col, id_col):
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        return batch.filter(keep).select(
            [id_col, group_column, ts_col, value_column])

    def sweep(group: pa.Table) -> pa.Table:
        ts = group[ts_col].to_numpy(zero_copy_only=False)
        eid = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        vals = group[value_column].to_numpy(zero_copy_only=False)[order]
        keep = np.empty(len(order), dtype=bool)
        keep[0] = True
        keep[1:] = vals[1:] != vals[:-1]
        return group.take(pa.array(order[keep]))

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby(group_column)
              .map_groups(sweep, batch_format="pyarrow"))


def argmin_by_group(ds, group_column: str, order_column: str,
                    tiebreak_column: str) -> "ray.data.Dataset":
    """Deterministic ARG MIN per group: the row whose (order, tiebreak)
    pair is lexicographically smallest — SQL's ``ROW_NUMBER() OVER
    (PARTITION BY g ORDER BY v, id) = 1``, i.e. ``min_by`` with the tie
    pinned (DuckDB's bare ``min_by`` is tie-nondeterministic, so the
    twin uses the window form). Per-batch partial: one numpy lexsort +
    first-row-per-group mask emits ONE candidate row per (batch, group)
    onto the exchange; the final per-group fold repeats the same argmin
    over the few candidates. No value arithmetic — the winning row's
    columns pass through byte-identical. Null keys/values dropped.
    """

    def _first_per_group(tbl: pa.Table) -> pa.Table:
        grp = tbl[group_column].to_numpy(zero_copy_only=False)
        v = tbl[order_column].to_numpy(zero_copy_only=False)
        tie = tbl[tiebreak_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, v, grp))
        g_sorted = grp[order]
        head = np.empty(len(order), dtype=bool)
        if len(order):
            head[0] = True
            head[1:] = g_sorted[1:] != g_sorted[:-1]
        return tbl.take(pa.array(order[head]))

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[group_column])
        for c in (order_column, tiebreak_column):
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        batch = batch.filter(keep).select(
            [group_column, order_column, tiebreak_column])
        return _first_per_group(batch)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_column)
              .map_groups(_first_per_group, batch_format="pyarrow"))


def cume_dist_by_group(ds, group_column: str, order_column: str,
                       id_column: str, alias: str = "cd"
                       ) -> "ray.data.Dataset":
    """CUME_DIST() OVER (PARTITION BY group ORDER BY value): fraction of
    the partition's rows with value <= this row's (ties share the
    fraction). One shuffle; the per-group pass is one numpy sort + a
    searchsorted(side='right') rank divide — no row loop. The result is
    one IEEE division of two integers below 2^53, so it is bit-identical
    to the twin. Null keys/values dropped both sides."""

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[group_column])
        for c in (order_column, id_column):
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        return batch.filter(keep).select(
            [id_column, group_column, order_column])

    def rank(group: pa.Table) -> pa.Table:
        v = group[order_column].to_numpy(zero_copy_only=False)
        sv = np.sort(v)
        cd = np.searchsorted(sv, v, side="right").astype(np.float64) / len(v)
        return pa.table({
            id_column: group[id_column],
            group_column: group[group_column],
            alias: pa.array(cd, pa.float64()),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby(group_column)
              .map_groups(rank, batch_format="pyarrow"))


def event_kgrams(ds, k: int = 3, min_count: int = 2,
                 group_column: str = "user_id",
                 order_columns: tuple[str, str] = ("ts", "event_id"),
                 value_column: str = "event_type"
                 ) -> "ray.data.Dataset":
    """Behavioral sequence mining: count each length-``k`` run of
    consecutive event types within a user's (ts, id)-ordered stream —
    the "what do users do next" n-gram table that feeds next-action
    models and funnel discovery. Windows never cross users.

    One shuffle co-locates each user; the per-group sweep is the
    ``dedup_consecutive`` lexsort plus a vectorized shifted join (no
    Python loop over events), folded to per-group (gram, count)
    partials, so the second exchange is gram-vocabulary-bounded — at
    most |event_types|^k distinct rows per group — never event-bounded.
    Null values/keys are dropped up front (the SQL twin's WHERE; grams
    are over the surviving sequence, matching ``lag`` over the filtered
    stream). Grams with global count < ``min_count`` are dropped.

    SQL twin: compose ``lag(v, k-1) || '>' || ... || v`` over
    ``PARTITION BY grp ORDER BY ts, id`` on the null-filtered stream,
    then GROUP BY having count >= min_count."""
    ts_col, id_col = order_columns

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[value_column])
        for c in (group_column, ts_col, id_col):
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        return batch.filter(keep).select(
            [id_col, group_column, ts_col, value_column])

    def sweep(group: pa.Table) -> pa.Table:
        ts = group[ts_col].to_numpy(zero_copy_only=False)
        eid = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        n = len(order) - k + 1
        if n <= 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vals = (group[value_column].combine_chunks()
                .take(pa.array(order)))
        shifted = [vals.slice(j, n) for j in range(k)]
        grams = pc.binary_join_element_wise(*shifted, ">")
        return (pa.table({"gram": grams})
                .group_by(["gram"]).aggregate([([], "count_all")])
                .rename_columns(["gram", "cnt"]))

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(prefilter, batch_format="pyarrow")
                .groupby(group_column)
                .map_groups(sweep, batch_format="pyarrow")
                .groupby("gram").aggregate(Sum("cnt", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        t = pa.table({"gram": batch["gram"],
                      "n": pc.cast(batch["n"], pa.int64())})
        return t.filter(pc.greater_equal(t["n"], min_count))

    return counts.map_batches(finish, batch_format="pyarrow")


def merge_intervals_by_group(ds, group_column: str = "user_id",
                             start_column: str = "s",
                             end_column: str = "e"
                             ) -> "ray.data.Dataset":
    """Interval union per group (gaps-and-islands): merge overlapping or
    touching [s, e] intervals within each group and report how many
    merged islands remain plus the total covered span — the activity-
    coverage primitive behind "hours of audio after overlap removal" /
    "distinct busy time per user" rollups.

    One shuffle co-locates each group's intervals (a group carries its
    interval count, not its raw event count, if the caller pre-reduces);
    the per-group sweep is fully vectorized: lexsort by (s, e), running
    ``np.maximum.accumulate`` of ends, an island starts where s exceeds
    the previous running max (touching intervals s == prev_max MERGE,
    matching the twin's ``s > prev_max`` island test), and per-island
    spans fall out of ``np.maximum.accumulate`` at island boundaries.
    Integer microseconds in, int64 out — hash-exact against the classic
    MAX() OVER (... ROWS ... 1 PRECEDING) gaps-and-islands SQL.

    Rows with a null key or endpoint are dropped up front (the twin's
    WHERE); intervals with e < s are kept as zero-length points at s
    (twin mirrors with greatest(e, s))."""

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[group_column])
        for c in (start_column, end_column):
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        batch = batch.filter(keep)
        s = pc.cast(batch[start_column], pa.int64())
        e = pc.max_element_wise(pc.cast(batch[end_column], pa.int64()), s)
        return pa.table({"grp": batch[group_column], "s": s, "e": e})

    def sweep(group: pa.Table) -> pa.Table:
        s = group["s"].to_numpy(zero_copy_only=False)
        e = group["e"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, s))
        s, e = s[order], e[order]
        run_max = np.maximum.accumulate(e)
        new_island = np.empty(len(s), dtype=bool)
        new_island[0] = True
        new_island[1:] = s[1:] > run_max[:-1]
        starts = np.flatnonzero(new_island)
        island_end = np.empty(len(starts), np.int64)
        island_end[:-1] = run_max[starts[1:] - 1]
        island_end[-1] = run_max[-1]
        covered = int((island_end - s[starts]).sum())
        return pa.table({
            group_column: group["grp"][:1],
            "n_intervals": pa.array([len(starts)], pa.int64()),
            "covered": pa.array([covered], pa.int64()),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("grp")
              .map_groups(sweep, batch_format="pyarrow"))


def late_orders_by_priority(orders_ds, lineitem_ds,
                            num_partitions: int = JOIN_PARTITIONS
                            ) -> "ray.data.Dataset":
    """Orders with at least one line shipped AFTER the order date,
    counted per priority — the correlated-EXISTS shape of TPC-H Q4
    (reference parity family: order_priority_revenue) rewritten as an
    aggregate: EXISTS(l_shipdate > o_orderdate) ⟺
    MAX(l_shipdate) > o_orderdate, so lineitem collapses to one
    (orderkey, max_ship) row BEFORE the join instead of probing per
    line. Per-batch max partials shrink the first exchange ~4×; the
    exact per-order max is one keyed groupby; one large×large hash
    join; the priority rollup is partial-merged (tiny final exchange).
    All comparisons are int64 microseconds — the SQL twin hashes
    exactly."""
    from ray.data.aggregate import Max, Sum

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": batch["l_orderkey"],
                      "ship_us": pc.cast(batch["l_shipdate"], pa.int64())})
        return (t.group_by(["l_orderkey"]).aggregate([("ship_us", "max")])
                 .rename_columns(["l_orderkey", "ship_us"]))

    last_ship = (lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Max("ship_us", alias_name="max_ship")))
    joined = hash_join(
        orders_ds, last_ship, on="o_orderkey", right_on="l_orderkey",
        num_partitions=num_partitions,
        left_schema=[("o_orderkey", pa.int64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())],
        right_schema=[("l_orderkey", pa.int64()),
                      ("max_ship", pa.int64())])

    def late_partial(batch: pa.Table) -> pa.Table:
        late = pc.greater(batch["max_ship"],
                          pc.cast(batch["o_orderdate"], pa.int64()))
        t = pa.table({"o_orderpriority": batch["o_orderpriority"]}
                     ).filter(late)
        return (t.group_by(["o_orderpriority"])
                 .aggregate([([], "count_all")])
                 .rename_columns(["o_orderpriority", "n"]))

    counts = (joined.map_batches(late_partial, batch_format="pyarrow")
                    .groupby("o_orderpriority")
                    .aggregate(Sum("n", alias_name="late_order_count")))
    return counts.map_batches(
        lambda b: pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "late_order_count": pc.cast(b["late_order_count"], pa.int64()),
        }), batch_format="pyarrow")


def priority_counts_by_linestatus(orders_ds, lineitem_ds,
                                  num_partitions: int = JOIN_PARTITIONS
                                  ) -> "ray.data.Dataset":
    """TPC-H-Q12-flavored conditional aggregation: per line status, how
    many lineitems belong to high-priority (1-URGENT / 2-HIGH) orders
    vs everything else. Lineitem pre-aggregates (orderkey, linestatus)
    COUNT partials inside map_batches (count is distributive — partials
    need no reduce before the join), one large×large hash join carries
    the tiny count column, then per-batch CASE-WHEN partials fold into
    a 2-row final groupby. All-integer, so the SQL twin's
    SUM(CASE WHEN ...) hashes exactly."""
    from ray.data.aggregate import Sum

    def li_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_orderkey", "l_linestatus"])
        return (t.group_by(["l_orderkey", "l_linestatus"])
                 .aggregate([([], "count_all")])
                 .rename_columns(["l_orderkey", "l_linestatus", "cnt"]))

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(
        orders_ds, li, on="o_orderkey", right_on="l_orderkey",
        num_partitions=num_partitions,
        left_schema=[("o_orderkey", pa.int64()),
                     ("o_orderpriority", pa.string())],
        right_schema=[("l_orderkey", pa.int64()),
                      ("l_linestatus", pa.string()),
                      ("cnt", pa.int64())])

    def case_partial(batch: pa.Table) -> pa.Table:
        hi = pc.is_in(batch["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        him = hi.to_numpy(zero_copy_only=False)
        t = pa.table({
            "l_linestatus": batch["l_linestatus"],
            "hi": pa.array(np.where(him, cnt, 0), pa.int64()),
            "lo": pa.array(np.where(him, 0, cnt), pa.int64()),
        })
        return (t.group_by(["l_linestatus"])
                 .aggregate([("hi", "sum"), ("lo", "sum")])
                 .rename_columns(["l_linestatus", "hi", "lo"]))

    agg = (joined.map_batches(case_partial, batch_format="pyarrow")
                 .groupby("l_linestatus")
                 .aggregate(Sum("hi", alias_name="high_line_count"),
                            Sum("lo", alias_name="low_line_count")))
    return agg.map_batches(
        lambda b: pa.table({
            "l_linestatus": b["l_linestatus"],
            "high_line_count": pc.cast(b["high_line_count"], pa.int64()),
            "low_line_count": pc.cast(b["low_line_count"], pa.int64()),
        }), batch_format="pyarrow")


def longest_run_by_group(ds, group_column: str = "user_id",
                         order_columns: tuple[str, str] = ("ts", "event_id"),
                         value_column: str = "event_type"
                         ) -> "ray.data.Dataset":
    """Run-length profile per group: number of maximal same-value runs
    and the longest run length in each group's (ts, id)-ordered stream —
    the "is this user stuck in a retry loop / is this doc a repeated
    template" signal (the grouped cousin of ``repetition_stats``).

    One shuffle co-locates each group; the per-group sweep is a
    vectorized run-length encode (lexsort + shifted inequality +
    ``np.flatnonzero`` / ``np.diff``), no Python loop over events.
    Null keys/values are dropped up front; runs are over the surviving
    sequence, matching the SQL twin's LAG over the filtered stream.
    Output is int64 — hash-exact against the gaps-and-islands twin."""
    ts_col, id_col = order_columns

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[value_column])
        for c in (group_column, ts_col, id_col):
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        return batch.filter(keep).select(
            [id_col, group_column, ts_col, value_column])

    def sweep(group: pa.Table) -> pa.Table:
        ts = group[ts_col].to_numpy(zero_copy_only=False)
        eid = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        v = group[value_column].to_numpy(zero_copy_only=False)[order]
        brk = np.empty(len(v), dtype=bool)
        brk[0] = True
        brk[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(brk)
        run_lens = np.diff(np.append(starts, len(v)))
        return pa.table({
            group_column: group[group_column][:1],
            "n_runs": pa.array([len(starts)], pa.int64()),
            "max_run": pa.array([int(run_lens.max())], pa.int64()),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby(group_column)
              .map_groups(sweep, batch_format="pyarrow"))


def rolling_active_users(ds, window_days: int = 7,
                         ts_column: str = "ts",
                         user_column: str = "user_id"
                         ) -> "ray.data.Dataset":
    """Trailing-window active users (the WAU/MAU curve): for every day
    that has at least one event, the count of DISTINCT users active in
    the ``window_days``-day window ending that day.

    A windowed COUNT(DISTINCT) doesn't decompose into partials, so the
    classic trick: collapse events to distinct (day, user) pairs per
    batch (day-cardinality-bounded, not event-bounded), EXPAND each
    pair to the ``window_days`` window days it contributes to (a
    bounded ×W fan-out of the tiny pair stream — W=7 here, never the
    raw events), then one groupby(window_day) counts unique users
    vectorized. A pair expanded with offset 0 marks its window day as a
    real event day; windows whose day saw no events are dropped in the
    same group sweep (no driver-side day list, no second pass).
    Day = floor(epoch_us / 86_400_000_000) as int64, matching the SQL
    twin's integer division."""
    US_PER_DAY = 86_400_000_000

    def expand(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch[ts_column]),
                                     pc.is_valid(batch[user_column])))
        day = (pc.cast(batch[ts_column], pa.int64()).to_numpy(
            zero_copy_only=False) // US_PER_DAY)
        user = batch[user_column].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([day, user], axis=1), axis=0)
        if len(pairs) == 0:
            return pa.table({"wday": pa.array([], pa.int64()),
                             "user": pa.array([], pa.int64()),
                             "is_event_day": pa.array([], pa.bool_())})
        offs = np.arange(window_days, dtype=np.int64)
        wday = (pairs[:, 0][:, None] + offs[None, :]).ravel()
        user = np.repeat(pairs[:, 1], window_days)
        is_event_day = np.tile(offs == 0, len(pairs))
        t = pa.table({"wday": pa.array(wday, pa.int64()),
                      "user": pa.array(user, pa.int64()),
                      "is_event_day": pa.array(is_event_day)})
        # local distinct: different days' windows overlap, so the same
        # (wday, user) appears up to W times — fold before the exchange
        return (t.group_by(["wday", "user"])
                 .aggregate([("is_event_day", "max")])
                 .rename_columns(["wday", "user", "is_event_day"]))

    def count_window(group: pa.Table) -> pa.Table:
        if not pc.any(group["is_event_day"]).as_py():
            return pa.table({"day": pa.array([], pa.int64()),
                             "active_users": pa.array([], pa.int64())})
        n = len(pc.unique(group["user"]))
        return pa.table({"day": group["wday"][:1],
                         "active_users": pa.array([n], pa.int64())})

    return (ds.map_batches(expand, batch_format="pyarrow")
              .groupby("wday")
              .map_groups(count_window, batch_format="pyarrow"))


def funnel_steps(ds, steps: tuple[str, ...] = ("signup", "view",
                                               "purchase")) -> pa.Table:
    """Multi-step sequential funnel: how many users reach each stage,
    where stage k requires an event of type ``steps[k]`` STRICTLY after
    the user's first-qualifying event of stage k-1 (the classic
    first-touch funnel — repeat purchases before the first view don't
    count). Generalizes ``funnel_conversion`` (one edge, per-event) to
    the N-stage per-user rollup.

    One shuffle co-locates each user's step-typed events (non-step
    types are dropped at the scan side); the per-group sweep walks the
    ≤len(steps) stages over numpy masks. Per-user output is ONE int
    (deepest stage reached), folded through per-batch count partials
    into a len(steps)-row cumulative table — the driver never sees
    per-user rows, only the ≤(len(steps)+1)-row reached histogram."""
    from ray.data.aggregate import Sum

    step_list = list(steps)

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_in(batch["event_type"],
                                value_set=pa.array(step_list)),
                       pc.and_(pc.is_valid(batch["user_id"]),
                               pc.is_valid(batch["ts"])))
        return pa.table({"user_id": batch["user_id"],
                         "ts": pc.cast(batch["ts"], pa.int64()),
                         "event_type": batch["event_type"]}).filter(keep)

    def per_user(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy(zero_copy_only=False)
        et = group["event_type"].to_numpy(zero_copy_only=False)
        t = np.iinfo(np.int64).min
        reached = 0
        for step in step_list:
            m = (et == step) & (ts > t)
            if not m.any():
                break
            t = ts[m].min()
            reached += 1
        return pa.table({"reached": pa.array([reached], pa.int64()),
                         "n": pa.array([1], pa.int64())})

    def fold_partial(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["reached"]).aggregate([("n", "sum")])
                     .rename_columns(["reached", "n"]))

    hist = (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(per_user, batch_format="pyarrow")
              .map_batches(fold_partial, batch_format="pyarrow")
              .groupby("reached").aggregate(Sum("n", alias_name="n")))
    t = pa.concat_tables(list(hist.iter_batches(batch_format="pyarrow")),
                         promote_options="default")
    reached = t["reached"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_users = [int(n[reached >= k].sum()) for k in range(1, len(step_list) + 1)]
    return pa.table({
        "stage_idx": pa.array(range(1, len(step_list) + 1), pa.int64()),
        "stage": pa.array(step_list, pa.string()),
        "n_users": pa.array(n_users, pa.int64()),
    })


def event_type_cooccurrence(ds, ts_column: str = "ts",
                            user_column: str = "user_id",
                            value_column: str = "event_type"
                            ) -> "ray.data.Dataset":
    """Basket-style co-occurrence mining: for every unordered pair of
    event types, in how many (user, day) baskets do both occur — the
    association-rule support table ("users who error also purchase,
    same day") behind next-action and anomaly features.

    Per-batch distinct (user, day, type) triples bound the exchange by
    baskets × types, not events; one (user, day) groupby emits each
    basket's C(k,2) pairs (k ≤ #event types — single digits); per-batch
    pair-count partials collapse into a ~|types|²-row final groupby.
    Day = floor(epoch_us / 86_400_000_000), matching the twin."""
    from ray.data.aggregate import Sum
    US_PER_DAY = 86_400_000_000

    def triples(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch[value_column]),
                       pc.and_(pc.is_valid(batch[user_column]),
                               pc.is_valid(batch[ts_column])))
        batch = batch.filter(keep)
        day = pc.divide(pc.cast(batch[ts_column], pa.int64()),
                        pa.scalar(US_PER_DAY, pa.int64()))
        t = pa.table({"user": batch[user_column], "day": day,
                      "etype": batch[value_column]})
        return (t.group_by(["user", "day", "etype"]).aggregate([])
                 .rename_columns(["user", "day", "etype"]))

    def emit_pairs(group: pa.Table) -> pa.Table:
        types = sorted(set(group["etype"].to_pylist()))
        a = [types[i] for i in range(len(types))
             for _ in range(len(types) - i - 1)]
        b = [types[j] for i in range(len(types))
             for j in range(i + 1, len(types))]
        return pa.table({"type_a": pa.array(a, pa.string()),
                         "type_b": pa.array(b, pa.string())})

    def count_partial(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["type_a", "type_b"])
                     .aggregate([([], "count_all")])
                     .rename_columns(["type_a", "type_b", "n"]))

    agg = (ds.map_batches(triples, batch_format="pyarrow")
             .groupby(["user", "day"])
             .map_groups(emit_pairs, batch_format="pyarrow")
             .map_batches(count_partial, batch_format="pyarrow")
             .groupby(["type_a", "type_b"])
             .aggregate(Sum("n", alias_name="support")))
    return agg.map_batches(
        lambda b: pa.table({"type_a": b["type_a"], "type_b": b["type_b"],
                            "support": pc.cast(b["support"], pa.int64())}),
        batch_format="pyarrow")


def revenue_by_brand(lineitem_ds, part_ds,
                     num_partitions: int = JOIN_PARTITIONS
                     ) -> "ray.data.Dataset":
    """Discounted revenue per part brand — the lineitem×part join
    family (every other join query here keys on orderkey/custkey;
    partkey exercises the third fact-to-dimension edge). Integer cents
    (floor(price·(1−disc)·100 + 0.5), the repo-wide recipe) partial-
    summed per partkey inside map_batches BEFORE the hash join, so the
    exchange carries one row per (batch, partkey); the brand rollup is
    a tiny 25-row final groupby."""
    from ray.data.aggregate import Sum

    def li_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.multiply(batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"])),
            100.0), 0.5)), pa.int64())
        t = pa.table({"l_partkey": batch["l_partkey"], "cents": cents,
                      "one": pa.array(np.ones(len(batch), np.int64))})
        return (t.group_by(["l_partkey"])
                 .aggregate([("cents", "sum"), ("one", "sum")])
                 .rename_columns(["l_partkey", "cents", "n_lines"]))

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(
        li, part_ds, on="l_partkey", right_on="p_partkey",
        num_partitions=num_partitions,
        left_schema=[("l_partkey", pa.int64()),
                     ("cents", pa.int64()),
                     ("n_lines", pa.int64())],
        right_schema=[("p_partkey", pa.int64()),
                      ("p_brand", pa.string())])

    def brand_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["p_brand", "cents", "n_lines"])
        return (t.group_by(["p_brand"])
                 .aggregate([("cents", "sum"), ("n_lines", "sum")])
                 .rename_columns(["p_brand", "cents", "n_lines"]))

    agg = (joined.map_batches(brand_partial, batch_format="pyarrow")
                 .groupby("p_brand")
                 .aggregate(Sum("cents", alias_name="revenue_cents"),
                            Sum("n_lines", alias_name="n_lines")))
    return agg.map_batches(
        lambda b: pa.table({
            "p_brand": b["p_brand"],
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
            "n_lines": pc.cast(b["n_lines"], pa.int64()),
        }), batch_format="pyarrow")


def supplier_revenue(lineitem_ds, supplier_table: pa.Table,
                     nation_table: pa.Table) -> "ray.data.Dataset":
    """Discounted revenue per supplier with nation enrichment — the
    TPC-H-Q15 revenue view over the one fact edge no other query here
    exercises (l_suppkey), with BOTH dimensions (supplier, nation)
    attached broadcast-side instead of shuffled: the suppkey →
    (name, nation) map is built driver-side from the two dimension
    tables (supplier is dimension-small even at warehouse scale;
    nation is 25 rows), shipped ONCE via ``ray.put``, and applied
    vectorized after the per-suppkey cents groupby — so the only
    exchange is supplier-cardinality-bounded partial sums, never a
    fact-side join shuffle. Integer cents, exact twin."""
    import ray
    from ray.data.aggregate import Sum

    nations = dict(zip(nation_table["n_nationkey"].to_pylist(),
                       nation_table["n_name"].to_pylist()))
    supp = {k: (nm, nations.get(nk)) for k, nm, nk in zip(
        supplier_table["s_suppkey"].to_pylist(),
        supplier_table["s_name"].to_pylist(),
        supplier_table["s_nationkey"].to_pylist())}
    supp_ref = ray.put(supp)

    def li_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.multiply(batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"])),
            100.0), 0.5)), pa.int64())
        t = pa.table({"l_suppkey": batch["l_suppkey"], "cents": cents,
                      "one": pa.array(np.ones(len(batch), np.int64))})
        return (t.group_by(["l_suppkey"])
                 .aggregate([("cents", "sum"), ("one", "sum")])
                 .rename_columns(["l_suppkey", "cents", "n_lines"]))

    agg = (lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
                      .groupby("l_suppkey")
                      .aggregate(Sum("cents", alias_name="revenue_cents"),
                                 Sum("n_lines", alias_name="n_lines")))

    def enrich(batch: pa.Table) -> pa.Table:
        s = ray.get(supp_ref)
        keys = batch["l_suppkey"].to_pylist()
        names = [s[k][0] if k in s else None for k in keys]
        nats = [s[k][1] if k in s else None for k in keys]
        keep = pa.array([k in s for k in keys])
        return pa.table({
            "s_suppkey": batch["l_suppkey"],
            "s_name": pa.array(names, pa.string()),
            "n_name": pa.array(nats, pa.string()),
            "revenue_cents": pc.cast(batch["revenue_cents"], pa.int64()),
            "n_lines": pc.cast(batch["n_lines"], pa.int64()),
        }).filter(keep)

    return agg.map_batches(enrich, batch_format="pyarrow")


def daily_event_deltas(ds) -> pa.Table:
    """Day-over-day change per event type: the dense gap-filled
    (day × type) grid of ``resample_daily_counts`` with each cell's
    delta vs the previous day — the trend/alerting view (a zero-filled
    gap day shows as a real drop, which is exactly what an alert
    should see). The distributed work is the same single pre-combined
    count exchange; the delta is a vectorized driver-side shift on the
    days × types grid (bounded, never row-scaled). First day per type
    has a NULL delta, matching the SQL twin's LAG."""
    grid = resample_daily_counts(ds)
    if grid.num_rows == 0:
        return grid.append_column("delta", pa.array([], pa.int64()))
    t = grid.to_pandas().sort_values(["event_type", "day"])
    n = t.n_events.to_numpy(dtype=np.int64)
    delta = n.astype(np.float64) - np.roll(n, 1)
    first = ~(t.event_type.to_numpy() == np.roll(t.event_type.to_numpy(), 1))
    delta_arr = pa.array(
        [None if f else int(d) for d, f in zip(delta, first)], pa.int64())
    return pa.table({
        "day": pa.array(t.day).cast(pa.timestamp("us")),
        "event_type": pa.array(t.event_type, pa.string()),
        "n_events": pa.array(n, pa.int64()),
        "delta": delta_arr,
    })


def hourly_top_event(ds) -> "ray.data.Dataset":
    """Windowed argmax: for every hour bucket, the most frequent event
    type (ties broken by lexicographically smallest type — the
    deterministic ROW_NUMBER rule, same policy as ``argmin_by_group``).
    Per-batch (hour, type) count partials bound the exchange by
    hours × types; one groupby(hour) folds partials and takes the
    argmax vectorized inside the group sweep."""
    _HOUR = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["ts"]),
                                     pc.is_valid(batch["event_type"])))
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"hour": pa.array(ts // _HOUR, pa.int64()),
                      "etype": batch["event_type"]})
        return (t.group_by(["hour", "etype"])
                 .aggregate([([], "count_all")])
                 .rename_columns(["hour", "etype", "n"]))

    def argmax(group: pa.Table) -> pa.Table:
        folded = (group.select(["etype", "n"]).group_by(["etype"])
                       .aggregate([("n", "sum")])
                       .rename_columns(["etype", "n"]))
        et = folded["etype"].to_numpy(zero_copy_only=False)
        n = folded["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((et, -n))  # max count, then smallest type
        i = order[0]
        return pa.table({
            "hour": group["hour"][:1],
            "top_type": pa.array([et[i]], pa.string()),
            "n": pa.array([int(n[i])], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("hour")
              .map_groups(argmax, batch_format="pyarrow"))


def conversion_latency_quantiles(ds, from_type: str = "signup",
                                 to_type: str = "purchase") -> pa.Table:
    """Time-to-convert distribution: for every user who fires
    ``to_type`` strictly after their first ``from_type``, the latency
    (first qualifying pair, in WHOLE SECONDS), rolled up to count /
    median / p90 — the product-funnel health metric.

    Composition of the ``funnel_steps`` per-user sweep (one user-keyed
    exchange; emits ONE int row per converted user) with the exact
    value-count quantile fold of ``grouped_quantiles`` (the driver
    cumsum is bounded by DISTINCT latency values — the floor-to-seconds
    bin is what keeps that corpus-safe, mirroring the twin's integer
    division by 1_000_000). ``quantile_disc`` rank ceil(q·n)−1."""
    from ray.data.aggregate import Sum

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_in(batch["event_type"],
                                value_set=pa.array([from_type, to_type])),
                       pc.and_(pc.is_valid(batch["user_id"]),
                               pc.is_valid(batch["ts"])))
        return pa.table({"user_id": batch["user_id"],
                         "ts": pc.cast(batch["ts"], pa.int64()),
                         "event_type": batch["event_type"]}).filter(keep)

    def latency(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy(zero_copy_only=False)
        et = group["event_type"].to_numpy(zero_copy_only=False)
        src = ts[et == from_type]
        if len(src) == 0:
            return pa.table({"lat_s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        t0 = src.min()
        dst = ts[(et == to_type) & (ts > t0)]
        if len(dst) == 0:
            return pa.table({"lat_s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "lat_s": pa.array([int((dst.min() - t0) // 1_000_000)],
                              pa.int64()),
            "n": pa.array([1], pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["lat_s"]).aggregate([("n", "sum")])
                     .rename_columns(["lat_s", "n"]))

    counts = (ds.map_batches(prefilter, batch_format="pyarrow")
                .groupby("user_id")
                .map_groups(latency, batch_format="pyarrow")
                .map_batches(fold, batch_format="pyarrow")
                .groupby("lat_s").aggregate(Sum("n", alias_name="n"))
                .take_all())  # bounded by distinct whole-second latencies
    if not counts:
        return pa.table({"n_converted": pa.array([0], pa.int64()),
                         "p50_s": pa.array([None], pa.int64()),
                         "p90_s": pa.array([None], pa.int64())})
    by_val = {c["lat_s"]: c["n"] for c in counts}
    vals = np.asarray(sorted(by_val), np.int64)
    ns = np.asarray([by_val[v] for v in vals], np.int64)
    cum = np.cumsum(ns)
    total = int(cum[-1])
    out = {"n_converted": total}
    for q, name in ((0.5, "p50_s"), (0.9, "p90_s")):
        rank = int(np.ceil(q * total)) - 1  # quantile_disc rule
        out[name] = int(vals[np.searchsorted(cum, rank + 1)])
    return pa.table({
        "n_converted": pa.array([out["n_converted"]], pa.int64()),
        "p50_s": pa.array([out["p50_s"]], pa.int64()),
        "p90_s": pa.array([out["p90_s"]], pa.int64()),
    })


def event_pair_lift(ds) -> pa.Table:
    """Association lift for same-day event-type pairs:
    ``lift = support(a,b) · n_baskets / (count(a) · count(b))`` over
    (user, day) baskets — the market-basket association score (>1 =
    the types attract, <1 = they repel).

    Single-exchange extension of ``event_type_cooccurrence``: the same
    basket groupby emits pair rows, per-type singleton rows AND one
    total-basket marker per basket (sentinel types — the final table
    is |types|²-bounded so the lift fold is driver-side). The lift
    division converts both BIGINT products to float64 identically on
    both sides (exact < 2^53)."""
    from ray.data.aggregate import Sum
    US_PER_DAY = 86_400_000_000

    def triples(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["event_type"]),
                       pc.and_(pc.is_valid(batch["user_id"]),
                               pc.is_valid(batch["ts"])))
        batch = batch.filter(keep)
        day = pc.divide(pc.cast(batch["ts"], pa.int64()),
                        pa.scalar(US_PER_DAY, pa.int64()))
        t = pa.table({"user": batch["user_id"], "day": day,
                      "etype": batch["event_type"]})
        return (t.group_by(["user", "day", "etype"]).aggregate([])
                 .rename_columns(["user", "day", "etype"]))

    def emit(group: pa.Table) -> pa.Table:
        types = sorted(set(group["etype"].to_pylist()))
        a = [types[i] for i in range(len(types))
             for _ in range(len(types) - i - 1)]
        b = [types[j] for i in range(len(types))
             for j in range(i + 1, len(types))]
        a.extend(types)          # singleton markers: (type, "")
        b.extend([""] * len(types))
        a.append("")             # basket marker: ("", "")
        b.append("")
        return pa.table({"type_a": pa.array(a, pa.string()),
                         "type_b": pa.array(b, pa.string())})

    def count_partial(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["type_a", "type_b"])
                     .aggregate([([], "count_all")])
                     .rename_columns(["type_a", "type_b", "n"]))

    agg = (ds.map_batches(triples, batch_format="pyarrow")
             .groupby(["user", "day"])
             .map_groups(emit, batch_format="pyarrow")
             .map_batches(count_partial, batch_format="pyarrow")
             .groupby(["type_a", "type_b"])
             .aggregate(Sum("n", alias_name="n"))
             .take_all())  # |types|² + |types| + 1 rows
    n_baskets = 0
    singles: dict[str, int] = {}
    pairs = []
    for r in agg:
        if r["type_a"] == "" and r["type_b"] == "":
            n_baskets = int(r["n"])
        elif r["type_b"] == "":
            singles[r["type_a"]] = int(r["n"])
        else:
            pairs.append((r["type_a"], r["type_b"], int(r["n"])))
    pairs.sort()
    lift = [float(np.float64(s * n_baskets)
                  / np.float64(singles[a] * singles[b]))
            for a, b, s in pairs]
    return pa.table({
        "type_a": pa.array([p[0] for p in pairs], pa.string()),
        "type_b": pa.array([p[1] for p in pairs], pa.string()),
        "support": pa.array([p[2] for p in pairs], pa.int64()),
        "lift": pa.array(lift, pa.float64()),
    })


def orders_by_month(ds) -> "ray.data.Dataset":
    """Monthly order volume and revenue: calendar-month truncation
    (numpy ``datetime64[M]`` — true calendar months, not 30-day bins,
    matching ``date_trunc('month', …)``), integer-cents totals. Per-
    batch (month, count, cents) partials bound the exchange by months
    per batch; the final groupby is months-bounded."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["o_orderdate"]))
        us = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        month = (us.astype("datetime64[us]").astype("datetime64[M]")
                 .astype("datetime64[us]").astype(np.int64))
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            batch["o_totalprice"], 100.0), 0.5)), pa.int64())
        t = pa.table({"month": pa.array(month, pa.int64()),
                      "cents": cents,
                      "one": pa.array(np.ones(len(batch), np.int64))})
        return (t.group_by(["month"])
                 .aggregate([("cents", "sum"), ("one", "sum")])
                 .rename_columns(["month", "cents", "n_orders"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("month")
             .aggregate(Sum("cents", alias_name="revenue_cents"),
                        Sum("n_orders", alias_name="n_orders")))
    return agg.map_batches(
        lambda b: pa.table({
            "month": pc.cast(b["month"], pa.timestamp("us")),
            "n_orders": pc.cast(b["n_orders"], pa.int64()),
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
        }), batch_format="pyarrow")


def customer_rfm(ds) -> "ray.data.Dataset":
    """RFM profile per customer — recency (last order date), frequency
    (order count), monetary (integer-cents lifetime spend) — the
    segmentation input every growth pipeline starts from. Per-batch
    partials (max / count / sum are all distributive) shrink the
    exchange to one row per (batch, customer); one customer-keyed
    groupby merges."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["o_custkey"]))
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            batch["o_totalprice"], 100.0), 0.5)), pa.int64())
        t = pa.table({"o_custkey": batch["o_custkey"],
                      "last_us": pc.cast(batch["o_orderdate"], pa.int64()),
                      "cents": cents,
                      "one": pa.array(np.ones(len(batch), np.int64))})
        return (t.group_by(["o_custkey"])
                 .aggregate([("last_us", "max"), ("cents", "sum"),
                             ("one", "sum")])
                 .rename_columns(["o_custkey", "last_us", "cents", "n"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("o_custkey")
             .aggregate(Max("last_us", alias_name="last_us"),
                        Sum("cents", alias_name="spend_cents"),
                        Sum("n", alias_name="n_orders")))
    return agg.map_batches(
        lambda b: pa.table({
            "o_custkey": b["o_custkey"],
            "last_order": pc.cast(b["last_us"], pa.timestamp("us")),
            "n_orders": pc.cast(b["n_orders"], pa.int64()),
            "spend_cents": pc.cast(b["spend_cents"], pa.int64()),
        }), batch_format="pyarrow")


def null_audit(ds, columns: list[str]) -> pa.Table:
    """Data-quality null audit: total row count plus per-column null
    counts in ONE streaming pass — the schema-health check run before
    admitting a new data drop into the pipeline. Per-batch partials are
    a single row of integers (``pc.sum(pc.is_null(...))`` per column),
    so the reduce is a len(columns)-wide scalar fold; no shuffle of
    data rows ever happens."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"n_rows": pa.array([len(batch)], pa.int64())}
        for c in columns:
            n = pc.sum(pc.cast(pc.is_null(batch[c]), pa.int64())).as_py()
            cols[f"n_null_{c}"] = pa.array([int(n or 0)], pa.int64())
        cols["_k"] = pa.array([0], pa.int64())
        return pa.table(cols)

    aggs = [Sum("n_rows", alias_name="n_rows")]
    aggs += [Sum(f"n_null_{c}", alias_name=f"n_null_{c}")
             for c in columns]
    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("_k").aggregate(*aggs))
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")),
                         promote_options="default")
    return pa.table({name: pc.cast(t[name], pa.int64())
                     for name in ["n_rows"] + [f"n_null_{c}"
                                               for c in columns]})


def events_weekday_profile(ds) -> "ray.data.Dataset":
    """Day-of-week × event-type activity profile (the seasonality
    fingerprint): counts per (weekday, type), weekday in DuckDB's
    Sunday=0 convention — epoch day 0 (1970-01-01) was a Thursday, so
    ``dow = (epoch_days + 4) % 7``. Per-batch partials bound the
    exchange by 7 × |types| rows per batch."""
    from ray.data.aggregate import Sum
    US_PER_DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["ts"]),
                                     pc.is_valid(batch["event_type"])))
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        dow = (ts // US_PER_DAY + 4) % 7
        t = pa.table({"dow": pa.array(dow, pa.int64()),
                      "event_type": batch["event_type"]})
        return (t.group_by(["dow", "event_type"])
                 .aggregate([([], "count_all")])
                 .rename_columns(["dow", "event_type", "n"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["dow", "event_type"])
             .aggregate(Sum("n", alias_name="n")))
    return agg.map_batches(
        lambda b: pa.table({"dow": b["dow"], "event_type": b["event_type"],
                            "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow")


def order_interarrival_quantiles(ds) -> pa.Table:
    """Inter-order gap distribution: whole-day gaps between a
    customer's consecutive orders, rolled up to global count / p50 /
    p90 — the reorder-cadence metric. The gap multiset of a sorted date
    sequence is tie-order-independent (consecutive differences of a
    sorted multiset), so the per-customer numpy sort is exactly the
    twin's LAG window. Whole-day flooring keeps the exact value-count
    quantile fold bounded (same recipe as
    ``conversion_latency_quantiles``)."""
    from ray.data.aggregate import Sum
    US_PER_DAY = 86_400_000_000

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["o_custkey"]),
                       pc.is_valid(batch["o_orderdate"]))
        batch = batch.filter(keep)
        return pa.table({"o_custkey": batch["o_custkey"],
                         "us": pc.cast(batch["o_orderdate"], pa.int64())})

    def gaps(group: pa.Table) -> pa.Table:
        us = np.sort(group["us"].to_numpy(zero_copy_only=False))
        if len(us) < 2:
            return pa.table({"gap_d": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = np.diff(us) // US_PER_DAY
        t = pa.table({"gap_d": pa.array(g, pa.int64()),
                      "n": pa.array(np.ones(len(g), np.int64))})
        return (t.group_by(["gap_d"]).aggregate([("n", "sum")])
                 .rename_columns(["gap_d", "n"]))

    counts = (ds.map_batches(prefilter, batch_format="pyarrow")
                .groupby("o_custkey")
                .map_groups(gaps, batch_format="pyarrow")
                .groupby("gap_d").aggregate(Sum("n", alias_name="n"))
                .take_all())  # bounded by distinct whole-day gaps
    if not counts:
        return pa.table({"n_gaps": pa.array([0], pa.int64()),
                         "p50_d": pa.array([None], pa.int64()),
                         "p90_d": pa.array([None], pa.int64())})
    by_val = {c["gap_d"]: c["n"] for c in counts}
    vals = np.asarray(sorted(by_val), np.int64)
    cum = np.cumsum(np.asarray([by_val[v] for v in vals], np.int64))
    total = int(cum[-1])
    out = {}
    for q, name in ((0.5, "p50_d"), (0.9, "p90_d")):
        rank = int(np.ceil(q * total)) - 1
        out[name] = int(vals[np.searchsorted(cum, rank + 1)])
    return pa.table({"n_gaps": pa.array([total], pa.int64()),
                     "p50_d": pa.array([out["p50_d"]], pa.int64()),
                     "p90_d": pa.array([out["p90_d"]], pa.int64())})


def customers_by_region(customer_ds, nation_table: pa.Table,
                        region_table: pa.Table) -> "ray.data.Dataset":
    """Customer counts per (region, nation) — the snowflake
    dimension-hop rollup with BOTH hops broadcast: nation→region name
    maps are built driver-side (25 / 5 rows), shipped once via
    ``ray.put``, and the fact side only exchanges per-batch
    (nationkey, count) partials — 25-row final groupby, never a
    dimension shuffle."""
    import ray
    from ray.data.aggregate import Sum

    regions = dict(zip(region_table["r_regionkey"].to_pylist(),
                       region_table["r_name"].to_pylist()))
    nations = {k: (nm, regions.get(rk)) for k, nm, rk in zip(
        nation_table["n_nationkey"].to_pylist(),
        nation_table["n_name"].to_pylist(),
        nation_table["n_regionkey"].to_pylist())}
    dims_ref = ray.put(nations)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["c_nationkey"]))
        t = pa.table({"nk": batch["c_nationkey"],
                      "one": pa.array(np.ones(len(batch), np.int64))})
        return (t.group_by(["nk"]).aggregate([("one", "sum")])
                 .rename_columns(["nk", "n"]))

    agg = (customer_ds.map_batches(partial, batch_format="pyarrow")
                      .groupby("nk")
                      .aggregate(Sum("n", alias_name="n_customers")))

    def enrich(batch: pa.Table) -> pa.Table:
        d = ray.get(dims_ref)
        keys = batch["nk"].to_pylist()
        keep = pa.array([k in d for k in keys])
        return pa.table({
            "r_name": pa.array([d[k][1] if k in d else None
                                for k in keys], pa.string()),
            "n_name": pa.array([d[k][0] if k in d else None
                                for k in keys], pa.string()),
            "n_customers": pc.cast(batch["n_customers"], pa.int64()),
        }).filter(keep)

    return agg.map_batches(enrich, batch_format="pyarrow")


def user_activity_gini(ds, user_column: str = "user_id") -> pa.Table:
    """Gini coefficient of per-user event counts — the inequality
    index that tells you whether a corpus is a few power users or a
    broad base (bot-farm detection, sampling-bias checks).

    Computed WITHOUT a global sort: (1) per-user counts (one user-keyed
    exchange of count partials), (2) a value-count histogram of those
    counts (one exchange bounded by DISTINCT activity levels — far
    smaller than users), (3) a driver fold over the histogram using the
    run-of-ties closed form: a value v with multiplicity c occupying
    ranks (p+1)..(p+c) contributes v·(c·p + c(c+1)/2) to Σ i·xᵢ, which
    is independent of tie order — exactly the twin's ROW_NUMBER sum.
    All integers until the final mirrored float64 expression
    ``(2·S)/(n·T) − (n+1)/n``."""
    from ray.data.aggregate import Sum

    def per_user_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[user_column]))
        t = pa.table({"u": batch[user_column],
                      "n": pa.array(np.ones(len(batch), np.int64))})
        return (t.group_by(["u"]).aggregate([("n", "sum")])
                 .rename_columns(["u", "n"]))

    user_counts = (ds.map_batches(per_user_partial, batch_format="pyarrow")
                     .groupby("u").aggregate(Sum("n", alias_name="n")))

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"v": pc.cast(batch["n"], pa.int64()),
                      "c": pa.array(np.ones(len(batch), np.int64))})
        return (t.group_by(["v"]).aggregate([("c", "sum")])
                 .rename_columns(["v", "c"]))

    hist = (user_counts.map_batches(hist_partial, batch_format="pyarrow")
                       .groupby("v").aggregate(Sum("c", alias_name="c"))
                       .take_all())  # bounded by distinct activity levels
    if not hist:
        return pa.table({"n_users": pa.array([0], pa.int64()),
                         "n_events": pa.array([0], pa.int64()),
                         "rank_weighted_sum": pa.array([0], pa.int64()),
                         "gini": pa.array([None], pa.float64())})
    by_v = {h["v"]: h["c"] for h in hist}
    vals = np.asarray(sorted(by_v), np.int64)
    cnts = np.asarray([by_v[v] for v in vals], np.int64)
    prev = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    s = int((vals * (cnts * prev + cnts * (cnts + 1) // 2)).sum())
    nu = int(cnts.sum())
    total = int((vals * cnts).sum())
    gini = (2.0 * np.float64(s)) / np.float64(nu * total) \
        - (np.float64(nu) + 1.0) / np.float64(nu)
    return pa.table({
        "n_users": pa.array([nu], pa.int64()),
        "n_events": pa.array([total], pa.int64()),
        "rank_weighted_sum": pa.array([s], pa.int64()),
        "gini": pa.array([float(gini)], pa.float64()),
    })


def top_customer_per_nation(orders_ds, customer_ds,
                            nation_table: pa.Table,
                            num_partitions: int = JOIN_PARTITIONS
                            ) -> "ray.data.Dataset":
    """Biggest-spending customer per nation — the pipeline-composition
    op: integer-cents spend partials per custkey (orders-side
    pre-aggregate), one large×large hash join to customer for the
    nation key, per-batch argmax partials (one candidate row per
    (batch, nation) survives), a 25-group argmax merge with the
    deterministic smallest-custkey tie-break, and the nation name
    attached from a broadcast 25-row dimension. The ROW_NUMBER twin
    uses the same (cents DESC, custkey ASC) order."""
    import ray
    from ray.data.aggregate import Sum

    nations = dict(zip(nation_table["n_nationkey"].to_pylist(),
                       nation_table["n_name"].to_pylist()))
    n_ref = ray.put(nations)

    def spend_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["o_custkey"]))
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            batch["o_totalprice"], 100.0), 0.5)), pa.int64())
        t = pa.table({"o_custkey": batch["o_custkey"], "cents": cents})
        return (t.group_by(["o_custkey"]).aggregate([("cents", "sum")])
                 .rename_columns(["o_custkey", "cents"]))

    spend = (orders_ds.map_batches(spend_partial, batch_format="pyarrow")
                      .groupby("o_custkey")
                      .aggregate(Sum("cents", alias_name="cents")))
    joined = hash_join(
        customer_ds, spend, on="c_custkey", right_on="o_custkey",
        num_partitions=num_partitions,
        left_schema=[("c_custkey", pa.int64()),
                     ("c_nationkey", pa.int64())],
        right_schema=[("o_custkey", pa.int64()),
                      ("cents", pa.int64())])

    def argmax_partial(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        cents = pc.cast(batch["cents"], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ck, -cents, nk))  # per nation: best first
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = nk[order][1:] != nk[order][:-1]
        keep = order[first]
        return pa.table({"c_nationkey": pa.array(nk[keep], pa.int64()),
                         "c_custkey": pa.array(ck[keep], pa.int64()),
                         "cents": pa.array(cents[keep], pa.int64())})

    def argmax_merge(group: pa.Table) -> pa.Table:
        ck = group["c_custkey"].to_numpy(zero_copy_only=False)
        cents = group["cents"].to_numpy(zero_copy_only=False)
        i = np.lexsort((ck, -cents))[0]
        n = ray.get(n_ref)
        nk = group["c_nationkey"][0].as_py()
        return pa.table({
            "n_name": pa.array([n.get(nk)], pa.string()),
            "top_custkey": pa.array([int(ck[i])], pa.int64()),
            "spend_cents": pa.array([int(cents[i])], pa.int64()),
        })

    return (joined.map_batches(argmax_partial, batch_format="pyarrow")
                  .groupby("c_nationkey")
                  .map_groups(argmax_merge, batch_format="pyarrow"))
