"""Relational operator coverage over the TPC-H-ish testdata: filter,
projection, join, grouped aggregation, sort, limit, windowed aggregates.

These exercise the engine's general dataflow operators (the
reference's SURVEY.md §2.3/§2.6 inventory generalized) and are the
DuckDB-oracle-checked half of the correctness gate.

Determinism discipline: money columns have 2 decimals, so every money
aggregate is computed in **integer cents** (``round(x*100)`` per
element, int64 sums) in BOTH engines — float sum order then cannot
produce hash mismatches.  Ratios (averages) divide two exactly-equal
numbers, giving bit-identical doubles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str]):
    from ..context import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    x = arr.to_numpy(zero_copy_only=False)
    return np.rint(x * 100.0).astype(np.int64)


# Row-count guard for driver-side lookup broadcasts (orderkey->custkey
# is 16 B/row: ~160 MB at the limit, same budget as
# context.BROADCAST_VERTEX_LIMIT).
BROADCAST_ROW_LIMIT = 10_000_000


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary: filter on ship date, group by
    (returnflag, linestatus), multi-aggregate.  Map-side partial
    aggregation inside ``map_batches`` before the tiny global groupby
    (SURVEY.md §4: pre-aggregate before shuffling)."""
    from ray.data.aggregate import Sum

    import datetime as _dt

    cutoff = pa.scalar(_dt.datetime(1998, 9, 2), type=pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "sum_qty": pa.array([], pa.int64()),
                    "sum_base_price_cents": pa.array([], pa.int64()),
                    "sum_disc_price_c4": pa.array([], pa.int64()),
                    "count_order": pa.array([], pa.int64()),
                }
            )
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = _cents(batch["l_extendedprice"])
        disc_c = _cents(batch["l_discount"])
        disc_price_c4 = price_c * (100 - disc_c)  # exact int64, 1e-4 units
        df = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(qty, pa.int64()),
                "price_c": pa.array(price_c, pa.int64()),
                "disc_c4": pa.array(disc_price_c4, pa.int64()),
            }
        )
        g = df.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_c", "sum"), ("disc_c4", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price_cents",
             "sum_disc_price_c4", "count_order"]
        )

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
        Sum("sum_disc_price_c4", alias_name="sum_disc_price_c4"),
        Sum("count_order", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        avg_qty = (
            batch["sum_qty"].to_numpy(zero_copy_only=False)
            / batch["count_order"].to_numpy(zero_copy_only=False)
        )
        return batch.append_column("avg_qty", pa.array(avg_qty, pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS sum_disc_price_c4,
       count(*) AS count_order,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def top_customers_by_revenue(sf_dir: str, k: int = 10,
                             broadcast_limit: int | None = None):
    """customer ⨝ orders ⨝ lineitem revenue ranking: two-stage
    aggregation, final sort + limit on the tiny aggregate.

    The orderkey->custkey lookup dispatches on the orders row count
    (cheap parquet-metadata ``count()``), the same guard discipline as
    ``build_link_graph``:

    - ``<= broadcast_limit`` (default ``BROADCAST_ROW_LIMIT``): ship
      the lookup once via ``ray.put`` and resolve per batch (no shuffle
      at all — orders is the 10x-smaller side, so this is the default
      path at bench scale);
    - above it: pre-aggregate lineitem revenue per orderkey (map-side
      combine, then a compact groupby), attach ``o_custkey`` with the
      distributed ``cogroup_attach`` equi-join, and re-aggregate per
      custkey — nothing is ever materialized on the driver.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..context import derive_num_groups
    from ..stages.dedup import cogroup_attach

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(batch: pa.Table, key: str) -> pa.Table:
        lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        price_c = _cents(batch["l_extendedprice"])
        disc_c = _cents(batch["l_discount"])
        rev_c4 = price_c * (100 - disc_c)
        t = pa.table({key: pa.array(lok, pa.int64()),
                      "rev": pa.array(rev_c4, pa.int64())})
        return t.group_by(key).aggregate([("rev", "sum")]).rename_columns(
            [key, "rev"]
        )

    if orders.count() <= limit:
        o = pa.concat_tables(
            list(orders.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"))
        )
        okey = o["o_orderkey"].to_numpy(zero_copy_only=False)
        ckey = o["o_custkey"].to_numpy(zero_copy_only=False)
        order_sorted = np.argsort(okey, kind="stable")
        lookup_ref = ray.put((okey[order_sorted], ckey[order_sorted]))

        def per_batch(batch: pa.Table) -> pa.Table:
            ok, ck = ray.get(lookup_ref)
            part = rev_partial(batch, "l_orderkey")
            lok = part["l_orderkey"].to_numpy(zero_copy_only=False)
            i = np.clip(np.searchsorted(ok, lok), 0, max(len(ok) - 1, 0))
            # raise (not drop) on a lineitem orderkey missing from
            # orders — identical behavior to the distributed path's
            # cogroup_attach, so results never depend on which side of
            # broadcast_limit the input lands
            if len(lok) and (len(ok) == 0
                             or not np.array_equal(ok[i], lok)):
                raise ValueError(
                    "top_customers_by_revenue: lineitem orderkey missing "
                    "from orders"
                )
            t = pa.table({"c_custkey": pa.array(ck[i], pa.int64()),
                          "rev": part["rev"]})
            return t.group_by("c_custkey").aggregate(
                [("rev", "sum")]).rename_columns(["c_custkey", "rev"])

        ds = lineitem.map_batches(per_batch, batch_format="pyarrow")
    else:
        from ..stages.agg import coarse_agg

        per_order = coarse_agg(
            lineitem.map_batches(
                lambda b: rev_partial(b, "l_orderkey"), batch_format="pyarrow"
            ),
            ["l_orderkey"], [("rev", "sum", "rev")],
        )
        schema = pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())])
        joined = cogroup_attach(
            per_order, "l_orderkey", orders, "o_orderkey", "o_custkey",
            "c_custkey", schema, pa.int64(),
            num_groups=derive_num_groups(orders),
        )
        ds = joined.map_batches(
            lambda b: pa.table({"c_custkey": b["c_custkey"],
                                "rev": b["rev"]}),
            batch_format="pyarrow",
        )
    from ..stages.agg import coarse_agg

    agg = coarse_agg(ds, ["c_custkey"], [("rev", "sum", "revenue_c4")])

    # per-partition top-k cut before the global sort: the final sort
    # then ranks <= blocks*k candidate rows instead of every customer
    # (a full sort of the per-customer aggregate is an all-to-all at
    # catalog scale).  Cut under the same (-rev, custkey) total order
    # the sort applies, so ties at the cut keep the lower key.
    def local_topk(t: pa.Table) -> pa.Table:
        rev = t["revenue_c4"].to_numpy(zero_copy_only=False)
        key = t["c_custkey"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((key, -rev))[:k]
        return t.take(pa.array(sel, pa.int64()))

    pruned = agg.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(["revenue_c4", "c_custkey"],
                       descending=[True, False]).limit(k)


TOP_CUSTOMERS_SQL = """
SELECT o_custkey AS c_custkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_c4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY revenue_c4 DESC, c_custkey ASC
LIMIT 10
"""


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = (1998, 6, 15)


def q3_shipping_priority(sf_dir: str, k: int = 10,
                         broadcast_limit: int | None = None):
    """TPC-H Q3-style shipping priority: 3-table join —
    customer(segment) ⨝ orders(orderdate < D) ⨝ lineitem(shipdate > D)
    — grouped per order, top-k by revenue.  Revenue in integer c4
    (cents x (100 - discount cents)) so the total order
    (revenue desc, orderdate, orderkey) is hash-exact vs SQL.

    Join strategy mirrors ``top_customers_by_revenue``'s guard
    discipline, per side:

    - the segment-filtered customer KEY SET and the orderkey ->
      (orderdate, priority) lookup broadcast via ``ray.put`` below
      ``broadcast_limit`` rows (set-membership semi-join + attach
      resolved per lineitem batch — zero shuffles);
    - above it, the same joins run distributed: a co-grouped semi-join
      of orders against customer keys, then per-order lineitem revenue
      (map-side combine + coarse groupby) inner-joined to the filtered
      orders with ``cogroup_attach(on_missing="drop")`` — orders
      without qualifying lineitems (and vice versa) drop exactly as
      the broadcast path drops them.
    """
    import datetime as _dt

    import ray

    from ..context import derive_num_groups
    from ..stages.agg import coarse_agg
    from ..stages.dedup import cogroup_attach

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    cutoff = pa.scalar(_dt.datetime(*Q3_CUTOFF), type=pa.timestamp("us"))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def seg_filter(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["c_mktsegment"], Q3_SEGMENT)
        return pa.table({"c_custkey": b["c_custkey"].filter(keep)})

    seg_keys = cust.map_batches(seg_filter, batch_format="pyarrow")

    def date_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["o_orderdate"], cutoff))

    o_filt = orders.map_batches(date_filter, batch_format="pyarrow")

    def rev_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cutoff))
        lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        rev = _cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"]))
        t = pa.table({"l_orderkey": pa.array(lok, pa.int64()),
                      "rev": pa.array(rev, pa.int64())})
        return t.group_by("l_orderkey").aggregate(
            [("rev", "sum")]).rename_columns(["l_orderkey", "rev"])

    li_partial = lineitem.map_batches(rev_partial, batch_format="pyarrow")

    if orders.count() <= limit and cust.count() <= limit:
        segs = pa.concat_tables(list(
            seg_keys.iter_batches(batch_size=1 << 20,
                                  batch_format="pyarrow")))
        seg_np = np.sort(segs["c_custkey"].to_numpy(zero_copy_only=False))
        o = pa.concat_tables(list(
            o_filt.iter_batches(batch_size=1 << 20,
                                batch_format="pyarrow")))
        ck = o["o_custkey"].to_numpy(zero_copy_only=False)
        if len(seg_np):
            in_seg = np.clip(np.searchsorted(seg_np, ck), 0,
                             len(seg_np) - 1)
            keep = seg_np[in_seg] == ck
        else:
            keep = np.zeros(len(ck), dtype=bool)
        o = o.filter(pa.array(keep))
        ok = o["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        lookup_ref = ray.put((
            ok[order],
            o["o_orderdate"].to_numpy(zero_copy_only=False)[order],
            o.column("o_orderpriority").combine_chunks().take(
                pa.array(order, pa.int64())),
        ))

        def attach(batch: pa.Table) -> pa.Table:
            ok_s, od_s, op_s = ray.get(lookup_ref)
            lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            i = np.clip(np.searchsorted(ok_s, lok), 0,
                        max(len(ok_s) - 1, 0))
            hit = (ok_s[i] == lok if len(ok_s)
                   else np.zeros(len(lok), dtype=bool))
            i = i[hit]
            batch = batch.filter(pa.array(hit))
            return pa.table({
                "l_orderkey": batch["l_orderkey"],
                "rev": batch["rev"],
                "o_orderdate": pa.array(od_s[i], pa.timestamp("us")),
                "o_orderpriority": op_s.take(pa.array(i, pa.int64())),
            })

        joined = li_partial.map_batches(attach, batch_format="pyarrow")
    else:
        G = derive_num_groups(orders)
        o_schema = pa.schema([("o_orderkey", pa.int64()),
                              ("o_custkey", pa.int64()),
                              ("o_orderdate", pa.timestamp("us")),
                              ("o_orderpriority", pa.string())])
        # semi-join orders -> segment customers: attach a marker and
        # drop non-matches (the marker column itself is discarded)
        # materialized: the filtered-orders side feeds BOTH attach
        # joins below — left lazy, the semi-join would run twice
        o_seg = cogroup_attach(
            o_filt, "o_custkey", seg_keys, "c_custkey", "c_custkey",
            "__seg", o_schema, pa.int64(), num_groups=G,
            on_missing="drop",
        ).drop_columns(["__seg", "o_custkey"]).materialize()
        per_order = coarse_agg(li_partial, ["l_orderkey"],
                               [("rev", "sum", "rev")])
        li_schema = pa.schema([("l_orderkey", pa.int64()),
                               ("rev", pa.int64())])
        j1 = cogroup_attach(per_order, "l_orderkey", o_seg, "o_orderkey",
                            "o_orderdate", "o_orderdate", li_schema,
                            pa.timestamp("us"), num_groups=G,
                            on_missing="drop")
        j2 = cogroup_attach(
            j1, "l_orderkey", o_seg, "o_orderkey", "o_orderpriority",
            "o_orderpriority",
            li_schema.append(pa.field("o_orderdate", pa.timestamp("us"))),
            pa.string(), num_groups=G, on_missing="drop")
        joined = j2

    agg = coarse_agg(joined, ["l_orderkey", "o_orderdate",
                              "o_orderpriority"],
                     [("rev", "sum", "revenue_c4")])

    def local_topk(t: pa.Table) -> pa.Table:
        rev = t["revenue_c4"].to_numpy(zero_copy_only=False)
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        sel = np.lexsort((okey, od, -rev))[:k]
        return t.take(pa.array(sel, pa.int64()))

    pruned = agg.map_batches(local_topk, batch_format="pyarrow")
    rows = pruned.sort(["revenue_c4", "o_orderdate", "l_orderkey"],
                       descending=[True, False, False]).limit(k).take_all()
    return pa.table({
        "l_orderkey": pa.array([r["l_orderkey"] for r in rows], pa.int64()),
        "revenue_c4": pa.array([r["revenue_c4"] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r["o_orderdate"] for r in rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r["o_orderpriority"] for r in rows],
                                    pa.string()),
    })


Q3_SQL = f"""
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_c4,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{"%04d-%02d-%02d" % Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{"%04d-%02d-%02d" % Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_c4 DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


Q5_REGION = "ASIA"
Q5_RANGE = ((1996, 1, 1), (1997, 1, 1))  # o_orderdate in [lo, hi)


def q5_local_supplier_volume(sf_dir: str, broadcast_limit: int | None = None):
    """TPC-H Q5-style local supplier volume: the classic 6-table join —
    region(name) ⨝ nation ⨝ supplier ⨝ lineitem ⨝ orders(date range)
    ⨝ customer with the LOCAL constraint ``c_nationkey = s_nationkey``
    — revenue per nation, in integer c4 (hash-exact vs SQL).

    Plan (scale shape):

    - region + nation are FIXED CATALOGS (≤ a few hundred rows by
      construction of the schema) — collected once on the driver and
      folded into the two fact-side lookups; never shuffled;
    - supplier → (s_suppkey, s_nationkey) and customer →
      (c_custkey, c_nationkey), both pre-filtered to the region's
      nations at the scan (the semi-join against the nation catalog
      happens inside the projection batch, so only qualifying keys
      leave the read);
    - below ``broadcast_limit`` rows the three key maps (supplier,
      customer, date-filtered orders) broadcast via ``ray.put`` and
      every lineitem batch resolves supplier-nation, order-customer
      and customer-nation locally — lineitem, the dominant table,
      streams with ZERO shuffles;
    - above it, the same joins run distributed: orders attach
      c_nationkey by ``cogroup_attach(on_missing="drop")``, lineitem
      attaches s_nationkey (suppkey co-group) then c_nationkey
      (orderkey co-group), the local filter ``s_nat == c_nat`` applies
      per partition — both tiers pinned identical by
      ``test_q5_join_fallback_matches_broadcast``;
    - final aggregate is per-nation (≤ catalog size): map-side partial
      sums then one driver-sized reduce.

    Returns ``(n_name, revenue_c4)`` ordered (revenue desc, name).
    """
    import datetime as _dt

    import ray

    from ..context import derive_num_groups
    from ..stages.agg import coarse_agg
    from ..stages.dedup import cogroup_attach

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    lo = pa.scalar(_dt.datetime(*Q5_RANGE[0]), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(*Q5_RANGE[1]), type=pa.timestamp("us"))

    # fixed catalogs -> asian nation key set + names (driver-side by
    # design: the nation table is bounded by the schema, not the data)
    region = pa.concat_tables(list(_read(
        sf_dir, "region", ["r_regionkey", "r_name"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
    nation = pa.concat_tables(list(_read(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    rkeys = region.filter(pc.equal(region["r_name"], Q5_REGION))
    nat = nation.filter(pc.is_in(
        nation["n_regionkey"], value_set=rkeys["r_regionkey"]))
    nat_keys = np.sort(nat["n_nationkey"].to_numpy(zero_copy_only=False))
    name_of = dict(zip(nat["n_nationkey"].to_pylist(),
                       nat["n_name"].to_pylist()))
    nat_ref = ray.put(nat_keys)

    def _nat_member(col) -> pa.Array:
        ks = ray.get(nat_ref)
        v = col.to_numpy(zero_copy_only=False)
        i = np.clip(np.searchsorted(ks, v), 0, max(len(ks) - 1, 0))
        return pa.array(ks[i] == v if len(ks)
                        else np.zeros(len(v), dtype=bool))

    def sup_proj(b: pa.Table) -> pa.Table:
        b = b.filter(_nat_member(b["s_nationkey"]))
        return pa.table({"s_suppkey": b["s_suppkey"],
                         "s_nationkey": b["s_nationkey"]})

    def cust_proj(b: pa.Table) -> pa.Table:
        b = b.filter(_nat_member(b["c_nationkey"]))
        return pa.table({"c_custkey": b["c_custkey"],
                         "c_nationkey": b["c_nationkey"]})

    def ord_proj(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                       pc.less(b["o_orderdate"], hi))
        b = b.filter(keep)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"]})

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(sup_proj, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(cust_proj, batch_format="pyarrow")
    o_filt = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_proj, batch_format="pyarrow")
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])

    def _sorted_map(t: pa.Table, k: str, v: str):
        key = t[k].to_numpy(zero_copy_only=False)
        val = t[v].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        return key[order], val[order]

    def _lookup(keys_s: np.ndarray, vals_s: np.ndarray, q: np.ndarray):
        """(values, hit-mask) for query keys against a sorted map."""
        if not len(keys_s):
            return np.empty(0, vals_s.dtype), np.zeros(len(q), dtype=bool)
        i = np.clip(np.searchsorted(keys_s, q), 0, len(keys_s) - 1)
        hit = keys_s[i] == q
        return vals_s[i[hit]], hit

    big = max(_read(sf_dir, "orders", ["o_orderkey"]).count(),
              _read(sf_dir, "customer", ["c_custkey"]).count(),
              _read(sf_dir, "supplier", ["s_suppkey"]).count())
    if big <= limit:
        def collect(ds, k, v):
            t = pa.concat_tables(list(ds.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow")))
            return _sorted_map(t, k, v)

        maps_ref = ray.put({
            "sup": collect(sup, "s_suppkey", "s_nationkey"),
            "cust": collect(cust, "c_custkey", "c_nationkey"),
            "ord": collect(o_filt, "o_orderkey", "o_custkey"),
        })

        def li_resolve(b: pa.Table) -> pa.Table:
            m = ray.get(maps_ref)
            snat, hit = _lookup(*m["sup"],
                                b["l_suppkey"].to_numpy(
                                    zero_copy_only=False))
            b = b.filter(pa.array(hit))
            ocust, hit = _lookup(*m["ord"],
                                 b["l_orderkey"].to_numpy(
                                     zero_copy_only=False))
            b, snat = b.filter(pa.array(hit)), snat[hit]
            cnat, hit = _lookup(*m["cust"], ocust)
            b, snat = b.filter(pa.array(hit)), snat[hit]
            local = snat == cnat
            b, snat = b.filter(pa.array(local)), snat[local]
            rev = _cents(b["l_extendedprice"]) * (
                100 - _cents(b["l_discount"]))
            t = pa.table({"nat": pa.array(snat, pa.int64()),
                          "rev": pa.array(rev, pa.int64())})
            return t.group_by("nat").aggregate(
                [("rev", "sum")]).rename_columns(["nat", "rev"])

        scored = lineitem.map_batches(li_resolve, batch_format="pyarrow")
    else:
        G = derive_num_groups(lineitem)
        o_schema = pa.schema([("o_orderkey", pa.int64()),
                              ("o_custkey", pa.int64())])
        o_nat = cogroup_attach(
            o_filt, "o_custkey", cust, "c_custkey", "c_nationkey",
            "c_nat", o_schema, pa.int64(), num_groups=G,
            on_missing="drop").drop_columns(["o_custkey"]).materialize()

        def li_proj(b: pa.Table) -> pa.Table:
            rev = _cents(b["l_extendedprice"]) * (
                100 - _cents(b["l_discount"]))
            return pa.table({"l_orderkey": b["l_orderkey"],
                             "l_suppkey": b["l_suppkey"],
                             "rev": pa.array(rev, pa.int64())})

        li = lineitem.map_batches(li_proj, batch_format="pyarrow")
        li_schema = pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("rev", pa.int64())])
        j1 = cogroup_attach(li, "l_suppkey", sup, "s_suppkey",
                            "s_nationkey", "s_nat", li_schema,
                            pa.int64(), num_groups=G, on_missing="drop")
        j2 = cogroup_attach(
            j1, "l_orderkey", o_nat, "o_orderkey", "c_nat", "c_nat",
            li_schema.append(pa.field("s_nat", pa.int64())),
            pa.int64(), num_groups=G, on_missing="drop")

        def local_filter(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["s_nat"], b["c_nat"]))
            return pa.table({"nat": b["s_nat"], "rev": b["rev"]})

        scored = j2.map_batches(local_filter, batch_format="pyarrow")

    agg = coarse_agg(scored, ["nat"], [("rev", "sum", "revenue_c4")])
    rows = agg.take_all()  # <= nation-catalog size by construction
    out = sorted(((name_of[r["nat"]], int(r["revenue_c4"]))
                  for r in rows), key=lambda r: (-r[1], r[0]))
    return pa.table({
        "n_name": pa.array([r[0] for r in out], pa.string()),
        "revenue_c4": pa.array([r[1] for r in out], pa.int64()),
    })


Q5_SQL = f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_c4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{"%04d-%02d-%02d" % Q5_RANGE[0]}'
  AND o_orderdate < TIMESTAMP '{"%04d-%02d-%02d" % Q5_RANGE[1]}'
GROUP BY n_name
ORDER BY revenue_c4 DESC, n_name ASC
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6-style forecast revenue: pure filter + global aggregate
    over lineitem — shipped in 1997, discount in [0.03, 0.07] (exact
    integer cents 3..7), quantity < 24; revenue = sum(extendedprice *
    discount) in integer c4.  One map-side partial sum per batch, one
    driver-sized final reduce — the minimal full-scan aggregate (scan
    is pruned to the four columns involved)."""
    import datetime as _dt

    lo = pa.scalar(_dt.datetime(1997, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1998, 1, 1), type=pa.timestamp("us"))
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi)),
            pc.less(batch["l_quantity"], pa.scalar(24.0)))
        batch = batch.filter(keep)
        disc = _cents(batch["l_discount"])
        m = (disc >= 3) & (disc <= 7)
        rev = int((_cents(batch["l_extendedprice"])[m]
                   * disc[m]).sum()) if m.any() else 0
        return pa.table({"revenue_c4": pa.array([rev], pa.int64())})

    total = li.map_batches(partial, batch_format="pyarrow").sum(
        "revenue_c4") or 0
    return pa.table({"revenue_c4": pa.array([int(total)], pa.int64())})


Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
       * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 3 AND 7
  AND l_quantity < 24
"""


def customers_order_stats(sf_dir: str, num_groups: int | None = None):
    """LEFT OUTER join shape: every customer with order count and
    total spend in integer cents — customers without orders appear
    with zeros (the half of join semantics ``q3``'s semi/anti and
    ``top_customers``'s inner paths don't cover).  Per-custkey partial
    aggregate first (map-side combine), then one co-grouped zero-fill
    join against the customer universe — neither table is broadcast or
    driver-collected."""
    from ..context import derive_num_groups
    from ..stages.agg import coarse_agg

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    G = num_groups or derive_num_groups(orders)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"c_custkey": b["o_custkey"],
                      "spend_cents": pa.array(_cents(b["o_totalprice"]),
                                              pa.int64())})
        g = t.group_by("c_custkey").aggregate(
            [("spend_cents", "sum"), ("spend_cents", "count")])
        return pa.table({
            "c_custkey": g["c_custkey"],
            "spend_cents": g["spend_cents_sum"].cast(pa.int64()),
            "n_orders": g["spend_cents_count"].cast(pa.int64()),
        })

    per_cust = coarse_agg(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["c_custkey"], [("spend_cents", "sum", "spend_cents"),
                        ("n_orders", "sum", "n_orders")],
        num_groups=G)

    def tag_cust(b: pa.Table) -> pa.Table:
        ids = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array(ids % G, pa.int64()),
                         "c_custkey": b["c_custkey"],
                         "spend_cents": pa.nulls(b.num_rows, pa.int64()),
                         "n_orders": pa.nulls(b.num_rows, pa.int64())})

    def tag_stats(b: pa.Table) -> pa.Table:
        ids = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array(ids % G, pa.int64()),
                         "c_custkey": b["c_custkey"],
                         "spend_cents": b["spend_cents"],
                         "n_orders": b["n_orders"]})

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        per_cust.map_batches(tag_stats, batch_format="pyarrow"))

    def fill(t: pa.Table) -> pa.Table:
        have = pc.is_valid(t["n_orders"])
        stats = t.filter(have)
        base = t.filter(pc.invert(have))
        ids = base["c_custkey"].to_numpy(zero_copy_only=False)
        sid = stats["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(sid, kind="stable")
        sid = sid[order]
        sp = stats["spend_cents"].to_numpy(zero_copy_only=False)[order]
        no = stats["n_orders"].to_numpy(zero_copy_only=False)[order]
        i = np.clip(np.searchsorted(sid, ids), 0, max(len(sid) - 1, 0))
        hit = (sid[i] == ids if len(sid)
               else np.zeros(len(ids), dtype=bool))
        spo = np.zeros(len(ids), dtype=np.int64)
        noo = np.zeros(len(ids), dtype=np.int64)
        spo[hit] = sp[i[hit]]
        noo[hit] = no[i[hit]]
        return pa.table({"c_custkey": pa.array(ids, pa.int64()),
                         "n_orders": pa.array(noo, pa.int64()),
                         "spend_cents": pa.array(spo, pa.int64())})

    return both.groupby("part").map_groups(fill, batch_format="pyarrow")


CUSTOMERS_ORDER_STATS_SQL = """
SELECT c.c_custkey,
       CAST(count(o.o_custkey) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS spend_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
"""


QUANTILE_PCTS = [1, 25, 50, 75, 99]


def doc_length_quantiles(sf_dir: str):
    """Exact document-length percentiles (p1/p25/p50/p75/p99 of
    ``n_chars``) via the distributed value-counts histogram
    (``stages.agg.exact_quantiles``) — the corpus-statistics pass a
    filtering pipeline runs before picking length cutoffs."""
    from ..stages.agg import exact_quantiles

    docs = _read(sf_dir, "documents", ["n_chars"])
    return exact_quantiles(docs, "n_chars", QUANTILE_PCTS)


def doc_length_quantiles_by_lang(sf_dir: str):
    """Per-language exact length percentiles — the grouped form of
    ``doc_length_quantiles`` (one (value, lang) histogram pass,
    driver rank scan per language)."""
    from ..stages.agg import exact_quantiles_by_group

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    return exact_quantiles_by_group(docs, "lang", "n_chars",
                                    QUANTILE_PCTS)


DOC_LENGTH_QUANTILES_BY_LANG_SQL = f"""
WITH ranked AS (SELECT lang, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars) AS r
                FROM documents),
cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
p(pct) AS (VALUES {", ".join(f"({p})" for p in QUANTILE_PCTS)})
SELECT c.lang, p.pct AS pct, rk.n_chars AS value
FROM cnt c CROSS JOIN p JOIN ranked rk
  ON rk.lang = c.lang
 AND rk.r = greatest(1, (p.pct * c.c + 99) // 100)
ORDER BY c.lang, p.pct
"""


DOC_LENGTH_QUANTILES_SQL = f"""
WITH ranked AS (SELECT n_chars,
                       row_number() OVER (ORDER BY n_chars) AS r
                FROM documents),
cnt AS (SELECT count(*) AS c FROM documents),
p(pct) AS (VALUES {", ".join(f"({p})" for p in QUANTILE_PCTS)})
SELECT p.pct AS pct, rk.n_chars AS value
FROM p JOIN ranked rk
  ON rk.r = greatest(1, (p.pct * (SELECT c FROM cnt) + 99) // 100)
ORDER BY p.pct
"""


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate over the events stream table
    (streaming-shaped workload — SURVEY.md §2.9 notes the reference has
    none; this is the batch-on-log equivalent: window key derived from
    the timestamp, then grouped aggregation)."""
    from ray.data.aggregate import Sum

    US_PER_HOUR = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = ts // US_PER_HOUR
        val_c = _cents(batch["value"])
        t = pa.table({"window": pa.array(win, pa.int64()),
                      "event_type": batch["event_type"],
                      "val": pa.array(val_c, pa.int64())})
        g = t.group_by(["window", "event_type"]).aggregate(
            [("val", "sum"), ("val", "count")]
        )
        return g.rename_columns(["window", "event_type", "sum_value_cents", "n_events"])

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return ds.groupby(["window", "event_type"]).aggregate(
        Sum("sum_value_cents", alias_name="sum_value_cents"),
        Sum("n_events", alias_name="n_events"),
    )


EVENTS_HOURLY_SQL = """
SELECT epoch_us(ts) // 3600000000 AS window,
       event_type,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
"""


def events_sessions(sf_dir: str, gap_minutes: int = 30,
                    num_groups: int | None = None):
    """Gap-based session windows per user (the custom streaming-window
    operator the reference lacks, SURVEY.md §2.9): events of one user
    belong to the same session while consecutive gaps are <= gap.

    Partitioning assumption: sessionization needs ALL of a user's
    events co-located and time-sorted, so the shuffle key is the user —
    grouped on a COARSE ``user_id % num_groups`` key (same pattern as
    the LSH pair sweep: per-group overhead once per partition, then one
    vectorized lexsort/boundary sweep handles every user in it), with
    the group count derived from input size so a partition stays within
    a worker heap at any scale."""
    from ..context import derive_num_groups

    GAP_US = gap_minutes * 60_000_000
    src = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    G = num_groups or derive_num_groups(src)

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy(zero_copy_only=False) % G
        return batch.append_column("part", pa.array(part, pa.int64()))

    def sessionize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val_c = _cents(t["value"])
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, val_c = uid[order], ts[order], eid[order], val_c[order]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | (np.r_[0, np.diff(ts)] > GAP_US)
        # per-user session ordinal starting at 1
        gbrk = np.cumsum(brk)
        first_of_user = np.where(new_user, gbrk, 0)
        sess = gbrk - np.maximum.accumulate(first_of_user) + 1
        # aggregate per (uid, sess): boundaries are exactly the breaks
        b = np.flatnonzero(brk)
        e = np.r_[b[1:], len(uid)]
        counts = e - b
        sums = np.add.reduceat(val_c, b) if len(b) else np.array([], np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid[b], pa.int64()),
                "session_id": pa.array(sess[b], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "start_ts": pa.array(ts[b], pa.timestamp("us")),
                "end_ts": pa.array(ts[e - 1], pa.timestamp("us")),
                "sum_value_cents": pa.array(sums, pa.int64()),
            }
        )

    ds = src.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("part").map_groups(sessionize, batch_format="pyarrow")


EVENTS_SESSIONS_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS session_id
  FROM s
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM g GROUP BY user_id, session_id
"""


FUNNEL_STAGES = ["view", "click", "purchase"]


def events_funnel(sf_dir: str, stages: list[str] | None = None,
                  num_groups: int | None = None):
    """Ordered FUNNEL analysis over the events stream: per user, stage
    i is reached when an event of type ``stages[i]`` occurs STRICTLY
    after the user's stage-(i-1) completion time (min qualifying ts,
    the standard strict-sequence funnel).  Output: one row per stage
    with the number of users reaching at least that stage.

    Same partitioning assumption as sessionization: all of a user's
    events co-located via the coarse ``user_id % G`` key; inside a
    partition, each stage is one masked ``minimum.reduceat`` sweep
    over the user-sorted timestamps — no per-user Python loop, no
    whole-table sort.  The per-partition output is ``len(stages)``
    partial counts, so the final aggregate is driver-sized."""
    from ..context import derive_num_groups
    from ..stages.agg import coarse_agg

    stages = FUNNEL_STAGES if stages is None else stages
    src = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    G = num_groups or derive_num_groups(src)
    INF = np.iinfo(np.int64).max

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy(zero_copy_only=False) % G
        return batch.append_column("part", pa.array(part, pa.int64()))

    def funnel(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist())
        order = np.lexsort((ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        b = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        sizes = np.diff(np.r_[b, len(uid)])
        prev = np.full(len(b), np.int64(-(1 << 62)), dtype=np.int64)
        counts = []
        for s in stages:
            mask = (et == s) & (ts > np.repeat(prev, sizes))
            masked = np.where(mask, ts, INF)
            cur = (np.minimum.reduceat(masked, b) if len(b)
                   else np.array([], dtype=np.int64))
            counts.append(int(np.sum(cur < INF)))
            prev = cur
        return pa.table({
            "stage": pa.array(np.arange(1, len(stages) + 1), pa.int64()),
            "n_users": pa.array(counts, pa.int64()),
        })

    parts = src.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(funnel, batch_format="pyarrow")
    agg = coarse_agg(parts, ["stage"], [("n_users", "sum", "n_users")])
    out = pa.concat_tables(
        [pa.table({"stage": pa.array([], pa.int64()),
                   "n_users": pa.array([], pa.int64())})]
        + list(agg.iter_batches(batch_size=1 << 20,
                                batch_format="pyarrow")))
    return out.sort_by("stage")


EVENTS_FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT 1 AS stage, (SELECT count(*) FROM v) AS n_users
UNION ALL SELECT 2, (SELECT count(*) FROM c)
UNION ALL SELECT 3, (SELECT count(*) FROM p)
ORDER BY stage
"""


ROLLUP_ALL = "__all__"


def events_type_daily_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day) over the events stream —
    computed the scalable way: ONE aggregate at the finest grain
    (type, day), then the two coarser levels re-aggregate the (small)
    result instead of rescanning the input.  Rollup slots use the
    explicit ``'__all__'`` / day ``-1`` sentinels rather than NULLs so
    the driver's value-hash compare stays total-ordered."""
    from ..stages.agg import coarse_agg

    src = _read(sf_dir, "events", ["ts", "event_type", "value"])
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "day": pa.array(ts // DAY_US, pa.int64()),
                      "value_cents": pa.array(_cents(b["value"]),
                                              pa.int64())})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")])
        return pa.table({
            "event_type": g["event_type"], "day": g["day"],
            "sum_cents": g["value_cents_sum"].cast(pa.int64()),
            "n": g["value_cents_count"].cast(pa.int64()),
        })

    fine = coarse_agg(
        src.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        [("sum_cents", "sum", "sum_cents"), ("n", "sum", "n")],
    ).materialize()

    def lift_type(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "day": pa.array(
                             np.full(b.num_rows, -1, dtype=np.int64),
                             pa.int64()),
                         "sum_cents": b["sum_cents"], "n": b["n"]})

    def lift_all(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": pa.array(
                             [ROLLUP_ALL] * b.num_rows, pa.string()),
                         "day": pa.array(
                             np.full(b.num_rows, -1, dtype=np.int64),
                             pa.int64()),
                         "sum_cents": b["sum_cents"], "n": b["n"]})

    per_type = coarse_agg(
        fine.map_batches(lift_type, batch_format="pyarrow"),
        ["event_type", "day"],
        [("sum_cents", "sum", "sum_cents"), ("n", "sum", "n")])
    total = coarse_agg(
        fine.map_batches(lift_all, batch_format="pyarrow"),
        ["event_type", "day"],
        [("sum_cents", "sum", "sum_cents"), ("n", "sum", "n")])
    return fine.union(per_type).union(total)


EVENTS_ROLLUP_SQL = """
SELECT coalesce(event_type, '__all__') AS event_type,
       CAST(CASE WHEN grouping(d) = 1 THEN -1 ELSE d END AS BIGINT)
         AS day,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS d, value
      FROM events)
GROUP BY ROLLUP(event_type, d)
"""


def events_running_totals(sf_dir: str, num_groups: int | None = None):
    """Per-user running (cumulative) value total in event-time order —
    the classic ordered window function, row-per-event output.  Same
    coarse user-hash grouping as ``events_sessions`` (group count
    derived from input size); the per-user cumsum is one vectorized
    pass per partition."""
    from ..context import derive_num_groups

    src = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    G = num_groups or derive_num_groups(src)

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy(zero_copy_only=False) % G
        return batch.append_column("part", pa.array(part, pa.int64()))

    def running(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val_c = _cents(t["value"])
        order = np.lexsort((eid, ts, uid))
        uid, eid, val_c = uid[order], eid[order], val_c[order]
        csum = np.cumsum(val_c)
        # running-within-user = csum - csum just before the user's
        # first row; forward-fill that base via first-row indices
        # (index fill works for negative values too)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        idx = np.arange(len(uid))
        first = np.maximum.accumulate(np.where(new_user, idx, 0))
        base = (csum - val_c)[first]
        run = csum - base
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "running_value_cents": pa.array(run, pa.int64())})

    ds = src.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("part").map_groups(running, batch_format="pyarrow")


EVENTS_RUNNING_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS running_value_cents
FROM events
"""


def events_asof_last_error(sf_dir: str, num_groups: int | None = None):
    """As-of join: every event joined to the same user's most recent
    PRIOR (strictly earlier ts) 'error' event — the classic
    time-series enrichment join Ray Data lacks natively.

    Partitioning assumption: both sides key on the user, so one coarse
    user-hash groupby co-locates them (group count derived from input
    size); within a partition a single lexsort + cummax-style sweep
    resolves every probe (no per-row search).  Output: (event_id,
    user_id, last_error_event_id, last_error_value_cents), -1 /
    null-free sentinel when no prior error exists."""
    from ..context import derive_num_groups

    src = _read(sf_dir, "events",
                ["event_id", "ts", "user_id", "event_type", "value"])
    G = num_groups or derive_num_groups(src)

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy(zero_copy_only=False) % G
        return batch.append_column("part", pa.array(part, pa.int64()))

    def asof(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        etype = t["event_type"].to_numpy(zero_copy_only=False)
        val_c = _cents(t["value"])
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        etype, val_c = etype[order], val_c[order]
        is_err = etype == "error"
        idx = np.arange(len(uid))
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        user_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        # last error at-or-before each row, masked to the same user
        ffill = np.maximum.accumulate(np.where(is_err, idx, -1))
        ffill = np.where(ffill >= user_start, ffill, -1)
        # strict ts < : the answer for row j is the at-or-before error
        # of the last row BEFORE j's (user, ts) group
        new_grp = new_user | np.r_[True, ts[1:] != ts[:-1]]
        grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        prev_idx = grp_start - 1
        out_err = np.where(prev_idx >= user_start,
                           ffill[np.maximum(prev_idx, 0)], -1)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "last_error_event_id": pa.array(
                    np.where(out_err >= 0, eid[np.maximum(out_err, 0)], -1),
                    pa.int64()),
                "last_error_value_cents": pa.array(
                    np.where(out_err >= 0, val_c[np.maximum(out_err, 0)], -1),
                    pa.int64()),
            }
        )

    ds = src.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("part").map_groups(asof, batch_format="pyarrow")


EVENTS_ASOF_SQL = """
WITH e AS (SELECT event_id, ts, user_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events)
SELECT p.event_id, p.user_id,
       coalesce(err.event_id, -1) AS last_error_event_id,
       coalesce(err.value_cents, -1) AS last_error_value_cents
FROM e p
LEFT JOIN LATERAL (
    SELECT event_id, value_cents
    FROM e x
    WHERE x.user_id = p.user_id AND x.event_type = 'error'
      AND x.ts < p.ts
    ORDER BY x.ts DESC, x.event_id DESC
    LIMIT 1
) err ON true
"""


def lang_doc_stats(sf_dir: str):
    """documents grouped by lang: count + exact average length."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch["lang"], "n_chars": batch["n_chars"]})
        g = t.group_by("lang").aggregate([("n_chars", "sum"), ("n_chars", "count")])
        return g.rename_columns(["lang", "sum_chars", "n_docs"])

    ds = _read(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    )
    out = ds.groupby("lang").aggregate(
        Sum("sum_chars", alias_name="sum_chars"),
        Sum("n_docs", alias_name="n_docs"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        avg = (
            batch["sum_chars"].to_numpy(zero_copy_only=False)
            / batch["n_docs"].to_numpy(zero_copy_only=False)
        )
        return batch.append_column("avg_chars", pa.array(avg, pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow")


LANG_DOC_STATS_SQL = """
SELECT lang, CAST(sum(n_chars) AS BIGINT) AS sum_chars, count(*) AS n_docs,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM documents
GROUP BY lang
"""


def events_retention(sf_dir: str):
    """COHORT RETENTION TRIANGLE over the events stream — the classic
    product-analytics rollup: cohort_day = a user's FIRST active day,
    and for every later active day the user counts once toward
    (cohort_day, day_offset = active_day - cohort_day).  Output rows
    (cohort_day, day_offset, n_users), all exact int64.

    Scale shape: (1) ``coarse_distinct`` collapses the event stream to
    distinct (user_id, day) pairs (map-side pre-distinct, one shuffle);
    (2) one shuffle on ``user_id % G`` co-locates every day of a user,
    so the cohort min and the offsets are partition-local vectorized
    numpy (lexsort + boundary sweep, no per-user Python); (3) the
    per-partition (cohort, offset) count partials meet in a final
    small ``coarse_agg``.  Nothing is O(users) on the driver.

    Day-bucket contract (shared with ``distinct_users_daily`` /
    ``events_type_daily_rollup``): ts >= epoch — numpy ``//`` floors
    while DuckDB's integer ``//`` truncates toward zero, so the engine
    and SQL mirror agree on negative (pre-1970) microseconds only up
    to that rounding; the events table is post-epoch by contract."""
    from ..context import derive_num_groups
    from ..stages.agg import coarse_agg, coarse_distinct

    src = _read(sf_dir, "events", ["ts", "user_id"])
    DAY_US = 86_400_000_000

    def to_day(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "day": pa.array(ts // DAY_US, pa.int64())})

    pairs = coarse_distinct(
        src.map_batches(to_day, batch_format="pyarrow"),
        ["user_id", "day"]).materialize()
    G = derive_num_groups(pairs)

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("upart",
                               pa.array(uid % G, pa.int64()))

    def per_user(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = t["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        starts = np.r_[True, u[1:] != u[:-1]] if len(u) else \
            np.array([], dtype=bool)
        cohort = d[np.flatnonzero(starts)]
        cid = np.cumsum(starts) - 1
        coh = cohort[cid]
        tt = pa.table({"cohort_day": pa.array(coh, pa.int64()),
                       "day_offset": pa.array(d - coh, pa.int64())})
        g = tt.group_by(["cohort_day", "day_offset"]).aggregate(
            [("day_offset", "count")])
        return pa.table({
            "cohort_day": g["cohort_day"],
            "day_offset": g["day_offset"],
            "n_users": g["day_offset_count"].cast(pa.int64()),
        })

    return coarse_agg(
        pairs.map_batches(tag, batch_format="pyarrow")
        .groupby("upart").map_groups(per_user, batch_format="pyarrow"),
        ["cohort_day", "day_offset"], [("n_users", "sum", "n_users")],
    )


EVENTS_RETENTION_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
coh AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
SELECT c.cohort AS cohort_day, d.day - c.cohort AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM days d JOIN coh c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""
