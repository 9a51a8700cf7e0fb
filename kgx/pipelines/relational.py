"""Relational operators expressed Ray-Data-first over the driver's TPC-H-ish
tables — the generic forms of the reference's joins/aggregations (SURVEY.md
§2.4/§2.5/§2.6): partial+final aggregation, broadcast hash join, semi-join
with a collected key set, top-k with deterministic tie-break, tumbling-window
counts, distinct.

Design rules applied throughout (the 100 TB contract):
* reads prune columns at the source (``read_parquet(columns=[...])``);
* every aggregation is combined inside ``map_batches`` BEFORE the groupby so
  the shuffle moves one row per (batch, key), not per input row;
* the small side of every join is collected/broadcast (ray.put or closure),
  the big side streams;
* compared outputs carry integers (counts, keys, epoch seconds) or integral
  sums only — no float round-trip ambiguity against the SQL oracle.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(str(Path(sf_dir) / f"{table}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Partial+final aggregation (TPC-H Q1 shape; reference G7 counters)
# ---------------------------------------------------------------------------


def lineitem_agg(sf_dir: str):
    """sum(l_quantity), count(*) per (l_returnflag, l_linestatus) — TPC-H Q1
    shape via the reusable hash-partitioned aggregate exchange."""
    import pandas as pd

    from ..stages.exchange import hash_partitioned_agg

    keys = ["l_returnflag", "l_linestatus"]

    def to_agg_form(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": df["l_quantity"],
                "n_rows": 1,
            }
        )

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return (
            df.groupby(keys, sort=False)
            .agg(sum_qty=("sum_qty", "sum"), n_rows=("n_rows", "sum"))
            .reset_index()
        )

    ds = _read(sf_dir, "lineitem", keys + ["l_quantity"])
    return hash_partitioned_agg(
        ds.map_batches(to_agg_form, batch_format="pandas"), keys, combine
    )


# ---------------------------------------------------------------------------
# Broadcast hash join (small side shipped once; reference J7 dict lookup)
# ---------------------------------------------------------------------------


def orders_per_segment(sf_dir: str):
    """orders ⋈ customer on custkey (customer broadcast) -> order count per
    c_mktsegment."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        str(Path(sf_dir) / "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    seg_of = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())
    )
    seg_ref = ray.put(seg_of)  # broadcast once; resolved per task from plasma

    import pandas as pd

    from ..stages.exchange import hash_partitioned_agg

    def to_agg_form(df: "pd.DataFrame") -> "pd.DataFrame":
        lookup = ray.get(seg_ref)
        seg = pd.Series([lookup.get(k) for k in df["o_custkey"]])
        out = pd.DataFrame({"c_mktsegment": seg, "n_orders": 1})
        return out.dropna(subset=["c_mktsegment"])

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return (
            df.groupby("c_mktsegment", sort=False)
            .agg(n_orders=("n_orders", "sum"))
            .reset_index()
        )

    ds = _read(sf_dir, "orders", ["o_custkey"])
    return hash_partitioned_agg(
        ds.map_batches(to_agg_form, batch_format="pandas"), ["c_mktsegment"], combine
    )


# ---------------------------------------------------------------------------
# Semi-join (reference J5: QA ⋉ surviving breakdowns)
# ---------------------------------------------------------------------------


def customers_with_orders(sf_dir: str):
    """customer ⋉ orders: custkeys having >= 1 order.  The key set is itself
    computed distributed (partial distinct per batch, then unique) and is the
    SMALL side by definition (distinct keys << order rows), so it broadcasts
    into the filter."""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey"])
    partial_distinct = orders.map_batches(
        lambda b: pa.table({"o_custkey": pc.unique(b["o_custkey"])}),
        batch_format="pyarrow",
    )
    keys = set(partial_distinct.unique("o_custkey"))
    keys_ref = ray.put(keys)

    def keep(batch: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        mask = pa.array([v in k for v in batch["c_custkey"].to_pylist()])
        return batch.filter(mask)

    cust = _read(sf_dir, "customer", ["c_custkey"])
    return cust.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Top-k with deterministic tie-break (reference O4/O6 argmax + caps)
# ---------------------------------------------------------------------------


def top_customers_by_orders(sf_dir: str, k: int = 10):
    """Top-k custkeys by order count; tie-break custkey asc.  Partial counts
    combine per batch; the final sort sees one row per custkey."""

    import pandas as pd

    from ..stages.exchange import hash_partitioned_agg

    def to_agg_form(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({"o_custkey": df["o_custkey"], "n_orders": 1})

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return (
            df.groupby("o_custkey", sort=False)
            .agg(n_orders=("n_orders", "sum"))
            .reset_index()
        )

    ds = _read(sf_dir, "orders", ["o_custkey"])
    counts = hash_partitioned_agg(
        ds.map_batches(to_agg_form, batch_format="pandas"), ["o_custkey"], combine
    )
    return counts.sort(["n_orders", "o_custkey"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# Tumbling-window count (reference G5 per-minute cap / G6 sliding analysis)
# ---------------------------------------------------------------------------


def events_per_user_hour(sf_dir: str):
    """(user_id, hour_epoch, n_events): tumbling 1-hour windows per user."""

    import pandas as pd

    from ..stages.exchange import hash_partitioned_agg

    keys = ["user_id", "hour_epoch"]

    def to_agg_form(df: "pd.DataFrame") -> "pd.DataFrame":
        hour_us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "hour_epoch": hour_us // 3_600_000_000 * 3600,
                "n_events": 1,
            }
        )

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return (
            df.groupby(keys, sort=False)
            .agg(n_events=("n_events", "sum"))
            .reset_index()
        )

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    return hash_partitioned_agg(
        ds.map_batches(to_agg_form, batch_format="pandas"), keys, combine
    )


# ---------------------------------------------------------------------------
# Range join (reference J1: interval containment — segments within a frame's
# display window, gemini_backend.py:79-92 — generalized to rows within a
# per-key time window)
# ---------------------------------------------------------------------------


def lineitems_in_order_window(sf_dir: str, days: int = 90):
    """lineitem ⋈ orders on orderkey WHERE shipdate ∈ [orderdate,
    orderdate + days): count qualifying items per o_orderpriority.

    The window side (orders) broadcasts once as two aligned arrays; the big
    side streams and evaluates the containment predicate vectorized — the
    same broadcast-then-filter shape the KG pipeline uses for its page-local
    interval join, lifted to a keyed table."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    orders = pq.read_table(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    odate = pd.Series(
        pd.to_datetime(orders["o_orderdate"].to_pandas())
        .astype("datetime64[ns]")
        .astype("int64")
        .values,
        index=orders["o_orderkey"].to_pandas().values,
    )
    oprio = pd.Series(
        orders["o_orderpriority"].to_pandas().values,
        index=orders["o_orderkey"].to_pandas().values,
    )
    side_ref = ray.put((odate, oprio))
    window_ns = days * 86_400 * 1_000_000_000

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        od, op = ray.get(side_ref)
        keys = df["l_orderkey"].values
        start = od.reindex(keys).values
        ship = (
            pd.to_datetime(df["l_shipdate"])
            .astype("datetime64[ns]")
            .astype("int64")
            .values
        )
        mask = (ship >= start) & (ship < start + window_ns) & ~np.isnan(start.astype("float64"))
        prios = op.reindex(keys).values[mask]
        vc = pd.Series(prios).value_counts()
        return pd.DataFrame(
            {"o_orderpriority": vc.index.astype(str), "n_items": vc.values.astype("int64")}
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": [group["o_orderpriority"][0].as_py()],
                "n_items": [pc.sum(group["n_items"]).as_py()],
            }
        )

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    part = ds.map_batches(partial, batch_format="pandas")
    return part.groupby("o_orderpriority").map_groups(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gap-based sessionization (reference G1 run-length grouping, base.py:30-51:
# a new group starts whenever the ordered stream changes state — here, when
# the inter-event gap exceeds the timeout)
# ---------------------------------------------------------------------------


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """events -> (user_id, session_start_us, n_events): per-user sessions
    split where the gap to the previous event exceeds ``gap_minutes``.

    Order-dependent semantics are PER KEY, so the shuffle is a plain
    groupby(user_id) and the ordered scan happens vectorized inside each
    group (sort by ts, event_id; gap diff; cumulative session index) — the
    distributed form of the reference's sequential run-length pass."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def per_user(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["ts", "event_id"])
        us = df["ts"].astype("datetime64[us]").astype("int64")
        new_session = (us.diff().fillna(gap_us + 1) > gap_us).astype("int64")
        sid = new_session.cumsum()
        g = pd.DataFrame({"user_id": df["user_id"], "sid": sid, "us": us}).groupby(
            "sid", sort=False
        )
        out = g.agg(
            user_id=("user_id", "first"),
            session_start_us=("us", "min"),
            n_events=("us", "size"),
        )
        return out.reset_index(drop=True)[["user_id", "session_start_us", "n_events"]]

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


# ---------------------------------------------------------------------------
# Distinct (reference D4/G4 set semantics)
# ---------------------------------------------------------------------------


def events_trailing_hour(sf_dir: str):
    """(event_id, n_last_hour): per event, how many of the same user's
    events fall in the trailing 1-hour window INCLUDING this one — the
    sliding-window analog of the reference's activity analysis (G6,
    extractor.py:241-299: frames/min over a trailing window).

    Per-user ordered semantics -> groupby(user_id) + a vectorized
    two-pointer scan (searchsorted) inside each group; no per-row Python."""
    import numpy as np
    import pandas as pd

    window_us = 3600 * 1_000_000

    def per_user(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["ts", "event_id"])
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        # first index whose ts >= current - 1h  (RANGE ... PRECEDING bound)
        lo = np.searchsorted(us, us - window_us, side="left")
        n = np.arange(len(us)) - lo + 1
        return pd.DataFrame({"event_id": df["event_id"], "n_last_hour": n})

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def orders_per_nation_native_join(sf_dir: str):
    """Order count per customer nation via Ray Data's NATIVE hash join
    (``Dataset.join``) — the shuffle-join path for when neither side fits a
    broadcast (contrast with orders_per_segment's broadcast join)."""
    import pandas as pd

    from ..stages.exchange import hash_partitioned_agg

    orders = _read(sf_dir, "orders", ["o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def to_agg_form(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {"c_nationkey": df["c_nationkey"].astype("int64"), "n_orders": 1}
        )

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return (
            df.groupby("c_nationkey", sort=False)
            .agg(n_orders=("n_orders", "sum"))
            .reset_index()
        )

    return hash_partitioned_agg(
        joined.map_batches(to_agg_form, batch_format="pandas"),
        ["c_nationkey"],
        combine,
    )


def event_json_values(sf_dir: str):
    """(event_id, k_value) extracted from the JSON ``props`` column with a
    fail-open regex parse (reference M13 defensive LLM-JSON parsing,
    gemini_backend.py:131-139: malformed -> dropped, never a crash)."""
    import pandas as pd

    def extract(df: "pd.DataFrame") -> "pd.DataFrame":
        k = df["props"].fillna("").str.extract(r'"k":\s*(\d+)', expand=False)
        out = pd.DataFrame({"event_id": df["event_id"], "k_value": k})
        out = out.dropna(subset=["k_value"])
        out["k_value"] = out["k_value"].astype("int64")
        return out

    ds = _read(sf_dir, "events", ["event_id", "props"])
    return ds.map_batches(extract, batch_format="pandas")


def top_orders_per_segment(sf_dir: str, k: int = 3):
    """Per-group top-N (reference O6 per-window caps + O4 argmax): the k
    highest-value orders per market segment, tie-break orderkey asc.
    Combiner: each batch keeps only its local top-k per segment, so the
    shuffle moves k rows per (segment, batch)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        str(Path(sf_dir) / "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    seg_ref = ray.put(
        pd.Series(
            cust["c_mktsegment"].to_pandas().values,
            index=cust["c_custkey"].to_pandas().values,
        )
    )

    def local_topk(df: "pd.DataFrame") -> "pd.DataFrame":
        seg = ray.get(seg_ref)
        df = pd.DataFrame(
            {
                "c_mktsegment": seg.reindex(df["o_custkey"].values).values,
                "o_orderkey": df["o_orderkey"],
                "o_totalprice": df["o_totalprice"],
            }
        ).dropna(subset=["c_mktsegment"])
        df = df.sort_values(
            ["c_mktsegment", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        return df.groupby("c_mktsegment", sort=False).head(k)

    def final(group: pa.Table) -> pa.Table:
        rows = sorted(
            group.to_pylist(), key=lambda r: (-r["o_totalprice"], r["o_orderkey"])
        )[:k]
        return pa.table(
            {
                "c_mktsegment": [r["c_mktsegment"] for r in rows],
                "o_orderkey": [r["o_orderkey"] for r in rows],
                "rnk": list(range(1, len(rows) + 1)),
            },
            schema=pa.schema(
                [("c_mktsegment", pa.string()), ("o_orderkey", pa.int64()),
                 ("rnk", pa.int64())]
            ),
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    part = ds.map_batches(local_topk, batch_format="pandas")
    return part.groupby("c_mktsegment").map_groups(final, batch_format="pyarrow")


def distinct_event_types(sf_dir: str):
    """Distinct event_type values, one column out."""
    ds = _read(sf_dir, "events", ["event_type"])
    partial = ds.map_batches(
        lambda b: pa.table({"event_type": pc.unique(b["event_type"])}),
        batch_format="pyarrow",
    )
    return partial.groupby("event_type").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
