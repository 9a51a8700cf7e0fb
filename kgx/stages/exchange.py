"""Reusable hash-partitioned aggregate exchange.

The one shuffle shape almost every aggregation in this engine needs:

    map_batches(pandas combiner)            # one partial row per key per batch
      -> tag part_id = hash(keys) % P       # P ~ cluster CPUs, NOT #keys
      -> groupby(part_id).map_groups(       # ONE exchange, P groups,
             vectorized pandas re-merge)    #   no per-key Python anywhere

Compared with ``groupby(keys).map_groups(fn)`` this removes the per-group
Python call (10^4-10^6 groups -> 10^1-10^2 partitions) while keeping key
disjointness (every key lands wholly in one partition), so any associative +
commutative pandas aggregation gives exactly the single-pass result.  Skewed
KEYS are already neutralized by the combiner (a key is at most one row per
upstream batch); P bounds per-task width.

Used by kgx.stages.wide (triple dedup) and kgx.pipelines.relational.
"""

from __future__ import annotations

from collections.abc import Callable


def _default_partitions() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def hash_partitioned_agg(
    ds,
    keys: list[str],
    combine: Callable,
    num_partitions: int | None = None,
):
    """``combine(df) -> df`` must be an associative/commutative pandas
    aggregation over ``keys`` (groupby + sum/min/max/first-on-sorted...).
    It runs once per input batch (the combiner) and once per partition (the
    re-merge); output columns must be stable across both applications."""
    import pandas as pd

    P = num_partitions or _default_partitions()

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = combine(df)
        if len(keys) == 1:
            hashed = pd.util.hash_pandas_object(g[keys[0]], index=False)
        else:  # row-wise join is fine: partials are one row per key per batch
            hashed = pd.util.hash_pandas_object(
                g[keys].astype(str).agg("\x1f".join, axis=1), index=False
            )
        g["part_id"] = (hashed % P).astype("int64")
        return g

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        return combine(df.drop(columns=["part_id"]))

    partial_ds = ds.map_batches(partial, batch_format="pandas")
    return partial_ds.groupby("part_id").map_groups(merge, batch_format="pandas")


def _arrow_part_id(batch, keys: list[str], P: int):
    """part_id for an Arrow batch: pandas' C hasher over the KEY column(s)
    only (value-identical to ``_tag_part_id`` — hash_pandas_object of the
    same values/dtypes — so mixing taggers within one exchange is safe);
    every non-key column stays Arrow-resident, so blocks cross the shuffle
    as Arrow instead of pickled pandas."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if len(keys) == 1:
        hashed = pd.util.hash_pandas_object(
            batch[keys[0]].to_pandas(), index=False
        ).to_numpy()
    else:
        frame = batch.select(keys).to_pandas()
        hashed = pd.util.hash_pandas_object(
            frame[keys].astype(str).agg("\x1f".join, axis=1), index=False
        ).to_numpy()
    part = pa.array((hashed % np.uint64(P)).astype(np.int64))
    return batch.append_column("part_id", part)


def hash_partitioned_agg_arrow(
    ds,
    keys: list[str],
    combine: Callable,
    num_partitions: int | None = None,
):
    """Arrow-end-to-end variant of :func:`hash_partitioned_agg` for the
    hottest exchanges (VERDICT r3 #8): ``combine(pa.Table) -> pa.Table``
    (typically ``t.group_by(keys).aggregate(...)``) runs once per input
    batch and once per partition; blocks stay Arrow through tagging AND the
    shuffle (zero-copy in the object store), with only the key column
    round-tripping through pandas for the hash."""
    P = num_partitions or _default_partitions()

    def partial(t):
        return _arrow_part_id(combine(t), keys, P)

    def merge(t):
        return combine(t.drop_columns(["part_id"]))

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    return tagged.groupby("part_id").map_groups(merge, batch_format="pyarrow")


def _tag_part_id(df, keys: list[str], P: int):
    import pandas as pd

    if len(keys) == 1:
        hashed = pd.util.hash_pandas_object(df[keys[0]], index=False)
    else:
        hashed = pd.util.hash_pandas_object(
            df[keys].astype(str).agg("\x1f".join, axis=1), index=False
        )
    df = df.copy()
    df["part_id"] = (hashed % P).astype("int64")
    return df


def hash_partitioned_apply(
    ds,
    keys: list[str],
    kernel: Callable,
    num_partitions: int | None = None,
    int_keys: bool = False,
    kernel_format: str = "pandas",
    arrow_tag: bool = False,
):
    """Partition-ONLY exchange for holistic per-key operations that admit no
    combiner (sessionization, as-of joins, ordered windows, bucket
    verification): rows co-locate by hash(keys) — every key wholly inside
    one partition — and ``kernel`` runs EXACTLY ONCE per partition over all
    its keys (so it may sort and scan freely).  This is the
    per-group-Python-free alternative to ``groupby(keys).map_groups`` when
    key cardinality is unbounded: P ~ cluster CPUs partitions, one
    vectorized pandas kernel each.

    With ``int_keys=True`` (caller asserts every key column is integer)
    tagging stays ZERO-COPY ARROW — one numpy mix + append_column, so
    blocks cross the shuffle as Arrow, which matters when they carry list
    columns that are expensive to round-trip through pandas.  Default is
    the generic pandas hasher.

    Default P is 8x the CPU count, NOT the CPU count: the exchange is a
    range-partitioned sort on part_id, and more distinct values give it
    cleaner quantile boundaries and smooth stragglers across
    heterogeneously-sized kernels (interleaved A/B at sf0.1 shows parity to
    slightly better; per-key disjointness is unaffected by P)."""
    import numpy as np
    import pyarrow as pa

    P = num_partitions or _default_partitions() * 8

    def tag_arrow(batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        mix = np.zeros(batch.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, k in enumerate(keys):
                # fill_null keeps to_numpy zero-copy-safe on hostile inputs
                # (null keys all land in one partition, which is correct —
                # the kernel still groups on the real key values)
                col = (
                    pc.fill_null(batch[k], 0).to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                # Fibonacci-style mix so correlated int keys still spread
                mix = (mix ^ (col + np.uint64(0x9E3779B97F4A7C15))) * np.uint64(
                    0xBF58476D1CE4E5B9 + 2 * i
                )
        part = pa.array((mix % np.uint64(P)).astype(np.int64))
        return batch.append_column("part_id", part)

    def tag_pandas(df):
        return _tag_part_id(df, keys, P)

    if kernel_format == "pyarrow":
        def run(t: "pa.Table") -> "pa.Table":
            return kernel(t.drop_columns(["part_id"]))
    else:
        def run(df):
            return kernel(df.drop(columns=["part_id"]))

    if int_keys:
        tagged = ds.map_batches(tag_arrow, batch_format="pyarrow")
    elif arrow_tag:
        # opt-in (caller asserts all columns are Arrow-convertible — no
        # Python-set/object cells): hash only the key column(s) through
        # pandas, keep the block Arrow across the shuffle
        tagged = ds.map_batches(
            lambda t: _arrow_part_id(t, keys, P), batch_format="pyarrow"
        )
    else:
        tagged = ds.map_batches(tag_pandas, batch_format="pandas")
    return tagged.groupby("part_id").map_groups(run, batch_format=kernel_format)


def collect_arrow(ds, schema: "pa.Table | None" = None):
    """Driver-side collect of a SMALL Dataset as one Arrow table.

    Skips empty blocks before the concat: a ``groupby(part_id).map_groups``
    partition with no rows can emit an empty block carrying NO schema (the
    recurring empty-block trap — at high partition counts over tiny inputs
    most partitions are empty), and ``pa.concat_tables`` raises on the
    mixed schemas.  Falls back to ``schema.empty_table()`` when every block
    is empty.  Caller asserts the collected result is driver-scale (gated
    key sets, stride samples, sketch grids)."""
    import pyarrow as pa
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if tabs:
        return pa.concat_tables(tabs).combine_chunks()
    if schema is not None:
        # accept either a pa.Schema or a typed empty pa.Table exemplar
        if isinstance(schema, pa.Table):
            return schema.schema.empty_table()
        return schema.empty_table()
    return pa.table({})
