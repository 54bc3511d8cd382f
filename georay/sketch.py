"""Mergeable value-histogram sketch -> exact distributed percentiles.

The mandate's custom-operator list names "a novel sketch" as an
engine-level family: this is the simplest production-grade instance —
per-block value histograms are ASSOCIATIVE, COMMUTATIVE partials
(exactly like the per-cell envelope partials in stages/aggregate.py),
so a percentile query over 10^12 rows moves only
``#blocks × distinct-values-per-block`` histogram rows through a tree
merge instead of sorting the corpus.  For INTEGER-valued columns
(lengths, counts, ages-in-days) the result is EXACT — decided in
integer arithmetic, so the DuckDB ``quantile_disc`` oracle matches
bit-for-bit.  For unbounded/continuous domains, quantize first (the
histogram then yields quantile bounds at quantization resolution);
that trade-off is the caller's, stated here rather than hidden.

quantile_disc parity (verified empirically): the p-quantile of n values
is the smallest value whose cumulative count reaches ``ceil(p * n)``.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _group_type(batch: pa.Table, group_col: str) -> pa.DataType:
    """Typed-empty guards must carry the INPUT's group-column type — a
    hard-coded pa.string() yields schema-mismatched empty blocks for
    integer-keyed groups (r3 advisor finding)."""
    idx = batch.schema.get_field_index(group_col)
    return batch.schema.field(idx).type if idx >= 0 else pa.string()


def value_count_partial(batch: pa.Table, group_col: str, value_col: str) -> pa.Table:
    """Per-batch combine: one (group, value, n) row per distinct pair
    (pyarrow C++ group_by) — the mergeable sketch partial.  NULL values
    are excluded (SQL aggregate semantics); a group whose values are all
    NULL therefore emits NO output row (where SQL would emit a NULL
    quantile) — documented divergence."""
    if batch.num_rows == 0:
        return pa.table(
            {group_col: pa.array([], _group_type(batch, group_col)),
             value_col: pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    t = batch.select([group_col, value_col])
    t = t.filter(pc.is_valid(t.column(value_col)))
    if t.num_rows == 0:
        return pa.table(
            {group_col: pa.array([], _group_type(batch, group_col)),
             value_col: pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    g = t.group_by([group_col, value_col]).aggregate([(value_col, "count")])
    return g.rename_columns([group_col, value_col, "n"])


def merge_value_counts(batch: pa.Table, group_col: str, value_col: str) -> pa.Table:
    """Associative+commutative merge of histogram partials."""
    if batch.num_rows == 0:
        return pa.table(
            {group_col: pa.array([], _group_type(batch, group_col)),
             value_col: pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    g = batch.group_by([group_col, value_col]).aggregate([("n", "sum")])
    return g.rename_columns([group_col, value_col, "n"])


def percentiles_from_counts(batch: pa.Table, ps, group_col: str, value_col: str) -> pa.Table:
    """Final kernel over the fully-merged histogram (one small block):
    per group, sort by value, cumulative-sum, and for each p pick the
    smallest value whose cumulative count >= ceil(p * n) — exact
    quantile_disc semantics."""
    if batch.num_rows == 0:
        return pa.table(
            {group_col: pa.array([], _group_type(batch, group_col)),
             "p": pa.array([], pa.float64()),
             "value": pa.array([], pa.int64())}
        )
    gtype = _group_type(batch, group_col)
    df = batch.to_pandas().sort_values([group_col, value_col], kind="stable")
    out_g, out_p, out_v = [], [], []
    for g, sub in df.groupby(group_col, sort=False):
        vals = sub[value_col].to_numpy()
        cum = sub["n"].to_numpy().cumsum()
        n = int(cum[-1])
        for p in ps:
            # rank in EXACT rational arithmetic: float ceil(p*n) lands one
            # rank high whenever p*n is exactly representable as an
            # integer in decimal but not in binary (0.55*100 ->
            # 55.000000000000007 -> ceil 56; DuckDB returns rank 55)
            k = math.ceil(Fraction(str(p)) * n)
            v = vals[int(np.searchsorted(cum, k, side="left"))]
            out_g.append(g)
            out_p.append(float(p))
            out_v.append(int(v))
    return pa.table(
        {group_col: pa.array(out_g, gtype),
         "p": pa.array(out_p, pa.float64()),
         "value": pa.array(out_v, pa.int64())}
    )


def grouped_percentiles(ds, group_col: str, value_col: str,
                        ps=(0.5, 0.9, 0.99), fanout: int = 8):
    """Dataset -> (group, p, value) exact percentiles via the histogram
    tree: per-block partial, coalesce-merge, one tiny final kernel.  The
    only data movement is two repartitions of already-combined
    histograms (rows bounded by groups × distinct values, NOT corpus
    rows) — which is also the LIMIT of this operator: the merged
    histogram must fit one task, so groups × distinct values should stay
    ≤ a few million (quantize wide domains first).  The merged histogram
    is materialized (it is the small result by design), which also pins
    the output schema on an all-empty corpus (Ray skips UDFs on empty
    blocks, so lazy typed-empty guards can never run there)."""
    from georay.stages.aggregate import tree_merge

    h = ds.map_batches(
        lambda b: value_count_partial(b, group_col, value_col),
        batch_format="pyarrow", batch_size=None,
    )
    merged = tree_merge(
        h, lambda b: merge_value_counts(b, group_col, value_col), fanout=fanout
    ).materialize()
    if merged.count() == 0:
        import ray.data as _rd

        # derive the group-column type from the INPUT schema (the merged
        # empty dataset may be schemaless — Ray skipped every UDF)
        gtype = pa.string()
        sch = ds.schema(fetch_if_missing=True)
        if sch is not None and group_col in sch.names:
            gtype = dict(zip(sch.names, sch.types))[group_col]
        return _rd.from_arrow(
            pa.table({group_col: pa.array([], gtype),
                      "p": pa.array([], pa.float64()),
                      "value": pa.array([], pa.int64())})
        )
    return merged.map_batches(
        lambda b: percentiles_from_counts(b, ps, group_col, value_col),
        batch_format="pyarrow", batch_size=None,
    )
