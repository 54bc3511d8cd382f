"""Web-crawl curation operators over the Common-Crawl-style pages table.

Host-level statistics are the first thing a crawl-curation pipeline
computes (per-host doc counts, content volume, recency) — the key space
is millions of hosts at 10^12 docs, so the shape is: vectorized host
extraction (RE2, same engine DuckDB uses) + per-batch pyarrow combine,
then ONE hash shuffle of combined partials keyed by host.  No driver
state, no broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: scheme://authority prefix; group 1 = the authority (host[:port]).
#: RE2 syntax on both sides: pyarrow.compute and DuckDB regexp_extract.
HOST_PATTERN = r"^[a-z][a-z0-9+.\-]*://(?P<host>[^/?#]+)"


def extract_host(url: pa.Array) -> pa.Array:
    """Vectorized url -> host; '' when the url has no scheme://authority
    prefix (DuckDB regexp_extract returns '' on no-match — mirror it)."""
    hit = pc.extract_regex(url, HOST_PATTERN)
    host = pc.struct_field(hit, "host")
    return pc.fill_null(host, "")


def host_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combine: one (host, n_docs, sum_chars, max_ts_us) row
    per distinct host in this block (pyarrow C++ group_by)."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "host": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "sum_chars": pa.array([], pa.int64()),
                "max_ts_us": pa.array([], pa.int64()),
            }
        )
    host = extract_host(batch.column("url").combine_chunks())
    chars = pc.cast(pc.utf8_length(batch.column("text")), pa.int64())
    ts = pc.cast(batch.column("warc_ts"), pa.int64())  # micros since epoch
    t = pa.table(
        {
            "host": host,
            "one": np.ones(batch.num_rows, dtype=np.int64),
            "chars": chars,
            "ts": ts,
        }
    )
    g = t.group_by("host").aggregate([("one", "sum"), ("chars", "sum"), ("ts", "max")])
    return g.rename_columns(["host", "n_docs", "sum_chars", "max_ts_us"])


def host_stats(pages_ds):
    """Pages dataset -> per-host stats (host, n_docs, sum_chars, max_ts).

    Shuffle volume = sum over blocks of distinct-hosts-per-block — the
    combined partials, never the documents.
    """
    from ray.data.aggregate import Max, Sum

    partials = pages_ds.map_batches(host_stats_partial, batch_format="pyarrow")
    agg = partials.groupby("host").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
        Max("max_ts_us", alias_name="max_ts_us"),
    )

    def finish(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("max_ts_us"), pa.timestamp("us"))
        return b.drop_columns(["max_ts_us"]).append_column("max_ts", ts)

    return agg.map_batches(finish, batch_format="pyarrow")
