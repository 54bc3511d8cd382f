"""Event-stream custom operators: gap sessionization and as-of join.

The reference has no streaming operators (SURVEY.md §2.9); these are the
engine-level windowed operators the driver mandate names as custom-op
examples (windowed aggregate, as-of join).  Both follow the documented
partitioning assumption: rows are hash-partitioned by ``user_id``
(`groupby(...).map_groups`), so each group's window logic is local and
vectorized; no ordering assumptions cross partition boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def sessionize_group(g: pd.DataFrame, gap_us: int = GAP_US) -> pd.DataFrame:
    """One user's events -> session rows (user_id, session_idx, n_events,
    t_start, t_end).  Session boundary: gap > ``gap_us`` between
    consecutive events ordered by (ts, event_id)."""
    g = g.sort_values(["ts", "event_id"], kind="stable")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    new_sess = np.ones(len(g), dtype=np.int64)
    if len(ts) > 1:
        new_sess[1:] = (np.diff(ts) > gap_us).astype(np.int64)
    session_idx = np.cumsum(new_sess)
    out = pd.DataFrame(
        {
            "user_id": g["user_id"].to_numpy(),
            "session_idx": session_idx,
            "ts": g["ts"].to_numpy(),
        }
    )
    agg = out.groupby(["user_id", "session_idx"], sort=True).agg(
        n_events=("ts", "size"), t_start=("ts", "min"), t_end=("ts", "max")
    )
    return agg.reset_index()


def asof_purchase_group(g: pd.DataFrame) -> pd.DataFrame:
    """As-of join within one user: for every event, the timestamp of the
    most recent STRICTLY-earlier 'purchase' event (NaT when none).
    Strict inequality keeps the result independent of peer ordering at
    equal timestamps (deterministic vs the SQL oracle)."""
    g = g.sort_values(["ts", "event_id"], kind="stable")
    ts = g["ts"].to_numpy().astype("datetime64[us]")
    purch_ts = np.sort(g.loc[g["event_type"] == "purchase", "ts"].to_numpy().astype("datetime64[us]"))
    idx = np.searchsorted(purch_ts, ts, side="left") - 1
    last = np.full(len(g), np.datetime64("NaT", "us"))
    has = idx >= 0
    last[has] = purch_ts[idx[has]]
    return pd.DataFrame({"event_id": g["event_id"].to_numpy(), "last_purchase": last})


def sessionize(ds, gap_us: int = GAP_US):
    """Dataset of events -> per-user-session aggregate rows."""
    return ds.groupby("user_id").map_groups(
        lambda g: sessionize_group(g, gap_us), batch_format="pandas"
    )


def asof_purchase(ds):
    """Dataset of events -> (event_id, last_purchase) as-of join rows."""
    return ds.groupby("user_id").map_groups(asof_purchase_group, batch_format="pandas")
