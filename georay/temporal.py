"""Temporal kernels: ISO-19108 / Allen interval relations (time/ package).

Primitives are (t_begin, t_end) int64 microsecond pairs; an *instant* has
t_begin == t_end (T-01 parse maps ``warc_ts`` here).  All relation kernels
are vectorized comparisons suitable for time-windowed join filters
(SURVEY.md §2.6 T-02) inside ``map_batches``.

Reference semantics:
- ``TemporalUtils.assertTemporalRelation`` (TemporalUtils.java:57-66) —
  the 13 ISO-19108 relative positions.
- ``TemporalComparator.compare`` (TemporalComparator.java:13-40) — the
  total-order projection used for TreeSet ordering.
- ``TemporalUtils.temporalExtent`` (TemporalUtils.java:97-125) — min/max
  over an ordered set, padded +/-1 hour, with the instant-DURING-period
  special case.
- ``TemporalUtils.splitInterval`` (TemporalUtils.java:150-164) — N
  contiguous sub-intervals (n MEETS n+1): the engine's time-partition
  boundary generator (T-06).
"""

from __future__ import annotations

import numpy as np

HOUR_US = 3_600_000_000

# relation codes (stable ints for vectorized compare)
BEFORE, AFTER, BEGINS, BEGUN_BY, CONTAINS, DURING, EQUALS, MEETS, MET_BY, OVERLAPS, OVERLAPPED_BY, ENDS, ENDED_BY = range(13)

RELATION_NAMES = [
    "BEFORE", "AFTER", "BEGINS", "BEGUN_BY", "CONTAINS", "DURING", "EQUALS",
    "MEETS", "MET_BY", "OVERLAPS", "OVERLAPPED_BY", "ENDS", "ENDED_BY",
]
_NAME_TO_CODE = {n: i for i, n in enumerate(RELATION_NAMES)}


def relative_position(b1, e1, b2, e2) -> np.ndarray:
    """Vectorized ISO-19108 relativePosition(t1, t2) -> int8 codes.

    Instants are degenerate periods (begin == end); the case analysis
    reduces to begin/end comparisons (same outcomes as SIS's
    DefaultPeriod/DefaultInstant relativePosition()).
    """
    b1 = np.asarray(b1, dtype=np.int64)
    e1 = np.asarray(e1, dtype=np.int64)
    b2 = np.asarray(b2, dtype=np.int64)
    e2 = np.asarray(e2, dtype=np.int64)
    b1, e1, b2, e2 = np.broadcast_arrays(b1, e1, b2, e2)
    out = np.full(b1.shape, -1, dtype=np.int8)

    eq = (b1 == b2) & (e1 == e2)
    out[eq] = EQUALS
    m = (~eq) & (e1 < b2)
    out[m] = BEFORE
    m = (out == -1) & (b1 > e2)
    out[m] = AFTER
    # boundary-coincidence ordering: the begin/end-sharing relations must
    # be classified BEFORE MEETS/MET_BY — for a degenerate operand (an
    # instant sitting exactly on a period boundary) both conditions hold
    # and ISO 19108 / Geotk resolve to BEGINS/ENDS/BEGUN_BY/ENDED_BY, not
    # the meet relations (for proper periods the cases are disjoint).
    m = (out == -1) & (b1 == b2) & (e1 < e2)
    out[m] = BEGINS
    m = (out == -1) & (b1 == b2) & (e1 > e2)
    out[m] = BEGUN_BY
    m = (out == -1) & (e1 == e2) & (b1 > b2)
    out[m] = ENDS
    m = (out == -1) & (e1 == e2) & (b1 < b2)
    out[m] = ENDED_BY
    m = (out == -1) & (e1 == b2)
    out[m] = MEETS
    m = (out == -1) & (b1 == e2)
    out[m] = MET_BY
    m = (out == -1) & (b1 > b2) & (e1 < e2)
    out[m] = DURING
    m = (out == -1) & (b1 < b2) & (e1 > e2)
    out[m] = CONTAINS
    m = (out == -1) & (b1 < b2) & (e1 > b2) & (e1 < e2)
    out[m] = OVERLAPS
    m = (out == -1) & (b1 > b2) & (b1 < e2) & (e1 > e2)
    out[m] = OVERLAPPED_BY
    return out


def assert_temporal_relation(expected: str, b1, e1, b2, e2) -> None:
    """T-02: raise AssertionError when relativePosition != expected."""
    rel = relative_position(b1, e1, b2, e2)
    want = _NAME_TO_CODE[expected.upper()]
    if not np.all(rel == want):
        bad = RELATION_NAMES[int(rel.flat[int(np.argmax(rel != want))])]
        raise AssertionError(f"t1 is not related to t2: {expected}. Actual: {bad}")


def temporal_compare(b1, e1, b2, e2) -> np.ndarray:
    """T-03 total-order projection: DURING/EQUALS -> 0;
    OVERLAPS/MEETS/CONTAINS/BEFORE -> -1; MET_BY/AFTER -> +1; else 0."""
    rel = relative_position(b1, e1, b2, e2)
    out = np.zeros(rel.shape, dtype=np.int8)
    out[np.isin(rel, (OVERLAPS, MEETS, CONTAINS, BEFORE))] = -1
    out[np.isin(rel, (MET_BY, AFTER))] = 1
    return out


def temporal_extent(begins, ends):
    """T-04: (min_begin - 1h, max_end + 1h) over a primitive set.

    The reference walks a TreeSet ordered by :func:`temporal_compare` and
    takes first.begin / last.end with an instant-DURING-first-period
    patch-up (TemporalUtils.java:110-123); over microsecond columns the
    result is exactly the padded global min/max, computed here as a
    partial+final-friendly reduction.
    """
    begins = np.asarray(begins, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    if begins.size == 0:
        raise ValueError("Empty temporal primitive set")
    return int(begins.min()) - HOUR_US, int(ends.max()) + HOUR_US


def add_us(ts, amount_us):
    """T-05 instant arithmetic (microseconds)."""
    return np.asarray(ts, dtype=np.int64) + np.int64(amount_us)


def format_primitive(begin_us: int, end_us: int) -> str:
    """Condensed ISO-8601 display form
    (TemporalUtils.temporalGeometricPrimitiveToString): 'Instant: T' for
    degenerate periods, else 'Period: T1/T2'."""
    b = np.datetime64(int(begin_us), "us")
    e = np.datetime64(int(end_us), "us")
    if begin_us == end_us:
        return f"Instant: {b}"
    return f"Period: {b}/{e}"


def split_interval(begin_us: int, end_us: int, size: int):
    """T-06: split [begin, end) into ``size`` contiguous sub-intervals;
    interval n MEETS n+1.  Duration division truncates like
    java.time.Duration.dividedBy, so the final sub-interval may end
    slightly before ``end_us`` (reference behavior).  Used as the
    time-range shard-boundary generator."""
    if size < 1:
        raise ValueError("size must be >= 1")
    dur = (int(end_us) - int(begin_us)) // int(size)
    starts = np.int64(begin_us) + dur * np.arange(size, dtype=np.int64)
    return np.column_stack([starts, starts + dur])
