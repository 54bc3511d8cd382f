"""ISO-19108 / Allen relation kernels (time/ package tests)."""

import numpy as np
import pytest

from georay.temporal import (
    AFTER,
    BEFORE,
    BEGINS,
    CONTAINS,
    DURING,
    ENDED_BY,
    EQUALS,
    HOUR_US,
    MEETS,
    MET_BY,
    OVERLAPS,
    assert_temporal_relation,
    relative_position,
    split_interval,
    temporal_compare,
    temporal_extent,
)


def instant(t):
    return t, t


class TestRelativePosition:
    def test_all_13_relations(self):
        # (b1, e1, b2, e2, expected)
        cases = [
            (0, 10, 20, 30, BEFORE),
            (20, 30, 0, 10, AFTER),
            (0, 10, 0, 20, BEGINS),
            (0, 20, 0, 10, "BEGUN_BY"),
            (0, 30, 10, 20, CONTAINS),
            (10, 20, 0, 30, DURING),
            (5, 15, 5, 15, EQUALS),
            (0, 10, 10, 20, MEETS),
            (10, 20, 0, 10, MET_BY),
            (0, 15, 10, 30, OVERLAPS),
            (10, 30, 0, 15, "OVERLAPPED_BY"),
            (10, 20, 0, 20, "ENDS"),
            (0, 20, 10, 20, ENDED_BY),
        ]
        from georay import temporal as T

        for b1, e1, b2, e2, want in cases:
            code = want if isinstance(want, int) else getattr(T, want)
            assert relative_position(b1, e1, b2, e2) == code, (b1, e1, b2, e2)

    def test_instant_during_period(self):
        # VerifyTemporalUtils instant-during-period case
        assert relative_position(*instant(15), 10, 20) == DURING

    def test_assert_temporal_relation(self):
        assert_temporal_relation("BEFORE", 0, 10, 20, 30)
        with pytest.raises(AssertionError):
            assert_temporal_relation("AFTER", 0, 10, 20, 30)


class TestComparator:
    # VerifyTemporalComparator: period ordering signs
    def test_before_negative(self):
        assert temporal_compare(0, 10, 20, 30) == -1

    def test_after_positive(self):
        assert temporal_compare(20, 30, 0, 10) == 1

    def test_overlaps_meets_contains_negative(self):
        assert temporal_compare(0, 15, 10, 30) == -1  # OVERLAPS
        assert temporal_compare(0, 10, 10, 20) == -1  # MEETS
        assert temporal_compare(0, 30, 10, 20) == -1  # CONTAINS

    def test_during_equals_zero(self):
        assert temporal_compare(10, 20, 0, 30) == 0
        assert temporal_compare(5, 15, 5, 15) == 0


class TestExtentAndSplit:
    def test_extent_padded_one_hour(self):
        # TemporalUtils.java:110,123: +/- 1 hour pad
        b, e = temporal_extent([100 * HOUR_US, 50 * HOUR_US], [200 * HOUR_US, 60 * HOUR_US])
        assert b == 49 * HOUR_US
        assert e == 201 * HOUR_US

    def test_extent_empty_raises(self):
        with pytest.raises(ValueError):
            temporal_extent([], [])

    def test_split_interval_meets(self):
        # VerifyTemporalUtils.java:130-131: sub-interval n MEETS n+1
        parts = split_interval(0, 100, 2)
        assert parts.shape == (2, 2)
        assert relative_position(parts[0, 0], parts[0, 1], parts[1, 0], parts[1, 1]) == MEETS

    def test_split_covers_range_with_truncation(self):
        parts = split_interval(0, 10, 3)  # duration 3 each, ends at 9
        assert parts[-1, 1] == 9
        assert (np.diff(parts[:, 0]) == 3).all()


class TestFormatter:
    def test_instant_and_period_strings(self):
        from georay.temporal import format_primitive

        assert format_primitive(0, 0) == "Instant: 1970-01-01T00:00:00.000000"
        s = format_primitive(0, 3_600_000_000)
        assert s.startswith("Period: 1970-01-01T00:00:00") and "/" in s


class TestBoundaryInstants:
    """Degenerate operands on period boundaries resolve to the begin/end
    relations, not MEETS/MET_BY (code-review finding; ISO 19108)."""

    def test_instant_at_period_begin_is_begins(self):
        from georay.temporal import BEGINS, BEGUN_BY, ENDS, ENDED_BY, relative_position

        assert relative_position(10, 10, 10, 20) == BEGINS
        assert relative_position(10, 20, 10, 10) == BEGUN_BY
        assert relative_position(20, 20, 10, 20) == ENDS
        assert relative_position(10, 20, 20, 20) == ENDED_BY

    def test_proper_period_meets_unchanged(self):
        from georay.temporal import MEETS, MET_BY, relative_position

        assert relative_position(0, 10, 10, 20) == MEETS
        assert relative_position(10, 20, 0, 10) == MET_BY
