"""Mergeable value-histogram sketch: exact grouped percentiles."""

import numpy as np
import pyarrow as pa


class TestPercentileSketch:
    def test_matches_duckdb_quantile_disc(self, ray_session):
        import duckdb
        import ray.data

        from georay.sketch import grouped_percentiles

        rng = np.random.default_rng(7)
        n = 5000
        t = pa.table({
            "lang": pa.array(rng.choice(["en", "de", "fr"], n)),
            "n_chars": pa.array(rng.integers(1, 400, n), pa.int64()),
        })
        got = (
            grouped_percentiles(ray.data.from_arrow(t).repartition(16),
                                "lang", "n_chars", ps=(0.5, 0.9, 0.99))
            .to_pandas()
        )
        want = duckdb.sql(
            "SELECT lang, p, CAST(q AS BIGINT) AS value FROM ("
            " SELECT lang, 0.5 AS p, quantile_disc(n_chars, 0.5) AS q FROM t GROUP BY lang"
            " UNION ALL SELECT lang, 0.9, quantile_disc(n_chars, 0.9) FROM t GROUP BY lang"
            " UNION ALL SELECT lang, 0.99, quantile_disc(n_chars, 0.99) FROM t GROUP BY lang)"
        ).df()
        g = got.sort_values(["lang", "p"]).reset_index(drop=True)
        w = want.sort_values(["lang", "p"]).reset_index(drop=True)
        assert (g["value"].to_numpy() == w["value"].to_numpy()).all()

    def test_partials_merge_associatively(self):
        from georay.sketch import merge_value_counts, value_count_partial

        a = pa.table({"lang": pa.array(["en", "en", "de"]),
                      "n_chars": pa.array([5, 5, 9], pa.int64())})
        b = pa.table({"lang": pa.array(["en"]), "n_chars": pa.array([5], pa.int64())})
        pa_parts = pa.concat_tables([
            value_count_partial(a, "lang", "n_chars"),
            value_count_partial(b, "lang", "n_chars"),
        ])
        merged = merge_value_counts(pa_parts, "lang", "n_chars").to_pandas()
        m = merged.set_index(["lang", "n_chars"])["n"]
        assert m[("en", 5)] == 3 and m[("de", 9)] == 1

    def test_quantile_disc_boundary(self):
        """smallest value with cum >= ceil(p*n): n=4, p=0.5 -> 2nd value."""
        from georay.sketch import percentiles_from_counts

        h = pa.table({"lang": pa.array(["x"] * 4),
                      "v": pa.array([10, 20, 30, 40], pa.int64()),
                      "n": pa.array([1, 1, 1, 1], pa.int64())})
        out = percentiles_from_counts(h, (0.25, 0.5, 0.9), "lang", "v").to_pandas()
        assert out.set_index("p")["value"].to_dict() == {0.25: 10, 0.5: 20, 0.9: 40}

    def test_nondefault_ps_exact_rank(self, ray_session):
        """Regression (r3 review): float ceil(p*n) drifts one rank high
        for decimals like 0.55 at n=100 — the rank must be computed in
        exact rational arithmetic (DuckDB parity)."""
        import duckdb
        import ray.data

        t = pa.table({"lang": pa.array(["x"] * 100),
                      "n_chars": pa.array(np.arange(1, 101), pa.int64())})
        from georay.sketch import grouped_percentiles

        got = grouped_percentiles(
            ray.data.from_arrow(t), "lang", "n_chars", ps=(0.55, 0.07)
        ).to_pandas().set_index("p")["value"]
        want = duckdb.sql(
            "SELECT quantile_disc(n_chars, 0.55), quantile_disc(n_chars, 0.07) FROM t"
        ).fetchone()
        assert got[0.55] == want[0] == 55
        assert got[0.07] == want[1] == 7

    def test_all_null_group_omitted_not_crashed(self, ray_session):
        import ray.data

        from georay.sketch import grouped_percentiles

        t = pa.table({"lang": pa.array(["en", "en", "xx"]),
                      "n_chars": pa.array([5, 7, None], pa.int64())})
        out = grouped_percentiles(ray.data.from_arrow(t), "lang", "n_chars",
                                  ps=(0.5,)).to_pandas()
        assert set(out.lang) == {"en"}  # all-NULL group omitted, no crash

    def test_empty_corpus_keeps_schema(self, ray_session):
        import ray.data

        from georay.sketch import grouped_percentiles

        t = pa.table({"lang": pa.array([], pa.string()),
                      "n_chars": pa.array([], pa.int64())})
        out = grouped_percentiles(ray.data.from_arrow(t), "lang", "n_chars")
        assert out.schema().names == ["lang", "p", "value"]
        assert out.count() == 0
