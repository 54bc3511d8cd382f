"""`python -m georay curate` — the end-to-end training-data curation CLI."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def test_curate_cli(tmp_path):
    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable, "-m", "georay", "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--min-quality-bp", "3000",
            "--min-tokens", "5",
            "--langs", "en,de,fr,es,zh",
            "--rate-bp", "8000",
            "--num-cpus", "4",
        ],
        capture_output=True, text=True, timeout=280,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["input_docs"] == 500
    assert 0 < stats["survivors"] < 500
    assert sum(stats["per_lang"].values()) == stats["survivors"]
    # partitioned-by-language hive layout on disk
    parts = [d for d in os.listdir(out) if d.startswith("lang_pred=")]
    assert parts, os.listdir(out)
    # survivors are exact-deduped: no two rows share identical text
    t = pq.read_table(out, columns=["text"])
    texts = t.column("text").to_pylist()
    assert len(texts) == len(set(texts)) == stats["survivors"]


def test_pack_cli(tmp_path):
    import duckdb

    out = str(tmp_path / "packed")
    proc = subprocess.run(
        [
            sys.executable, "-m", "georay", "pack",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--seq-len", "512",
            "--bins-per-file", "64",
            "--num-cpus", "4",
        ],
        capture_output=True, text=True, timeout=280,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["docs"] == 500
    # offsets reconstruct the serial scan exactly
    got = duckdb.sql(
        f"SELECT doc_id, n_tokens, tok_offset FROM read_parquet('{out}/**/*.parquet') ORDER BY doc_id"
    ).df()
    want = duckdb.sql(
        "SELECT doc_id, "
        "  length(regexp_extract_all(text, '\\S+')) AS n_tokens, "
        "  CAST(COALESCE(SUM(length(regexp_extract_all(text, '\\S+'))) OVER ("
        "    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset "
        "FROM read_parquet('/root/testdata/sf0.001/documents.parquet') ORDER BY doc_id"
    ).df()
    assert (got.values == want.values).all()
    # partitioned by bin range: more than one partition directory
    assert len([d for d in os.listdir(out) if d.startswith("bin_range=")]) >= 1
