"""CLI entry point: ``python -m georay <command>`` (ray-job-submit friendly).

Commands:
  flagship   run the end-to-end spatial pipeline and write outputs
  resume     checkpointed flagship over an input directory (skips finished
             partitions — the north_rule resumability path)
  dedup      near-dup dedup: candidates -> verify -> resolve -> survivors
  bench      alias for the repo-root bench harness

Owns its Ray session (scripts only — the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False)
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    return ray


def cmd_flagship(args):
    ray = _init_ray(args.num_cpus)
    from georay.pipelines.flagship import flagship

    joined, agg = flagship(
        args.sf_dir, res=args.res, predicate=args.predicate, out_dir=args.out
    )
    print(json.dumps({"join_rows": joined.count(), "cells": agg.count(), "out": args.out}))
    ray.shutdown()


def cmd_resume(args):
    ray = _init_ray(args.num_cpus)
    from georay.pipelines.pages import synthesize_pages_batch
    from georay.pipelines.polygons import polygon_payload
    from georay.stages.geo import Reproject, cellize, extract_geo_batch, filter_has_geo
    from georay.stages.join import make_spatial_join_fn

    payload_ref = ray.put(polygon_payload())

    def build(files):
        import ray.data

        ds = ray.data.read_parquet(files)
        if args.synthesize:
            ds = ds.map_batches(synthesize_pages_batch, batch_format="pyarrow")
        ds = (
            ds.map_batches(lambda b: extract_geo_batch(b, keep_text=False), batch_format="pyarrow")
            .map_batches(filter_has_geo, batch_format="pyarrow")
            .map_batches(Reproject(4326), batch_format="pyarrow")
            .map_batches(lambda b: cellize(b, args.res), batch_format="pyarrow")
        )
        return ds.map_batches(make_spatial_join_fn(payload_ref, args.predicate), batch_format="pyarrow")

    from georay.state.checkpoint import resumable_run

    if os.path.isfile(args.input):
        files = [args.input]
    else:
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        # a silent 0-partition "success" would look like a finished run
        print(f"error: no parquet files found under {args.input!r}", file=sys.stderr)
        ray.shutdown()
        sys.exit(2)
    stats = resumable_run(files, args.out, build, group_size=args.group_size)
    print(json.dumps(stats))
    ray.shutdown()


def cmd_dedup(args):
    """End-to-end near-dup dedup over a documents parquet: MinHash+LSH
    candidates -> exact integer-Jaccard verification -> connected-
    components resolution -> LEFT ANTI survivor filter -> partitioned
    survivors parquet (+ the resolution table for audit)."""
    ray = _init_ray(args.num_cpus)
    import ray.data

    from georay.dedup import (
        apply_dedup,
        band_bucket_pairs,
        connected_components,
        jaccard_verify_pairs,
        minhash_band_batch,
    )

    import pyarrow as pa

    docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    banded = docs.map_batches(minhash_band_batch, batch_format="pyarrow")
    cand = band_bucket_pairs(banded).materialize()
    # surface partial-recall loudly: hot-bucket truncation/thinning flags
    # (and join-mode marker rows) would otherwise vanish in the verify
    # join and the CLI would print a clean success over incomplete dedup
    n_trunc = cand.map_batches(
        lambda b: pa.table({"t": b.column("truncated").cast(pa.int32())}),
        batch_format="pyarrow",
    ).sum("t") or 0
    if n_trunc:
        print(
            f"warning: {n_trunc} candidate rows flagged truncated — near-dup "
            "recall is partial for oversized clusters (raise max_bucket)",
            file=sys.stderr,
        )

    def real_pairs(b):
        if b.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        b = b.filter(pa.compute.greater_equal(b.column("doc_a"), 0))
        return b.select(["doc_a", "doc_b"])

    verified = jaccard_verify_pairs(
        cand.map_batches(real_pairs, batch_format="pyarrow"), docs, k=3,
        threshold_num=args.threshold_num, threshold_den=args.threshold_den,
    )
    resolution = connected_components(verified).materialize()
    full_docs = ray.data.read_parquet(args.input)
    n_docs = full_docs.count()  # parquet metadata count — no scan
    survivors = apply_dedup(full_docs, resolution).materialize()
    resolution.write_parquet(os.path.join(args.out, "resolution"))
    survivors.write_parquet(os.path.join(args.out, "survivors"))
    n_out = survivors.count()
    print(json.dumps({
        "input_docs": n_docs,
        "clustered_docs": resolution.count(),
        "survivors": n_out,
        "dropped": n_docs - n_out,
        "truncated_candidates": int(n_trunc),
        "out": args.out,
    }))
    ray.shutdown()


def cmd_curate(args):
    """Training-data curation in ONE streaming pass: annotate (quality
    score + language ID, fused kernels) -> threshold/language filter ->
    exact content dedup (128-bit key, min-doc_id survivor) -> per-language
    deterministic stratified sample -> survivors parquet partitioned by
    detected language.

    Scale shape: the only shuffles are the 16-byte dedup-key groupby and
    the survivor-id join; everything else is stateless map_batches.  The
    sample decision is a pure hash of doc_id (re-run stable), so a
    resumed/repeated run selects identical documents."""
    ray = _init_ray(args.num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data
    from ray.data.aggregate import Min

    from georay.dedup import text_key_batch
    from georay.sample import stratified_sample_batch
    from georay.text import detect_language, quality_batch

    docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    n_in = docs.count()  # parquet metadata, no scan

    langs = set(args.langs.split(",")) if args.langs else None
    lang_arr = pa.array(sorted(langs)) if langs else None
    min_q, min_t = args.min_quality_bp, args.min_tokens

    def annotate_filter(b: pa.Table) -> pa.Table:
        q = quality_batch(b)
        lang = detect_language(b.column("text").combine_chunks())
        b = b.append_column("quality_bp", q.column("quality_bp"))
        b = b.append_column("n_tokens", q.column("n_tokens"))
        b = b.append_column("lang_pred", pa.array(lang, pa.string()))
        m = pc.and_(
            pc.greater_equal(b.column("quality_bp"), min_q),
            pc.greater_equal(b.column("n_tokens"), min_t),
        )
        if lang_arr is not None:
            m = pc.and_(m, pc.is_in(b.column("lang_pred"), value_set=lang_arr))
        b = b.filter(m)
        k = text_key_batch(b)
        b = b.append_column("h1", k.column("h1"))
        return b.append_column("h2", k.column("h2"))

    filt = docs.map_batches(annotate_filter, batch_format="pyarrow")

    # The DAG branches below (survivor groupby + join left side) — without
    # a checkpoint each consumer re-executes quality/langid/hash over the
    # full corpus.  Write the annotated rows through parquet ONCE
    # (streaming, disk-backed — the flagship's geo_cache="spill" shape;
    # an in-object-store materialize would pin the whole filtered corpus).
    import shutil
    import tempfile

    ann_dir = tempfile.mkdtemp(prefix="georay-curate-annotated-")
    filt.write_parquet(ann_dir)
    filt = ray.data.read_parquet(ann_dir)

    # exact dedup: survivor ids from a 16-byte-key groupby, then a semi
    # join back (the full rows never shuffle through the key groupby)
    survivors = (
        filt.map_batches(lambda b: b.select(["h1", "h2", "doc_id"]), batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id", alias_name="keep_id"))
        .map_batches(lambda b: b.select(["keep_id"]), batch_format="pyarrow")
    )
    from georay.dedup import _cluster_partitions

    # the semi join shuffles the full annotated corpus: size partitions
    # to its measured rows (filt is a fresh parquet read of the
    # checkpoint, so the count is free plan metadata), not a fixed 16
    n_part = args.num_partitions or _cluster_partitions(cap=64, ds=filt)
    deduped = filt.join(
        survivors, join_type="inner", num_partitions=n_part,
        on=("doc_id",), right_on=("keep_id",),
    )

    sampled = deduped.map_batches(
        lambda b: stratified_sample_batch(
            b, rates_bp={}, default_bp=args.rate_bp, key_col="lang_pred"
        ),
        batch_format="pyarrow",
    )
    sampled.write_parquet(args.out, partition_cols=["lang_pred"])
    shutil.rmtree(ann_dir, ignore_errors=True)

    out_ds = ray.data.read_parquet(args.out)
    n_out = out_ds.count()
    per_lang = {}
    for row in out_ds.groupby("lang_pred").count().take_all():
        per_lang[row["lang_pred"]] = row["count()"]
    print(json.dumps({
        "input_docs": n_in,
        "survivors": n_out,
        "per_lang": per_lang,
        "min_quality_bp": min_q,
        "min_tokens": min_t,
        "rate_bp": args.rate_bp,
        "out": args.out,
    }))
    ray.shutdown()


def cmd_pack(args):
    """Sequence-packing index over a curated corpus: the distributed
    exclusive token prefix-scan (georay.pack) written as parquet
    partitioned by training-sequence bin RANGE (bin // bins_per_file),
    so a downstream tokenizer/packer reads one file per contiguous
    sequence range and a failed run resumes per partition."""
    ray = _init_ray(args.num_cpus)
    import pyarrow as pa

    import ray.data

    from georay.pack import pack_sequences

    docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    packed = pack_sequences(docs, seq_len=args.seq_len)

    bpf = args.bins_per_file

    def add_range(b: pa.Table) -> pa.Table:
        import numpy as np

        r = b.column("bin").to_numpy(zero_copy_only=False) // bpf
        return b.append_column("bin_range", pa.array(r, pa.int64()))

    packed.map_batches(add_range, batch_format="pyarrow").write_parquet(
        args.out, partition_cols=["bin_range"]
    )
    out_ds = ray.data.read_parquet(args.out)
    n = out_ds.count()
    n_bins = out_ds.max("bin")
    total = out_ds.sum("n_tokens")
    print(json.dumps({
        "docs": n,
        "total_tokens": int(total) if total is not None else 0,
        "seq_len": args.seq_len,
        "sequences": (int(n_bins) + 1) if n_bins is not None else 0,
        "out": args.out,
    }))
    ray.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="georay")
    sub = ap.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="end-to-end spatial pipeline")
    f.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    f.add_argument("--out", default=None)
    f.add_argument("--res", type=int, default=7)
    f.add_argument("--predicate", default="INTERSECTS")
    f.add_argument("--num-cpus", type=int, default=None)
    f.set_defaults(fn=cmd_flagship)

    r = sub.add_parser("resume", help="checkpointed run over an input dir")
    r.add_argument("--input", required=True, help="directory of input parquet files")
    r.add_argument("--out", required=True)
    r.add_argument("--res", type=int, default=7)
    r.add_argument("--predicate", default="INTERSECTS")
    r.add_argument("--group-size", type=int, default=8)
    r.add_argument("--synthesize", action="store_true", help="input is a documents table; synthesize pages")
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_resume)

    d = sub.add_parser("dedup", help="near-dup dedup: candidates -> verify -> resolve -> survivors")
    d.add_argument("--input", required=True, help="documents parquet (file or directory)")
    d.add_argument("--out", required=True)
    d.add_argument("--threshold-num", type=int, default=1)
    d.add_argument("--threshold-den", type=int, default=2, help="keep pairs with Jaccard >= num/den")
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    b = sub.add_parser("bench", help="run the repo bench harness (same flags as bench.py)")
    b.add_argument("rest", nargs=argparse.REMAINDER)
    def cmd_bench(args):
        import runpy
        import sys as _sys

        _sys.argv = ["bench.py"] + [a for a in args.rest if a != "--"]
        runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"), run_name="__main__")
    b.set_defaults(fn=cmd_bench)

    c = sub.add_parser(
        "curate",
        help="training-data curation: quality/lang filter -> exact dedup -> stratified sample",
    )
    c.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    c.add_argument("--out", required=True)
    c.add_argument("--min-quality-bp", type=int, default=4000,
                   help="drop docs scoring below this (basis points, 0-10000)")
    c.add_argument("--min-tokens", type=int, default=5)
    c.add_argument("--langs", default=None,
                   help="comma list of detected languages to keep (default: all)")
    c.add_argument("--rate-bp", type=int, default=10000,
                   help="per-language keep rate in basis points (10000 = keep all)")
    c.add_argument("--num-partitions", type=int, default=None,
                   help="semi-join partitions; default sizes to corpus rows + cluster")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_curate)

    pk = sub.add_parser(
        "pack",
        help="sequence-packing index: global token offsets + training bins",
    )
    pk.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    pk.add_argument("--out", required=True)
    pk.add_argument("--seq-len", type=int, default=2048)
    pk.add_argument("--bins-per-file", type=int, default=1024,
                    help="training-sequence bins per output partition")
    pk.add_argument("--num-cpus", type=int, default=None)
    pk.set_defaults(fn=cmd_pack)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
