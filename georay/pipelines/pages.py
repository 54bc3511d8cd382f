"""Deterministic Common-Crawl-style page synthesis (BASELINE.json input_hint).

The driver test tables carry no web pages, so the engine synthesizes its
input table ``(url, warc_ts, html, text, lang)`` deterministically from
``documents.parquet`` — pure integer arithmetic on ``doc_id`` that the
DuckDB oracles reproduce verbatim (no external data, no RNG):

    lon = CAST(printf('%.2f', ((doc_id*7919)  % 36000)/100.0 - 180.0) AS DOUBLE)
    lat = CAST(printf('%.2f', ((doc_id*104729)% 17000)/100.0 -  85.0) AS DOUBLE)
    has_geo   : doc_id % 10 <> 7
    embed mode: doc_id % 3  -> 0: <meta geo.position>  1: <meta ICBM>
                              2: plain-text "geo: LAT, LON" in the body
    warc_ts   = TIMESTAMP '2024-01-01' + (doc_id*1337 % 31536000) seconds
    url       = 'https://' || lang || '.example.org/doc/' || doc_id

The printf round-trip makes the float the ENGINE parses out of the page
bit-identical to the float the ORACLE computes arithmetically, so value
hashes match exactly.  The page ``text`` is the documents row's text,
byte-identical (the per-url invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch microseconds
YEAR_SECONDS = 31_536_000

_TEMPLATES = {
    0: (
        '<html><head><meta name="geo.position" content="{lat};{lon}">'
        '<meta name="geo.srsName" content="urn:ogc:def:crs:EPSG::4326">'
        "</head><body>{text}</body></html>"
    ),
    # http-URI srsName form exercises the R-07/R-08 identifier kernels in
    # the extraction chain (resolves to the same EPSG:4326)
    1: (
        '<html><head><meta name="ICBM" content="{lat}, {lon}">'
        '<meta name="geo.srsName" content="http://www.opengis.net/def/crs/EPSG/0/4326">'
        "</head><body>{text}</body></html>"
    ),
    2: "<html><head></head><body>{text}\ngeo: {lat}, {lon}</body></html>",
}
_NOGEO = "<html><head></head><body>{text}</body></html>"


def synth_lonlat(doc_id: np.ndarray):
    """doc_id -> (lon, lat) doubles after the printf('%.2f') round-trip."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    lon_raw = (doc_id * 7919) % 36000 / 100.0 - 180.0
    lat_raw = (doc_id * 104729) % 17000 / 100.0 - 85.0
    lon = np.array([float(f"{v:.2f}") for v in lon_raw])
    lat = np.array([float(f"{v:.2f}") for v in lat_raw])
    return lon, lat


def synthesize_pages_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents batch -> PAGES-schema batch."""
    doc_id = batch.column("doc_id").to_numpy()
    text = batch.column("text").to_pylist()
    lang = batch.column("lang").to_pylist()

    lon_raw = (doc_id * 7919) % 36000 / 100.0 - 180.0
    lat_raw = (doc_id * 104729) % 17000 / 100.0 - 85.0
    # secondary coordinate pair on every 7th geo page (multi-geometry pages:
    # the explode/flat_map path, G-07 analog); appended as a body pattern so
    # the single-coordinate precedence chain is unaffected
    lon2_raw = (doc_id * 27644437) % 36000 / 100.0 - 180.0
    lat2_raw = (doc_id * 31337) % 17000 / 100.0 - 85.0
    has_second = (doc_id % 7) == 0
    mode = doc_id % 3
    has_geo = (doc_id % 10) != 7

    htmls = []
    for i in range(len(doc_id)):
        if not has_geo[i]:
            htmls.append(_NOGEO.format(text=text[i]))
        else:
            h = _TEMPLATES[int(mode[i])].format(
                lat=f"{lat_raw[i]:.2f}", lon=f"{lon_raw[i]:.2f}", text=text[i]
            )
            if has_second[i]:
                h = h.replace(
                    "</body>", f"\ngeo: {lat2_raw[i]:.2f}, {lon2_raw[i]:.2f}</body>"
                )
            htmls.append(h)
    urls = [f"https://{lg}.example.org/doc/{d}" for lg, d in zip(lang, doc_id)]
    ts = BASE_TS_US + (doc_id * 1337 % YEAR_SECONDS) * 1_000_000

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array([h.encode() for h in htmls], pa.binary()),
            "text": batch.column("text"),
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),
        }
    )


def read_pages(sf_dir: str, override_num_blocks: int | None = None):
    """Dataset of synthetic pages for a testdata scale-factor directory."""
    import ray.data

    # prune at the read: synthesis needs only these three columns —
    # `source`/`n_chars` would be decoded and dropped (r3 judge finding)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=override_num_blocks,
    )
    return ds.map_batches(synthesize_pages_batch, batch_format="pyarrow")


#: SQL fragment the DuckDB oracles prepend to mirror this synthesis.
PAGES_SQL_CTE = """
pages AS (
  SELECT doc_id,
         'https://' || lang || '.example.org/doc/' || doc_id AS url,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_seconds((doc_id*1337) % 31536000) AS warc_ts,
         text,
         lang,
         CAST(printf('%.2f', ((doc_id*7919)  % 36000)/100.0 - 180.0) AS DOUBLE) AS lon,
         CAST(printf('%.2f', ((doc_id*104729)% 17000)/100.0 -  85.0) AS DOUBLE) AS lat,
         CAST(printf('%.2f', ((doc_id*27644437) % 36000)/100.0 - 180.0) AS DOUBLE) AS lon2,
         CAST(printf('%.2f', ((doc_id*31337)    % 17000)/100.0 -  85.0) AS DOUBLE) AS lat2,
         (doc_id % 10) <> 7 AS has_geo,
         (doc_id % 7) = 0 AS has_second
  FROM documents
)
""".strip()
