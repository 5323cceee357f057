#!/usr/bin/env python
"""Generate ``tests/golden/geo_images.parquet``: frozen
(image_id, lat, lng, leaf_cell_id, phash) for the first 500 synthetic
geo-images — gives the image-tiling path a DuckDB value-hash oracle
(tile assignment over the image table + exact phash diversity).
A regression in the image generator, the encode kernel, or the phash
DCT trips the driver gate. Do NOT regenerate casually (FROZEN)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2spark import images as IM  # noqa: E402
from s2spark.kernels import hilbert  # noqa: E402

N = 500
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "geo_images.parquet")


def main() -> None:
    sizes = (8, 16, 32)
    ids, lats, lngs, phashes = [], [], [], []
    for idx in range(N):
        w = sizes[idx % 3]
        h = sizes[(idx // 3) % 3]
        lat, lng = IM._latlng_for(idx)
        px = IM._pixels_for(idx, w, h)
        ids.append(f"img{idx:012d}")
        lats.append(lat)
        lngs.append(lng)
        phashes.append(IM.phash64(px))
    cid = hilbert.lat_lng_to_cell_id(
        np.array(lats), np.array(lngs)).astype(np.int64)
    out = pa.table({
        "image_id": pa.array(ids, pa.string()),
        "lat": pa.array(lats, pa.float64()),
        "lng": pa.array(lngs, pa.float64()),
        "leaf_cell_id": pa.array(cid, pa.int64()),
        "phash": pa.array(phashes, pa.int64()),
    })
    pq.write_table(out, OUT, compression="zstd")
    print(f"wrote {OUT}: {out.num_rows} rows, "
          f"{os.path.getsize(OUT) / 1e3:.1f} KB")


if __name__ == "__main__":
    main()
