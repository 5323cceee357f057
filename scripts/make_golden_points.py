#!/usr/bin/env python
"""Generate the committed golden geo-points fixture
``tests/golden/geo_points.parquet``: (lat, lng, leaf_cell_id) for
every distinct coordinate pair derivable from the sf0.001 + sf0.01
lineitem tables (the driver's test / correctness scales).

Purpose (VERDICT r1 item 4): freeze kernel-encoded leaf cell ids so
encode-downstream queries (tile_assign, raster_vector) get FULL
DuckDB value-hash oracles — a silent encode regression then trips the
driver's correctness gate, not just the pytest goldens.

Provenance: lat/lng come from the SAME DuckDB arithmetic as the
oracle's POINTS_SQL (bit-identical to the Spark twin, the float
discipline in CLAUDE.md); leaf_cell_id from the numpy Hilbert kernel
(itself anchored by the s2sphere README golden tokens in
tests/test_golden.py). Do NOT regenerate casually — the value of the
fixture is that it is FROZEN.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2spark.fixtures import POINTS_SQL  # noqa: E402
from s2spark.kernels import hilbert  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "geo_points.parquet")


def main() -> None:
    frames = []
    for sf_dir in SF_DIRS:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
        frames.append(con.sql(
            f"SELECT point_id, lat, lng FROM ({POINTS_SQL.strip()})"
        ).arrow())
    tbl = pa.concat_tables(frames)
    lat = tbl["lat"].to_numpy()
    lng = tbl["lng"].to_numpy()
    # the join key is (lat, lng) — point_id is NOT unique (key packing
    # collides), but leaf_cell_id is a pure function of the coordinate
    # pair, whose float bits are engine-identical by construction
    key = np.stack([lat.view(np.int64), lng.view(np.int64)], axis=1)
    _, first_idx = np.unique(key, axis=0, return_index=True)
    lat, lng = lat[first_idx], lng[first_idx]

    cid_u64 = hilbert.lat_lng_to_cell_id(lat, lng)
    cid_i64 = cid_u64.astype(np.int64)  # two's-complement: faces 4-5 < 0

    out = pa.table({
        "lat": pa.array(lat, pa.float64()),
        "lng": pa.array(lng, pa.float64()),
        "leaf_cell_id": pa.array(cid_i64, pa.int64()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(out, OUT, compression="zstd")
    print(f"wrote {OUT}: {out.num_rows} rows, "
          f"{os.path.getsize(OUT) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
