#!/usr/bin/env python
"""Generate ``tests/golden/synth_vertex_neighbors.parquet``: frozen
vertex neighbors (coarser level 11) for every distinct synthetic
level-12 cell of sf0.001 + sf0.01 — full value-hash oracle for the
vertex-neighbor kernel through the driver gate. FROZEN."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2spark import synth  # noqa: E402
from s2spark.kernels import cellops  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "synth_vertex_neighbors.parquet")
LEVEL = 11  # vertex neighbors are at a coarser level than the cells


def main() -> None:
    ids = []
    for sf_dir in SF_DIRS:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
        ids.append(con.sql(
            f"SELECT DISTINCT ({synth.SYNTH_CELL_SQL.strip()}) AS cell_id "
            "FROM lineitem").arrow()["cell_id"].to_numpy())
    cells = np.unique(np.concatenate(ids))
    nb, has4 = cellops.get_vertex_neighbors(cells.view(np.uint64), LEVEL)
    nb_i64 = nb.view(np.int64)
    cols = {"cell_id": pa.array(cells, pa.int64()),
            "has4": pa.array(has4, pa.bool_())}
    for k in range(4):
        cols[f"v{k}"] = pa.array(nb_i64[:, k], pa.int64())
    out = pa.table(cols)
    pq.write_table(out, OUT, compression="zstd")
    print(f"wrote {OUT}: {out.num_rows} rows, "
          f"{os.path.getsize(OUT) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
