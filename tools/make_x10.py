#!/usr/bin/env python3
"""Build the 10x oracle-replica corpus used by SURVEY §2.4's
scale-independence evidence (run each round since r5; 123/123 at r10).

Usage: python3 tools/make_x10.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf01_x10

documents/embeddings are tiled into 10-cliques of EXACT copies (tile k at
id + k*1_000_000 — clear of the +100000 id space the incremental/streaming
dedup queries synthesize their batch rows in); every other star-schema
table is copied as-is. Then:

    sbt 'runMain graft.Verify /tmp/sf01_x10 /tmp/v_x10'
    python3 tools/oracle_check.py /tmp/v_x10 /tmp/sf01_x10

The tiled corpus is what exposed the r6 dedup_incremental oracle id-space
assumption and the r10 q_semdedup maxCluster-overflow oracle gap — the
10-cliques both multiply true pair counts and push the dominant IVF cell
past caps that sf0.1 never reaches.
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY = ["region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events"]
TILE = [("documents", "doc_id"), ("embeddings", "vec_id")]
TILES = 10
OFFSET = 1_000_000


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf01_x10"
    import os
    os.makedirs(dst, exist_ok=True)
    for name in COPY:
        shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    for name, idcol in TILE:
        t = pq.read_table(f"{src}/{name}.parquet")
        idx = t.schema.get_field_index(idcol)
        tiles = [t.set_column(idx, idcol, pc.add(t[idcol], k * OFFSET))
                 for k in range(TILES)]
        out = pa.concat_tables(tiles)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
