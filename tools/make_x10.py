#!/usr/bin/env python3
"""Build the 10x/100x oracle-replica corpora used by SURVEY §2.4's
scale-independence evidence (run each round since r5; 123/123 at r10).

Usage: python3 tools/make_x10.py [src_sf_dir] [dst_dir] [tiles]
Defaults: /root/testdata/sf0.1 -> /tmp/sf01_x10, tiles=10
100x: python3 tools/make_x10.py /root/testdata/sf0.1 /tmp/sf01_x100 100

documents/embeddings are tiled into k-cliques of EXACT copies (tile k at
id + k*1_000_000 — clear of the +100000 id space the incremental/streaming
dedup queries synthesize their batch rows in).

events is tiled too (VERDICT r10 task 1 — the event-time tier previously
had no above-sf0.1 corpus): tile k shifts event_id AND user_id by
k*1_000_000 and ts by k*1009 µs. Offsetting user_id makes each tile an
independent shard of NEW users, so per-user event density — what as-of
lookback, range-join fan-out, and session shape all key on — is preserved
and total work scales LINEARLY with tiles. (Keeping user_id fixed would
instead scale per-user density by k, which inflates the range join's
matched pairs by k² — a different, quadratic experiment, not a replica.)
The 1009 µs jitter keeps tiled rows time-distinct without moving any row
across a session gap or day boundary by more than the jitter itself; the
DuckDB oracle reads the same tiled parquet, so correctness comparison is
exact regardless.

Every other star-schema table is copied as-is. Then:

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
        "lineitem"]
TILE = [("documents", "doc_id"), ("embeddings", "vec_id")]
OFFSET = 1_000_000
TS_JITTER_US = 1009  # prime, < 1s: rows distinct, day/session shape intact


def tile_events(src, dst, tiles):
    t = pq.read_table(f"{src}/events.parquet")
    out_tiles = []
    for k in range(tiles):
        tk = t
        for col in ("event_id", "user_id"):
            idx = tk.schema.get_field_index(col)
            tk = tk.set_column(idx, col, pc.add(tk[col], k * OFFSET))
        ts_idx = tk.schema.get_field_index("ts")
        unit = tk.schema.field("ts").type.unit
        tk = tk.set_column(ts_idx, "ts",
                           pc.add(tk["ts"],
                                  pa.scalar(k * TS_JITTER_US, pa.duration(unit))))
        out_tiles.append(tk)
    out = pa.concat_tables(out_tiles)
    pq.write_table(out, f"{dst}/events.parquet")
    print(f"events: {out.num_rows} rows")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf01_x10"
    tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    for name in COPY:
        shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    for name, idcol in TILE:
        t = pq.read_table(f"{src}/{name}.parquet")
        idx = t.schema.get_field_index(idcol)
        ts = [t.set_column(idx, idcol, pc.add(t[idcol], k * OFFSET))
              for k in range(tiles)]
        out = pa.concat_tables(ts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {out.num_rows} rows")
    tile_events(src, dst, tiles)


if __name__ == "__main__":
    main()
