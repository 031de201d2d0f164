#!/usr/bin/env python3
"""Build the 100x GRAPH/CDC volume fixture (/tmp/sf10g) — VERDICT r19
ask #5: the graph fixpoints (bfs_hops_fixpoint, sssp_fixpoint), the
trade-graph family, and the CDC fold legs read orders+lineitem, which
the standing /tmp/sf10 fixture merely SYMLINKS from sf0.1 — so those
rows had "100x" in the artifact name but sf0.1 volume on the wire.
This fixture scales the tables those shapes actually consume.

Replication model — VOLUME-scaled, disjoint key spaces (the mk100x.py
discipline):

- `orders`: 100 copies with o_orderkey AND o_custkey shifted by
  copy * OFFSET — 150k -> 15M rows. The CDC legs' changelog (keyed on
  o_orderkey) gets 100x the key population and 100x the tombstone
  churn; SCD2 gets 100x the merge width.
- `lineitem`: 100 copies with l_orderkey AND l_suppkey shifted the
  same way, so orders ⋈ lineitem stays internally consistent per copy
  and the customer-supplier trade graph becomes 100 DISJOINT replicas
  of sf0.1's graph: edge volume grows 100x (the frontier ⋈ edges
  relaxation joins at real volume) while per-copy diameter — and so
  the fixpoints' round count — is unchanged, which keeps the unrolled
  DuckDB oracles replayable. The BFS/SSSP seed lives in copy 0, so the
  fixpoint runs prove the scale shape that matters at 100 TB: a
  SMALL frontier probing a 100x edge table without rebuilding or
  re-shuffling the settled mass each round.
- All other tables: symlinked from the source sf dir (check.py's view
  setup needs all ten names).

Deliberately NOT scaled: part/customer/supplier dims (broadcast-side
at any scale) and documents/embeddings/events (that's /tmp/sf10's
job — the two fixtures compose to cover every volume axis the 100x
registry subset reads).

Usage: python3 tools/mk100xg.py [src_sf_dir] [dst]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10g"
COPIES = 100
OFFSET = 1_000_000_000

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def shift(t, col, delta):
    idx = t.schema.get_field_index(col)
    return t.set_column(idx, t.schema.field(idx),
                        pc.add(t.column(col), pa.scalar(delta, pa.int64())))


def replicate(name, keys):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(COPIES):
        d = t
        for k in keys:
            d = shift(d, k, i * OFFSET)
        parts.append(d)
    out = pa.concat_tables(parts)
    dst = f"{DST}/{name}.parquet"
    if os.path.lexists(dst):
        os.remove(dst)
    pq.write_table(out, dst)
    print(f"{name}: {out.num_rows} rows -> {DST}")


def main():
    os.makedirs(DST, exist_ok=True)
    # o_custkey/l_suppkey shift keeps every copy's trade graph disjoint;
    # o_orderkey/l_orderkey shift keeps the join internally consistent.
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey", "l_suppkey"])
    for name in TABLES:
        if name in ("orders", "lineitem"):
            continue
        link = f"{DST}/{name}.parquet"
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(f"{SRC}/{name}.parquet", link)
    print("dims + doc/emb/event tables symlinked from", SRC)


if __name__ == "__main__":
    main()
