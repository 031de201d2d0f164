#!/usr/bin/env python3
"""Build the 10x stress fixture (/tmp/sf1) and the skewed-events
variant (/tmp/sfskew) from a driver sf dir.

Replication model (BASELINE.md "sf1"): every fact table becomes
`copies` concatenated copies with id-like keys shifted by
copy * OFFSET, foreign keys shifted consistently (customer/orders/
lineitem/part/supplier key chains; doc_id == vec_id kept aligned);
nation/region dims and nationkey FKs are NOT shifted. Text, embedding
and timestamp payloads are byte-identical across copies, which makes
every document a `copies`-sized identical dup cluster and every
vector a `copies`-sized cosine-1 cluster — the worst-case dense-
duplicate workload the dedup caps are measured against.

Skew model (/tmp/sfskew): same tables as /tmp/sf1 except:

- events: every 5th event (deterministic: event_id % 5 == 0) is
  rewritten onto one hot user — ~20% of the stream on a single key.
- documents (round 12, VERDICT r11 item 8): every 125th doc
  (doc_id % 125 == 0 — OFFSET is a multiple of 125, so the rule is
  copy-invariant and hits both parities) has its text replaced by ONE
  fixed hot document — a single 400-doc identical cluster. That makes
  one LSH band bucket, one fingerprint group, and one shingle family
  ~400x hotter than the rest of the corpus while staying under every
  engine cap (maxBucket / SimhashMaxBucket / SubstrDocFreqCap = 1000),
  so the hot-key path is exercised WITHOUT the caps (mirrored in the
  oracles) hiding it. The streamed ingest front door replays the odd
  half of these docs through real micro-batches, putting hot-bucket
  index probes under the hash gate (the reason this exists).

pyarrow (not DuckDB) so the written schema is byte-faithful to the
driver's — events.ts must stay parquet TIMESTAMP(NANOS) for
Tables.events' nanosAsLong read path.

Usage: python3 tools/mk10x.py [src_sf_dir] [dst] [skew_dst]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SKEW_DST = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfskew"
COPIES = 10
OFFSET = 1_000_000_000
HOT_USER = 424242
HOT_DOC_MOD = 125  # divides OFFSET; 0,125,250,… → both parities
HOT_TEXT = ("breaking news wire syndicated boilerplate notice this "
            "article is distributed by the consolidated feed network "
            "and may not be reproduced rebroadcast or redistributed "
            "without the express written consent of the originating "
            "desk all rights reserved contact the syndication desk "
            "for licensing terms and archival access")

# table -> columns shifted by copy * OFFSET (key chains stay aligned)
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(name):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    shifts = SHIFTS[name]
    if not shifts:  # dims: single copy, keys shared by every replica
        return src
    parts = []
    for i in range(COPIES):
        t = src
        for col in shifts:
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(i * OFFSET, pa.int64()))
            t = t.set_column(idx, t.schema.field(idx), shifted)
        parts.append(t)
    return pa.concat_tables(parts)


def main():
    os.makedirs(DST, exist_ok=True)
    os.makedirs(SKEW_DST, exist_ok=True)
    for name in SHIFTS:
        table = replicate(name)
        pq.write_table(table, f"{DST}/{name}.parquet")
        if name == "events":
            idx = table.schema.get_field_index("user_id")
            mask = pa.array(table.column("event_id").to_numpy() % 5 == 0)
            hot = pc.if_else(
                mask, pa.scalar(HOT_USER, pa.int64()), table.column("user_id"))
            skewed = table.set_column(idx, table.schema.field(idx), hot)
            pq.write_table(skewed, f"{SKEW_DST}/{name}.parquet")
        elif name == "documents":
            idx = table.schema.get_field_index("text")
            mask = pa.array(table.column("doc_id").to_numpy() % HOT_DOC_MOD == 0)
            hot = pc.if_else(mask, pa.scalar(HOT_TEXT), table.column("text"))
            skewed = table.set_column(idx, table.schema.field(idx), hot)
            pq.write_table(skewed, f"{SKEW_DST}/{name}.parquet")
            print(f"documents: {pc.sum(mask).as_py()} hot docs -> {SKEW_DST}")
        else:
            # non-event tables are shared between the two fixtures
            if os.path.lexists(f"{SKEW_DST}/{name}.parquet"):
                os.remove(f"{SKEW_DST}/{name}.parquet")
            os.symlink(f"{DST}/{name}.parquet", f"{SKEW_DST}/{name}.parquet")
        print(f"{name}: {table.num_rows} rows -> {DST}")


if __name__ == "__main__":
    main()
