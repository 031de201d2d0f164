#!/usr/bin/env python3
"""Build the 100x volume fixture (/tmp/sf10) for the persisted-index
spot-gate (VERDICT r11 item 7): documents and embeddings at 100x the
sf0.1 row count, so the bucketed/indexed dedup + ANN paths are proven
one more order of magnitude past the standing 10x gate.

Replication model — VOLUME-scaled, not density-scaled:

- `documents`: 100 copies with doc_id shifted by copy * OFFSET and, for
  copy i > 0, every whitespace token suffixed with an `©i` marker. The
  marker makes token/shingle spaces DISJOINT across copies, so the
  near-dup pair graph is 100 independent replicas of sf0.1's graph:
  pair count (and the DuckDB oracle's candidate join) grows LINEARLY
  with volume. The dense-identical-cluster worst case is the 10x
  fixture's job (tools/mk10x.py keeps text byte-identical across
  copies); this fixture's job is raw volume — 500k docs through the
  banded LSH index, 100x the distinct fingerprint/shingle space.
  OFFSET is even, so the gate queries' doc_id parity conventions
  (corpus = even, arriving batch = odd) hold per-copy unchanged.

- `embeddings`: 100 copies, vec_id shifted, vectors byte-identical —
  200k vectors where every base vector is a 100-wide cosine-1 clump.
  The IVF index gets 100x list density AND the degenerate-tie top-k;
  no pair explosion because ANN output is top-k, not all-pairs.

- `events` (round 15): 100 copies with user_id AND event_id shifted by
  copy * OFFSET, timestamps/types/values unchanged — 10M events, 150k
  users over the SAME 30-day spine. This is the volume axis the keyed-
  state / dense-spine / sketch-window shapes fail on: 100x the
  per-user state population (streamed_attribution), 100x the
  spine-x-user interpolation grid (events_interpolate), 100x the
  per-day distinct stream through the KMV window (rolling_active_kmv).
  Day-spine width deliberately does NOT scale: wider spines are the
  10x fixture's densified-window job; this fixture's job is user
  volume at fixed time range (the production shape — users grow,
  retention windows don't).

- All other tables: symlinked from the source sf dir (the spot-gate
  queries read only documents/embeddings/events; the links keep
  DuckDB's view setup in tools/check.py working).

Usage: python3 tools/mk100x.py [src_sf_dir] [dst]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
COPIES = 100
OFFSET = 1_000_000_000

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def shift(t, col, delta):
    idx = t.schema.get_field_index(col)
    return t.set_column(idx, t.schema.field(idx),
                        pc.add(t.column(col), pa.scalar(delta, pa.int64())))


def main():
    os.makedirs(DST, exist_ok=True)
    docs = pq.read_table(f"{SRC}/documents.parquet")
    embs = pq.read_table(f"{SRC}/embeddings.parquet")

    doc_parts, emb_parts = [], []
    text_idx = docs.schema.get_field_index("text")
    for i in range(COPIES):
        d = shift(docs, "doc_id", i * OFFSET)
        if i > 0:
            # suffix every token: token spaces disjoint across copies
            suffixed = pc.replace_substring_regex(
                d.column("text"), pattern=r"(\S+)", replacement=rf"\1©{i}")
            d = d.set_column(text_idx, docs.schema.field(text_idx), suffixed)
        doc_parts.append(d)
        emb_parts.append(shift(embs, "vec_id", i * OFFSET))

    all_docs = pa.concat_tables(doc_parts)
    pq.write_table(all_docs, f"{DST}/documents.parquet")
    print(f"documents: {all_docs.num_rows} rows -> {DST}")
    all_embs = pa.concat_tables(emb_parts)
    pq.write_table(all_embs, f"{DST}/embeddings.parquet")
    print(f"embeddings: {all_embs.num_rows} rows -> {DST}")

    # pre-round-15 builds symlinked events from SRC: writing through
    # that symlink would target the read-only source dir — unlink first
    if os.path.lexists(f"{DST}/events.parquet"):
        os.remove(f"{DST}/events.parquet")
    events = pq.read_table(f"{SRC}/events.parquet")
    ev_parts = [shift(shift(events, "event_id", i * OFFSET),
                      "user_id", i * OFFSET)
                for i in range(COPIES)]
    all_ev = pa.concat_tables(ev_parts)
    pq.write_table(all_ev, f"{DST}/events.parquet")
    print(f"events: {all_ev.num_rows} rows -> {DST}")

    for name in TABLES:
        if name in ("documents", "embeddings", "events"):
            continue
        link = f"{DST}/{name}.parquet"
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(f"{SRC}/{name}.parquet", link)
    print("dims/facts symlinked from", SRC)


if __name__ == "__main__":
    main()
