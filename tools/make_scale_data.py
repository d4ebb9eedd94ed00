#!/usr/bin/env python
"""Deterministic 10x scale-up of sf0.1 for SCALING MEASUREMENT ONLY.

The corpus/oracle/correctness pipeline runs exclusively on the
driver-provided /root/testdata SFs; this tool exists for VERDICT r7 task
#8 — one measured decade of scaling (sf0.1 vs "sf1") per expensive
operator, so the 100 TB grade rests on wall-clock evidence instead of
plan reads alone.

Construction (pure replication, no synthetic distributions invented):

- ``documents``: 10 replicas of the sf0.1 table; replica ``i`` shifts
  ``doc_id`` by ``i * 10_000_000`` and appends a replica token ``zrep<i>``
  to ``text``.  The token keeps replicas from being EXACT cross-replica
  duplicates (which would turn every doc into a 10-clique in the near-dup
  graph and measure a 10x-denser graph, not 10x data); within a replica
  the near-dup/graph structure is byte-identical to sf0.1, so operator
  work scales ~linearly in replicas with the same shape.
- ``embeddings``: 10 replicas with ``vec_id`` shifted the same way;
  vectors unchanged (ANN/MMR cost is corpus-size- and cell-size-driven,
  not value-driven).
- every other table: copied as-is (the measured ops only read documents/
  embeddings; the copies keep corpus loaders working).

Output dir defaults to /root/repo/.scaledata/sf1 (gitignored).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHIFT = 10_000_000
REPLICAS = 10
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".scaledata", "sf1")
    )
    os.makedirs(out, exist_ok=True)

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            tab = pq.read_table(sp)
            reps = []
            for i in range(REPLICAS):
                r = tab
                r = r.set_column(
                    r.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc.add(r["doc_id"], i * SHIFT),
                )
                r = r.set_column(
                    r.schema.get_field_index("text"),
                    "text",
                    pc.binary_join_element_wise(r["text"], f" zrep{i}", ""),
                )
                reps.append(r)
            pq.write_table(pa.concat_tables(reps), dp)
        elif t == "embeddings":
            tab = pq.read_table(sp)
            reps = []
            for i in range(REPLICAS):
                r = tab.set_column(
                    tab.schema.get_field_index("vec_id"),
                    "vec_id",
                    pc.add(tab["vec_id"], i * SHIFT),
                )
                reps.append(r)
            pq.write_table(pa.concat_tables(reps), dp)
        elif t == "events":
            # 10x USERS (event_id/user_id shifted per replica, timestamps
            # unchanged): within a replica the per-user event stream is
            # byte-identical to sf0.1, so user-keyed windows (sessionize,
            # attribution) measure 10x independent partitions of the same
            # shape — pure data scaling, no density artifact
            tab = pq.read_table(sp)
            reps = []
            for i in range(REPLICAS):
                r = tab
                for col in ("event_id", "user_id"):
                    r = r.set_column(
                        r.schema.get_field_index(col),
                        col,
                        pc.add(r[col], i * SHIFT),
                    )
                reps.append(r)
            pq.write_table(pa.concat_tables(reps), dp)
        else:
            shutil.copyfile(sp, dp)
        print(f"{t}: {pq.ParquetFile(dp).metadata.num_rows} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
