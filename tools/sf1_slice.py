#!/usr/bin/env python3
"""Build a doc_id-sliced copy of an SF dir for the sf1 slice-parity
sweep (SURVEY §6): the three dedup oracles DuckDB cannot run at full
sf1 (q_dedup_ngram_jaccard / q_dedup_containment / q_dedup_clusters
exhaust its 37 GB memory limit or 76 GB of spill) ARE feasible on a
deterministic doc_id range — both engines then run the identical
computation on the identical slice, closing the "semantics verified
only at ≤sf0.1" gap at sf1-scale document lengths and frequencies.

Usage: python3 tools/sf1_slice.py <sf1Dir> <outDir> <width> [foldModulus]
       [vecWidth vecFoldModulus]

The optional vec pair fold-slices EMBEDDINGS the same way (vec_id %
vecFold < vecWidth) — needed for q_knn_label_acc parity: the full sf1
embedding table (20k vectors) puts the quadratic DuckDB oracle in the
spill-death class AND sits above the Spark side's 8192-vector
evaluation cap (above which the operator deliberately audits a sample,
so oracle comparison would be apples-to-oranges). A 6000-vector folded
slice keeps both engines exact on identical input.
Then:  sbt "runMain graft.Verify <outDir> <dump> q_dedup_ngram_jaccard \
            q_dedup_containment q_dedup_clusters"
       python3 tools/parity.py <outDir> <dump>

The slice predicate is `doc_id % foldModulus < width` (plain
`doc_id < width` when no modulus is given). The FOLD matters: the
generator plants near-dup twins at a half-corpus offset — (i,
i+25000) at sf1 — so any contiguous prefix slice is pair-free and
the parity run passes vacuously (0 = 0). Folding at the plant
offset keeps both members of every planted pair in range:
`--fold 25000, width 7500` → docs [0,7500) ∪ [25000,32500), 15k
docs with the real cross-pairs inside.

Dev-only tool (driver-side python, validation only) — same standing
as tools/parity.py.
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, width: int, fold: int = 0,
         vec_width: int = 0, vec_fold: int = 0) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pred = f"doc_id % {fold} < {width}" if fold > 0 else f"doc_id < {width}"
    vpred = (f"vec_id % {vec_fold} < {vec_width}" if vec_fold > 0
             else f"vec_id < {vec_width}") if vec_width > 0 else None
    for t in TABLES:
        src = os.path.abspath(f"{sf_dir}/{t}.parquet")
        dst = f"{out_dir}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        if t == "documents":
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}' WHERE {pred} "
                f"ORDER BY doc_id) TO '{dst}' (FORMAT PARQUET)")
        elif t == "embeddings" and vpred is not None:
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}' WHERE {vpred} "
                f"ORDER BY vec_id) TO '{dst}' (FORMAT PARQUET)")
        else:
            os.symlink(src, dst)
    n = duckdb.sql(f"SELECT count(*) FROM '{out_dir}/documents.parquet'").fetchone()[0]
    msg = f"slice ready: {n} documents ({pred})"
    if vpred is not None:
        nv = duckdb.sql(
            f"SELECT count(*) FROM '{out_dir}/embeddings.parquet'").fetchone()[0]
        msg += f", {nv} vectors ({vpred})"
    print(msg + f" in {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         int(sys.argv[4]) if len(sys.argv) > 4 else 0,
         int(sys.argv[5]) if len(sys.argv) > 5 else 0,
         int(sys.argv[6]) if len(sys.argv) > 6 else 0)
