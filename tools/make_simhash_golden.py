"""Build the SimHash golden table for the simhash_pairs oracle.

For every document text (at every generated sf) compute, with the
INDEPENDENT pure-Python implementation in xxhash64_ref.py:
  - simhash     = SimHash64 of the text
  - simhash_zz  = SimHash64 of text + " zz" (the catalog's planted mutation)
keyed by md5(text).  The oracle joins documents to this table and enumerates
all pairs within hamming<=r directly in SQL — cross-checking the engine's
signature VALUES and its blocking completeness at once.

Run once (re-run only if the test data or the planted mutation changes):
    python tools/make_simhash_golden.py
"""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from xxhash64_ref import simhash64

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "simhash.parquet")


def main() -> None:
    seen: dict[str, tuple[int | None, int | None]] = {}
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        table = pq.read_table(path, columns=["text"])
        for chunk in table.column("text").chunks:
            for value in chunk:
                text = value.as_py()
                if text is None:
                    continue
                digest = hashlib.md5(text.encode("utf-8")).hexdigest()
                if digest not in seen:
                    seen[digest] = (simhash64(text), simhash64(text + " zz"))
        print(f"{path}: {table.num_rows} rows, {len(seen)} distinct texts so far")
    md5s = sorted(seen)
    out = pa.table(
        {
            "md5": pa.array(md5s, pa.string()),
            "simhash": pa.array([seen[m][0] for m in md5s], pa.int64()),
            "simhash_zz": pa.array([seen[m][1] for m in md5s], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(out, OUT)
    print(f"wrote {OUT}: {out.num_rows} rows")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
