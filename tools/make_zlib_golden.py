"""Build the zlib golden table for the compression_ratio oracle.

The signal itself (stdlib zlib) has no DuckDB twin, so the oracle reads a
precomputed lookup: md5(text) -> (orig_len, compressed_len), covering the
documents table at every generated scale factor.  Keyed by content hash, not
doc_id, so one golden file serves any sf the driver checks at.

Run once (and re-run only if the test data changes):
    python tools/make_zlib_golden.py
"""

from __future__ import annotations

import glob
import hashlib
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "zlib_lens.parquet")


def main() -> None:
    seen: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        table = pq.read_table(path, columns=["text"])
        for chunk in table.column("text").chunks:
            for value in chunk:
                text = value.as_py()
                if not text:
                    continue
                raw = text.encode("utf-8")
                digest = hashlib.md5(raw).hexdigest()
                if digest not in seen:
                    seen[digest] = (len(raw), len(zlib.compress(raw)))
        print(f"{path}: {table.num_rows} rows, {len(seen)} distinct texts so far")
    md5s = sorted(seen)
    out = pa.table(
        {
            "md5": pa.array(md5s, pa.string()),
            "orig_len": pa.array([seen[m][0] for m in md5s], pa.int64()),
            "compressed_len": pa.array([seen[m][1] for m in md5s], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(out, OUT)
    print(f"wrote {out}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
