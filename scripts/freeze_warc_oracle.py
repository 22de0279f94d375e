"""Freeze the expected WARC-records table for the driver correctness
gate.

Unlike the extract/multimodal freezers (which freeze the pure-Python
PARSER's output), the expected rows here come straight from the WARC
WRITER's record specs and offsets (lens_spark/sources/warc.py
``gen_warc``) — ground truth that never touches the parser — so the
driver row pins reader + Arrow plumbing against an independent oracle.

Regenerate only when the fixture corpus intentionally changes:
    python scripts/freeze_warc_oracle.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from lens_spark.sources.warc import expected_warc_rows_df, gen_warc

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

N_FILES = 3
RECS = 24
SEED = 13


def main() -> None:
    _files, rows = gen_warc(N_FILES, RECS, SEED)
    df = expected_warc_rows_df(rows)
    df = df.sort_values(
        ["warc_file", "record_offset"]
    ).reset_index(drop=True)
    out = os.path.join(FIXDIR, "warc_records_expected.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} rows -> {out}")


if __name__ == "__main__":
    main()
