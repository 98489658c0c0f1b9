"""File-level parquet statistics — the data-skipping ledger.

At 100 TB the scheduler's first decision is which FILES a predicate can
skip outright; that's driven by the min/max column statistics every
parquet footer already carries. These helpers read ONLY footers (pyarrow
metadata, no row groups decoded) to (a) expose the per-file min/max
manifest a table format (Iceberg/Delta) would index, and (b) measure how
much a given layout lets a range predicate skip — the number that makes
layout choices (write_zordered / repartitionByRange) objective instead
of folklore.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class FileSpan:
    path: str
    n_rows: int
    col_min: object
    col_max: object


def file_spans(path: str, column: str) -> list[FileSpan]:
    """Per-file (min, max, rows) for ``column`` across a parquet
    directory — footer reads only. The manifest a metadata layer would
    persist; here computed on demand for layout measurement.

    LOCAL-FILESYSTEM tool by design (os.listdir + pyarrow local
    reads): it measures test layouts on the driver. On an object
    store, this information comes from the table format's manifest
    (Iceberg/Delta file stats) — do not point this at hdfs://s3a://
    paths. Pipeline sinks must never use this probe pattern (they use
    sources.io.try_read_parquet)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    spans: list[FileSpan] = []
    files = (
        [path]
        if os.path.isfile(path)
        else sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    )
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        lo, hi, rows = None, None, 0
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            rows += g.num_rows
            st = g.column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append(FileSpan(f, rows, lo, hi))
    return spans


def skipping_ratio(path: str, column: str, lo, hi) -> float:
    """Fraction of FILES a [lo, hi] range predicate on ``column`` can
    skip from footer stats alone (file span disjoint from the query
    range). 0.0 = every file must be opened (random layout); near 1.0 =
    clustered layout doing its job. Files without stats count as
    unskippable — the safe direction."""
    spans = file_spans(path, column)
    if not spans:
        return 0.0
    skipped = sum(
        1
        for s in spans
        if s.col_min is not None and (s.col_max < lo or s.col_min > hi)
    )
    return skipped / len(spans)
