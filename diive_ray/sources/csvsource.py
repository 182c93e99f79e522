"""CSV time-series source — the reference's config-driven file reader
(diive/core/io/filereader.py:336-620 ReadFileType/DataFileReader driven
by YAML filetype configs: skiprows, header, timestamp format) as a
Ray-Data-native reader: ``ray.data.read_csv`` + a stateless per-batch
timestamp parser / column sanitizer stage.

The config surface is a small dataclass instead of YAML (same fields);
multi-file reads merge natively (MultiDataFileReader,
filereader.py:233-335 -> just a path list)."""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.scalars import sanitize_column_names


@dataclass(frozen=True)
class CsvSpec:
    """Filetype config (cf. diive/configs/filetypes/*.yml)."""

    ts_col: str = "ts"
    ts_format: str | None = None          # strptime format; None -> infer
    rename: dict = field(default_factory=dict)
    numeric_cols: tuple = ()
    na_values: tuple = ("", "NA", "NaN", "-9999")


def read_timeseries_csv(paths, spec: CsvSpec = CsvSpec(), **read_csv_kwargs) -> ray.data.Dataset:
    """read_csv -> sanitize names -> parse timestamps -> coerce numerics.
    All per-batch vectorized; the reader's parallelism is native."""
    from pyarrow import csv as pacsv

    convert = pacsv.ConvertOptions(null_values=list(spec.na_values), strings_can_be_null=True)
    plist = [paths] if isinstance(paths, str) else list(paths)
    if any(str(p).endswith(".gz") for p in plist) and "arrow_open_stream_args" not in read_csv_kwargs:
        # gzip'd CSV (reference files.py:211-254 unzip semantics): arrow
        # decompresses in-stream per file, so the read fans out per file
        # exactly like plain CSV — no driver-side unzip step.
        read_csv_kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
        read_csv_kwargs.setdefault("file_extensions", None)
    ds = ray.data.read_csv(paths, convert_options=convert, **read_csv_kwargs)

    def fix(batch: pa.Table) -> pa.Table:
        names = sanitize_column_names(list(batch.column_names))
        batch = batch.rename_columns(names)
        if spec.rename:
            batch = batch.rename_columns([spec.rename.get(n, n) for n in batch.column_names])
        df = batch.to_pandas()
        if spec.ts_col in df.columns and not pd.api.types.is_datetime64_any_dtype(df[spec.ts_col]):
            df[spec.ts_col] = pd.to_datetime(
                df[spec.ts_col], format=spec.ts_format, errors="coerce"
            ).astype("datetime64[us]")
        for c in spec.numeric_cols:
            if c in df.columns:
                df[c] = pd.to_numeric(df[c], errors="coerce")
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)
