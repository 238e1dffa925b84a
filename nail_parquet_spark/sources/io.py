"""Format-dispatched read/write (io.rs:14-34, utils/mod.rs:47-57 parity).

Parquet/CSV/NDJSON are distributed scans/sinks; XLSX stays driver-side via
pandas exactly like the reference (calamine/rust_xlsxwriter are
single-process too, io.rs:36-322).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def list_parquet_files(path: str) -> list[str]:
    """Recursive parquet file listing that applies Spark's hidden-path
    convention: any path SEGMENT starting with ``_`` or ``.`` is skipped
    (``_temporary`` task leftovers, ``_manifests``, dot-prefixed in-progress
    files), so an aborted write never leaks stale rows into a scan that
    Spark's own reader would have ignored."""
    import glob as _glob

    out = []
    for f in sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        rel = os.path.relpath(f, path)
        if any(seg.startswith(("_", ".")) for seg in rel.split(os.sep)):
            continue
        out.append(f)
    return out


def _fmt_of(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("parquet", "pqt"):
        return "parquet"
    if ext == "csv":
        return "csv"
    if ext in ("json", "jsonl", "ndjson"):
        return "json"
    if ext in ("xlsx", "xls"):
        return "xlsx"
    if os.path.isdir(path):
        # extensionless directory (a Spark/engine output dir): autodetect
        # from the files inside — recursive, so Hive-partitioned layouts
        # (batch=*/part-*.parquet) resolve too
        import glob

        for inner_ext in ("parquet", "csv", "json"):
            if glob.glob(os.path.join(path, "**", f"*.{inner_ext}"), recursive=True):
                return "parquet" if inner_ext == "parquet" else inner_ext
    raise ValueError(f"unsupported extension '.{ext}' (utils/mod.rs:47-57)")


def read_data(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    fmt = _fmt_of(path, fmt)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        return spark.read.csv(path, header=True, inferSchema=True)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "xlsx":
        # driver-side, like the reference (io.rs:36-165); stdlib reader, no
        # openpyxl needed. Explicit schema so empty sheets and all-NULL
        # columns don't hit Spark's can-not-infer errors.
        from nail_parquet_spark.sources.xlsx import read_xlsx

        pdf = read_xlsx(path)
        if len(pdf.columns) == 0:
            raise ValueError(f"xlsx sheet in {path} has no header row")
        parts = []
        for c in pdf.columns:
            k = pdf[c].dtype.kind
            t = {"i": "long", "u": "long", "f": "double", "b": "boolean"}.get(k, "string")
            if t == "string":
                pdf[c] = pdf[c].map(lambda v: None if v is None else str(v))
            parts.append(f"`{c}` {t}")
        return spark.createDataFrame(pdf, schema=", ".join(parts))
    raise ValueError(fmt)


def write_data(df: DataFrame, path: str, fmt: str | None = None,
               mode: str = "overwrite", single_file: bool = False,
               compression: str | None = None,
               compression_level: int | None = None) -> None:
    """Write with an optional per-write parquet codec/level (the reference's
    optimize compression menu, optimize.rs:47-108: snappy/gzip/zstd + level;
    brotli needs a codec jar Spark doesn't ship). ``compression_level``
    applies to zstd via the per-write parquet option — it does NOT touch the
    session-wide default."""
    fmt = _fmt_of(path, fmt)
    out = df.coalesce(1) if single_file else df
    if fmt == "parquet":
        w = out.write.mode(mode)
        if compression:
            if compression == "brotli":
                raise ValueError("brotli needs a parquet codec jar Spark does not ship; use zstd/gzip/snappy")
            w = w.option("compression", compression)
            if compression_level is not None and compression == "zstd":
                w = w.option("parquet.compression.codec.zstd.level", str(compression_level))
        w.parquet(path)
    elif fmt == "csv":
        w = out.write.mode(mode).option("header", True)
        if compression:
            w = w.option("compression", compression)
        w.csv(path)
    elif fmt == "json":
        w = out.write.mode(mode)
        if compression:
            w = w.option("compression", compression)
        w.json(path)
    elif fmt == "xlsx":
        # driver-side like the reference (io.rs:200-322); Excel caps a sheet
        # at 1,048,576 rows incl. header
        from nail_parquet_spark.sources.xlsx import write_xlsx

        write_xlsx(df.limit(1_048_575).toPandas(), path)
    else:
        raise ValueError(fmt)


def convert(spark: SparkSession, src: str, dst: str,
            src_fmt: str | None = None, dst_fmt: str | None = None) -> dict:
    """Format conversion (convert.rs:30-57); returns rows/cols like the
    reference logs."""
    df = read_data(spark, src, src_fmt)
    write_data(df, dst, dst_fmt)
    return {"rows": df.count(), "cols": len(df.columns)}
