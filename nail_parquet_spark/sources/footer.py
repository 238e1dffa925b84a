"""Footer-native parquet inspection — read-only, no data scan.

Parity with the reference's `nail metadata` (metadata.rs:100-270: file
info, key-value metadata, schema fields, per-row-group and per-chunk
sizes/encodings/statistics) and `nail size` (size.rs:23-190: file size +
per-column in-memory estimate from type widths). Everything here comes from
``pyarrow.parquet.ParquetFile.metadata`` — a footer fetch, never a scan; a
previous revision answered these commands by re-encoding the whole table.
"""

from __future__ import annotations

import glob
import os


def _parquet_files(path: str) -> list[str]:
    if os.path.isdir(path):
        # Spark's hidden-path convention (sources/io.list_parquet_files):
        # _temporary leftovers and dot-files are not part of the dataset, so
        # size/metadata must not count them either
        from nail_parquet_spark.sources.io import list_parquet_files

        files = list_parquet_files(path)
        if not files:
            raise ValueError(f"no parquet files under {path}")
        return files
    return [path]


def metadata_items(path: str, max_row_groups: int | None = None) -> list[tuple[str, str]]:
    """Ordered (key, value) footer dump for one parquet file or a directory
    (directory: file-level keys are summed, per-group keys prefixed with the
    file index). ``max_row_groups`` caps the per-group detail section."""
    import pyarrow.parquet as pq

    files = _parquet_files(path)
    items: list[tuple[str, str]] = []
    multi = len(files) > 1
    total_rows = 0
    total_compressed = 0
    total_uncompressed = 0
    total_groups = 0

    for fidx, f in enumerate(files):
        md = pq.ParquetFile(f).metadata
        pre = f"file_{fidx}_" if multi else ""
        total_rows += md.num_rows
        total_groups += md.num_row_groups
        items.append((f"{pre}path", f))
        items.append((f"{pre}version", str(md.format_version)))
        items.append((f"{pre}created_by", md.created_by or ""))
        items.append((f"{pre}num_rows", str(md.num_rows)))
        items.append((f"{pre}num_row_groups", str(md.num_row_groups)))
        items.append((f"{pre}num_columns", str(md.num_columns)))
        items.append((f"{pre}file_size", str(os.path.getsize(f))))
        items.append((f"{pre}footer_size", str(md.serialized_size)))
        kv = md.metadata or {}
        for k, v in kv.items():
            key = k.decode("utf-8", "replace") if isinstance(k, bytes) else str(k)
            if key == "ARROW:schema":  # opaque blob, not useful as text
                continue
            val = v.decode("utf-8", "replace") if isinstance(v, bytes) else str(v)
            items.append((f"{pre}metadata_{key}", val[:200]))

        sch = md.schema
        for i in range(len(sch)):
            col = sch.column(i)
            cp = f"{pre}column_{i}_"
            items.append((cp + "name", col.name))
            items.append((cp + "physical_type", col.physical_type))
            items.append((cp + "logical_type", str(col.logical_type)))
            items.append((cp + "max_definition_level", str(col.max_definition_level)))
            items.append((cp + "max_repetition_level", str(col.max_repetition_level)))
            items.append((cp + "is_optional", str(col.max_definition_level > 0).lower()))

        ngroups = md.num_row_groups if max_row_groups is None else min(md.num_row_groups, max_row_groups)
        for g in range(ngroups):
            rg = md.row_group(g)
            gp = f"{pre}row_group_{g}_"
            rg_compressed = sum(
                rg.column(c).total_compressed_size for c in range(rg.num_columns)
            )
            items.append((gp + "num_rows", str(rg.num_rows)))
            items.append((gp + "total_byte_size", str(rg.total_byte_size)))
            items.append((gp + "compressed_size", str(rg_compressed)))
            items.append((gp + "num_columns", str(rg.num_columns)))
            total_uncompressed += rg.total_byte_size
            total_compressed += rg_compressed
            if rg.total_byte_size:
                items.append((
                    gp + "compression_ratio",
                    f"{100.0 * rg_compressed / rg.total_byte_size:.2f}%",
                ))
            for c in range(rg.num_columns):
                ch = rg.column(c)
                cp = f"{pre}rg_{g}_col_{c}_"
                items.append((cp + "path", ch.path_in_schema))
                items.append((cp + "type", ch.physical_type))
                items.append((cp + "encodings", str(list(ch.encodings))))
                items.append((cp + "compression", ch.compression))
                items.append((cp + "uncompressed_size", str(ch.total_uncompressed_size)))
                items.append((cp + "compressed_size", str(ch.total_compressed_size)))
                items.append((cp + "num_values", str(ch.num_values)))
                items.append((cp + "file_offset", str(ch.file_offset)))
                items.append((cp + "data_page_offset", str(ch.data_page_offset)))
                if ch.dictionary_page_offset is not None:
                    items.append((cp + "dictionary_page_offset", str(ch.dictionary_page_offset)))
                st = ch.statistics
                items.append((cp + "has_statistics", str(st is not None).lower()))
                if st is not None:
                    items.append((cp + "has_min_max", str(st.has_min_max).lower()))
                    if st.has_min_max:
                        items.append((cp + "min_value", repr(st.min)[:80]))
                        items.append((cp + "max_value", repr(st.max)[:80]))
                    if st.null_count is not None:
                        items.append((cp + "null_count", str(st.null_count)))
                    if st.distinct_count:
                        items.append((cp + "distinct_count", str(st.distinct_count)))

    if multi:
        items.insert(0, ("num_files", str(len(files))))
        items.insert(1, ("total_rows", str(total_rows)))
        items.insert(2, ("total_row_groups", str(total_groups)))
    if total_uncompressed:
        items.append(("total_compressed_size", str(total_compressed)))
        items.append(("total_uncompressed_size", str(total_uncompressed)))
        items.append((
            "overall_compression_ratio",
            f"{100.0 * total_compressed / total_uncompressed:.2f}%",
        ))
    return items


_FIXED_WIDTH = {
    "BOOLEAN": 1, "INT32": 4, "INT64": 8, "INT96": 12,
    "FLOAT": 4, "DOUBLE": 8,
}


def size_report(path: str) -> dict:
    """Cheap `nail size` answer: file bytes + per-column footer byte counts
    + an in-memory estimate from physical type widths (size.rs:133-173's
    heuristic for strings: avg on-disk uncompressed bytes per value)."""
    import pyarrow.parquet as pq

    files = _parquet_files(path)
    file_size = sum(os.path.getsize(f) for f in files)
    rows = 0
    cols: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in range(rg.num_columns):
                ch = rg.column(c)
                d = cols.setdefault(ch.path_in_schema, {
                    "physical_type": ch.physical_type,
                    "compressed_bytes": 0, "uncompressed_bytes": 0, "num_values": 0,
                })
                d["compressed_bytes"] += ch.total_compressed_size
                d["uncompressed_bytes"] += ch.total_uncompressed_size
                d["num_values"] += ch.num_values
    per_column = []
    est_memory = 0
    for name, d in cols.items():
        width = _FIXED_WIDTH.get(d["physical_type"])
        if width is not None:
            mem = width * d["num_values"]
        else:  # BYTE_ARRAY and friends: uncompressed footprint + offsets
            mem = d["uncompressed_bytes"] + 4 * d["num_values"]
        est_memory += mem
        per_column.append({"column": name, **d, "est_memory_bytes": mem})
    return {
        "n_files": len(files),
        "rows": rows,
        "columns": len(cols),
        "file_size_bytes": file_size,
        "est_memory_bytes": est_memory,
        "per_column": per_column,
    }
