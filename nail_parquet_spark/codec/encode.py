"""Distributed encode stage: DataFrame -> encoded-blocks DataFrame.

One output row per (partition, block, column) — the Spark-native analogue of
a parquet column chunk plus its footer metadata entry (what `nail metadata
--column-chunks` dumps, /root/reference/src/commands/metadata.rs:217-273),
except blocks are first-class queryable data.

All encoding happens inside ``mapInArrow`` (Arrow batches end-to-end, no
per-row Python). Codec choice is made once per (executor partition, column)
from a sampled prefix, or forced via the ``codecs`` override — the analogue
of `nail optimize --compression/--dictionary` knobs
(/root/reference/src/commands/optimize.rs:34-40).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

from nail_parquet_spark.codec.kernels import encode_array, kind_of
from nail_parquet_spark.codec.select import choose_codec, raw_bytes_of

BLOCKS_SCHEMA = (
    "part_id int, block_id bigint, column string, codec string, "
    "n_rows bigint, raw_bytes bigint, enc_bytes bigint, null_count bigint, "
    "min_val string, max_val string, distinct_est bigint, "
    "header string, payload binary"
)


def _stat_strings(arr: pa.Array) -> tuple[str | None, str | None, int]:
    kind = kind_of(arr.type)
    sample = arr.slice(0, 8192)
    try:
        distinct = int(pc.count_distinct(sample).as_py() or 0)
    except Exception:
        distinct = -1
    if kind == "bin" or len(arr) == arr.null_count:
        return None, None, distinct
    try:
        mm = pc.min_max(arr)
        return (
            str(mm["min"].as_py())[:64],
            str(mm["max"].as_py())[:64],
            distinct,
        )
    except Exception:
        return None, None, distinct


def encode_table(
    df: DataFrame,
    columns: list[str] | None = None,
    codecs: dict[str, str] | None = None,
    policy: str = "balanced",
    sample_rows: int = 8192,
    block_rows: int = 65536,
    with_stats: bool = True,
) -> DataFrame:
    """Encode selected columns of ``df`` into a blocks DataFrame."""
    cols = columns or df.columns
    overrides = dict(codecs or {})
    proj = df.select(*cols)

    def enc(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        chosen: dict[str, str] = dict(overrides)
        block_id = 0
        for batch in batches:
            for off in range(0, batch.num_rows, block_rows):
                chunk = batch.slice(off, min(block_rows, batch.num_rows - off))
                out = {k: [] for k in (
                    "part_id", "block_id", "column", "codec", "n_rows",
                    "raw_bytes", "enc_bytes", "null_count", "min_val",
                    "max_val", "distinct_est", "header", "payload")}
                for cname in cols:
                    arr = chunk.column(chunk.schema.get_field_index(cname))
                    if isinstance(arr, pa.ChunkedArray):
                        arr = arr.combine_chunks()
                    if cname not in chosen:
                        chosen[cname] = choose_codec(
                            arr.slice(0, sample_rows), policy=policy
                        )[0]
                    blk = encode_array(arr, chosen[cname])
                    if with_stats:
                        mn, mx, dist = _stat_strings(arr)
                    else:
                        mn = mx = None
                        dist = -1
                    out["part_id"].append(pid)
                    out["block_id"].append(block_id)
                    out["column"].append(cname)
                    out["codec"].append(blk.header["codec"])
                    out["n_rows"].append(chunk.num_rows)
                    out["raw_bytes"].append(raw_bytes_of(arr))
                    out["enc_bytes"].append(len(blk.payload) + len(blk.header_json()))
                    out["null_count"].append(arr.null_count)
                    out["min_val"].append(mn)
                    out["max_val"].append(mx)
                    out["distinct_est"].append(dist)
                    out["header"].append(blk.header_json())
                    out["payload"].append(blk.payload)
                yield pa.record_batch(
                    [
                        pa.array(out["part_id"], pa.int32()),
                        pa.array(out["block_id"], pa.int64()),
                        pa.array(out["column"], pa.string()),
                        pa.array(out["codec"], pa.string()),
                        pa.array(out["n_rows"], pa.int64()),
                        pa.array(out["raw_bytes"], pa.int64()),
                        pa.array(out["enc_bytes"], pa.int64()),
                        pa.array(out["null_count"], pa.int64()),
                        pa.array(out["min_val"], pa.string()),
                        pa.array(out["max_val"], pa.string()),
                        pa.array(out["distinct_est"], pa.int64()),
                        pa.array(out["header"], pa.string()),
                        pa.array(out["payload"], pa.binary()),
                    ],
                    names=list(out.keys()),
                )
                block_id += 1

    return proj.mapInArrow(enc, schema=BLOCKS_SCHEMA)
