"""Distributed decode stage: encoded-blocks DataFrame -> original table.

Blocks of one (part_id, block_id) group are co-located by a hash
repartition, ordered within the partition, then streamed through
``mapInArrow``: each completed group decodes its per-column payloads back to
Arrow arrays and emits a record batch of the original schema. Row order is
not preserved across the round trip (verification joins on a key — per the
north rule, byte-identical ``text`` per ``url``).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from nail_parquet_spark.codec.kernels import EncodedBlock, decode_array


def _headers_by_column(blocks: DataFrame) -> tuple[dict[str, dict], dict[str, set]]:
    """(one parsed header per column, every xref reference per column) — a
    tiny driver-side metadata read, like a parquet footer fetch.

    Grouping by (column, codec, xref-ref) covers blocks tables whose batches
    were encoded by different jobs with different codec choices (a resumable
    out_dir mixing pre-xref and xref batches, or even two xref batches with
    different references): the fetch closure must see EVERY reference any
    block of a column uses. The blocks `codec` column holds the normalized
    name ('xref', no ref), so the ref is pulled from the header JSON."""
    headers, refs, _ = _headers_refs_codecs(blocks)
    return headers, refs


def _headers_refs_codecs(
    blocks: DataFrame,
) -> tuple[dict[str, dict], dict[str, set], dict[str, dict]]:
    """:func:`_headers_by_column` plus per-column codec metadata, all from
    the SAME single metadata job (r06: the dictionary-pushdown operators
    previously ran a second ``codec.distinct`` job and a third eligibility
    probe for facts this grouped read already held).

    Third element: ``{column: {codec: {"max_null": int}}}`` — every codec
    any block of the column uses, with the max per-block null_count seen
    under that codec (the int/float dictionary-distinct eligibility rule
    needs "has any dict block with nulls", not just the codec set)."""
    import json

    rows = (
        blocks.select(
            "column", "codec",
            F.get_json_object("header", "$.params.ref").alias("__ref"),
            "header", "null_count",
        )
        .groupBy("column", "codec", "__ref")
        .agg(F.first("header").alias("header"),
             F.max("null_count").alias("max_null"))
        .collect()
    )
    headers: dict[str, dict] = {}
    refs: dict[str, set] = {}
    codecs: dict[str, dict] = {}
    for r in rows:
        h = json.loads(r["header"])
        headers.setdefault(r["column"], h)
        cmeta = codecs.setdefault(r["column"], {})
        prev = cmeta.setdefault(r["codec"], {"max_null": 0})
        prev["max_null"] = max(prev["max_null"], int(r["max_null"] or 0))
        if h.get("codec") == "xref":
            refs.setdefault(r["column"], set()).add(h["params"]["ref"])
    return headers, refs, codecs


# Above this file count, decode_parquet_dir derives headers with a Spark job
# (distributed footer reads) instead of the driver loop below: the loop is
# O(files) sequential driver IO — fine for a per-job blocks dir (tens of
# files), wrong for a 100k-file lake table.
_DRIVER_HEADER_MAX_FILES = 256


def _headers_from_files(files: list[str]) -> tuple[dict[str, dict], dict[str, set]]:
    """Same contract as ``_headers_by_column`` but via direct column-pruned
    pyarrow reads of (column, header) — no Spark job (saves a full stage,
    ~0.5 s/job). Reads EVERY file so heterogeneous codec choices across
    resumed jobs are still all seen."""
    import json

    import pyarrow.parquet as _pq

    headers: dict[str, dict] = {}
    refs: dict[str, set] = {}
    seen: set[tuple] = set()
    for f in files:
        t = _pq.read_table(f, columns=["column", "header"], use_threads=False)
        for c, hs in zip(t.column("column").to_pylist(),
                         t.column("header").to_pylist()):
            key = (c, hs)
            if key in seen:
                continue
            seen.add(key)
            h = json.loads(hs)
            headers.setdefault(c, h)
            if h.get("codec") == "xref":
                refs.setdefault(c, set()).add(h["params"]["ref"])
    return headers, refs


def _schema_from_headers(headers: dict[str, dict], columns: list[str]) -> pa.Schema:
    from nail_parquet_spark.codec.kernels import _type_from_str

    types = {c: _type_from_str(h["type"]) for c, h in headers.items()}
    unknown = [c for c in columns if c not in types]
    if unknown:
        raise ValueError(
            f"columns {unknown} not present in the blocks table "
            f"(encoded columns: {sorted(types)})"
        )
    # Spark's Arrow bridge rejects nanosecond timestamps (e.g. from INT96
    # parquet read via pyarrow) — decode to micros instead, lossless for
    # data that originated at micro precision
    for c, t in types.items():
        if pa.types.is_timestamp(t) and t.unit == "ns":
            types[c] = pa.timestamp("us", tz=t.tz)
    return pa.schema([(c, types[c]) for c in columns])


def blocks_arrow_schema(blocks: DataFrame, columns: list[str]) -> pa.Schema:
    """Reconstruct the original Arrow schema from one header per column."""
    return _schema_from_headers(_headers_by_column(blocks)[0], columns)


def _fetch_closure(headers: dict[str, dict], refs: dict[str, set],
                   columns: list[str]) -> list[str]:
    """Columns whose blocks must be FETCHED to decode ``columns``: xref
    codecs (kernels.py) pull in their reference column even when the caller
    didn't request it (column-subset decode of an xref column alone)."""
    fetch = list(columns)
    i = 0
    while i < len(fetch):
        c = fetch[i]
        i += 1
        for ref in sorted(refs.get(c, ())):
            if ref not in fetch:
                if ref not in headers:
                    raise ValueError(
                        f"column {c!r} is xref-encoded against {ref!r} "
                        "which is missing from the blocks table"
                    )
                fetch.append(ref)
    return fetch


def _with_src_key(blocks: DataFrame, file_keyed: bool = True) -> DataFrame:
    """Project (source-file, part_id, block_id, column, header, payload).

    The source file disambiguates block groups across independently-run
    encode jobs (each restarts partition ids at 0 — e.g. the batch dirs of a
    resumable out_dir): without it, equal-numbered blocks of different rows
    would merge into one group. Encode writers emit whole groups per file,
    so (file, part_id, block_id) is unique. Plans where
    ``input_file_name()`` is undefined (multi-source unions/joins, or blocks
    that never touched disk) fall back to a constant — correct for the
    single job that produced such a DataFrame.

    ``file_keyed=False`` drops the file from the key — needed for block
    tables that were repartitioned/compacted AFTER encoding (groups may span
    files there), and only safe when ALL blocks come from one encode job."""
    base = ["part_id", "block_id", "column", "header", "payload"]
    if not file_keyed:
        return blocks.select(F.lit("").alias("__src"), *base)
    return _src_expr_frame(blocks, warn=True).select("__src", *base)


def _src_expr_frame(blocks: DataFrame, warn: bool = False) -> DataFrame:
    """``blocks`` plus a ``__src`` source-file column — empty string when
    ``input_file_name()`` is unavailable (in-memory encode output, cached
    relations, multi-source plans). An empty ``__src`` means physical-block
    identity degrades to the bare (part, block) pair, which can collide
    across encode jobs: metadata-side callers MUST detect duplicate keys
    and fall back (the decode side's _iter_groups refuses duplicates
    loudly). Keeps all original columns."""
    try:
        out = blocks.withColumn("__src", F.input_file_name())
        out.schema  # force analysis: MULTI_SOURCES_UNSUPPORTED surfaces here
        return out
    except Exception as e:
        if "MULTI_SOURCES" not in str(e) and "input_file_name" not in str(e):
            raise
        if warn:
            import warnings

            warnings.warn(
                "decode: input_file_name() is unavailable for this blocks "
                "plan (multi-source); falling back to non-file-keyed "
                "grouping — only safe when ALL blocks come from one encode "
                "job",
                stacklevel=4,
            )
        return blocks.withColumn("__src", F.lit(""))


def _iter_groups(batches, columns, strict: bool = True, with_key: bool = False):
    """Shared group-assembly state machine for the shuffled decode paths:
    rows arrive sorted by (src, part_id, block_id); flush on key transition,
    validate the requested columns per group, and refuse duplicate
    (group, column) rows — a duplicate means two distinct groups share a key
    (e.g. a union of in-memory encode jobs where the file key is empty) and
    silently overwriting would return row-misaligned data.

    ``strict=False`` (schema evolution) skips the completeness check:
    groups encoded before a column existed yield partial dicts and the
    decoder null-fills them.

    ``with_key=True`` yields ``(key, grp)`` pairs instead of bare group
    dicts — the position-decode path needs the (src, part_id, block_id)
    coordinates to stamp row positions."""
    cur_key = None
    grp: dict[str, tuple[str, bytes]] = {}

    def check_complete():
        if not strict:
            return
        missing = [c for c in columns if c not in grp]
        if missing:
            raise ValueError(
                f"block group {cur_key} is missing requested columns "
                f"{missing}{_GROUP_HINT}"
            )

    def emit(key):
        return (key, grp) if with_key else grp

    for batch in batches:
        srcs = batch.column(0).to_pylist()
        pids = batch.column(1).to_pylist()
        bids = batch.column(2).to_pylist()
        cols_ = batch.column(3).to_pylist()
        hdrs = batch.column(4).to_pylist()
        pays = batch.column(5)
        for i in range(batch.num_rows):
            key = (srcs[i], pids[i], bids[i])
            if key != cur_key:
                if grp:
                    check_complete()
                    yield emit(cur_key)
                cur_key = key
                grp = {}
            if cols_[i] in grp:
                raise ValueError(
                    f"duplicate block for column {cols_[i]!r} in group "
                    f"{key}: two encode jobs produced colliding group ids "
                    "(decode the dirs separately or run compact_blocks first)"
                )
            grp[cols_[i]] = (hdrs[i], pays[i].as_py())
    if grp:
        check_complete()
        yield emit(cur_key)


_GROUP_HINT = (
    " (if this blocks table was repartitioned or rewritten after encoding so "
    "groups span files, pass file_keyed=False — only safe when all blocks "
    "come from ONE encode job — or re-key it with "
    "nail_parquet_spark.codec.compact.compact_blocks, which restores whole "
    "groups per file and decodes under either mode)"
)


def _decode_group(grp: dict[str, tuple[str, bytes]], columns: list[str],
                  out_schema: pa.Schema,
                  fill_missing: bool = False) -> pa.RecordBatch:
    """Decode one complete (part_id, block_id) group, resolving xref
    dependencies in order (a reference is decoded once and reused).

    ``fill_missing=True`` (schema evolution): a requested column with no
    block in this group decodes to all-NULL at the group's row count (taken
    from any present block's header — no payload decode needed), the
    Iceberg add-column read semantics."""
    blks = {c: EncodedBlock.from_parts(h, pl) for c, (h, pl) in grp.items()}
    cache: dict[str, pa.Array] = {}

    def get(c: str, seen: tuple = ()) -> pa.Array:
        if c in cache:
            return cache[c]
        blk = blks[c]
        if blk.header["codec"] == "xref":
            ref = blk.header["params"]["ref"]
            if ref in seen or ref == c:
                raise ValueError(f"xref cycle decoding {c!r} -> {ref!r}")
            if ref not in blks:
                raise ValueError(
                    f"block group missing xref reference column {ref!r} "
                    f"needed to decode {c!r}"
                )
            arr = decode_array(blk, ref_arr=get(ref, seen + (c,)))
        else:
            arr = decode_array(blk)
        cache[c] = arr
        return arr

    arrays = []
    n_rows = next(iter(blks.values())).header["n"] if blks else 0
    for i, c in enumerate(columns):
        ft = out_schema.field(i).type
        if fill_missing and c not in blks:
            arrays.append(pa.nulls(n_rows, ft))
            continue
        arr = get(c)
        if arr.type != ft:
            arr = arr.cast(ft)
        arrays.append(arr)
    return pa.record_batch(arrays, schema=out_schema)


def _spark_ddl_of(schema: pa.Schema) -> str:
    from pyspark.sql.pandas.types import from_arrow_type

    parts = []
    for f in schema:
        parts.append(f"`{f.name}` {from_arrow_type(f.type).simpleString()}")
    return ", ".join(parts)


# reserved row-coordinate columns appended by decode_table(with_positions=
# True): the (block-file, part, block, row-offset) address of a decoded row —
# the same shape as an Iceberg v2 position-delete coordinate (file_path, pos),
# scoped by the block-group key this table format uses.
POS_COLUMNS = ["_src_file", "_part_id", "_block_id", "_pos"]


def decode_table(blocks: DataFrame, columns: list[str] | None = None,
                 num_partitions: int | None = None,
                 file_keyed: bool = True,
                 missing_columns: str = "error",
                 with_positions: bool = False,
                 headers: dict[str, dict] | None = None,
                 refs: dict[str, set] | None = None,
                 pre_grouped: bool = False) -> DataFrame:
    """Decode an encoded-blocks DataFrame back to the raw table.

    ``missing_columns``: ``"error"`` (default) refuses groups that lack a
    requested column; ``"null"`` null-fills them instead — Iceberg
    add-column read semantics for resumable out_dirs whose later batches
    gained columns (the column must exist in at least one batch, since the
    output type comes from its header).

    BREAKING DEFAULT (round 3): ``file_keyed=True`` scopes block-group
    identity by source file so outputs of independent encode jobs (each
    restarting part_id at 0) never merge. Block tables that were
    repartitioned or rewritten AFTER encoding — whose groups span files and
    decoded fine under the old fileless key — now fail with a
    missing-columns error that names the two fixes: pass
    ``file_keyed=False`` (safe only when ALL blocks come from one encode
    job) or re-key with ``codec.compact.compact_blocks``, which restores
    whole groups per file and decodes under either mode.

    DETERMINISM CONTRACT: ``blocks`` must evaluate to the same rows on
    every action (file-backed, cached, or checkpointed). Decode and its
    pushdown variants run MULTIPLE jobs over the plan (header read, zone
    prune collect, payload decode); an uncached in-memory plan downstream
    of a sampling shuffle (``repartitionByRange``'s boundaries re-draw per
    action) can shift rows between groups across those jobs and corrupt
    results. This is Spark's own repeatability contract, restated here
    because the failure is silent.

    ``headers``/``refs`` (optional, r06): pass the pair a caller already
    collected via ``_headers_by_column(blocks)`` to skip this function's
    own header job — the pushdown operators run several metadata jobs over
    the same blocks plan, and each redundant header read re-evaluates an
    uncached plan end to end. They must describe THIS blocks table (or a
    superset); an empty-after-pruning blocks frame then also decodes to an
    empty typed frame instead of raising on absent headers.

    ``pre_grouped=True`` (r06) skips the co-locating repartition + sort:
    valid when every block group's rows are already ADJACENT within one
    partition — true by construction for ``encode_table`` output and any
    narrow transformation of it (filters, pair filters, broadcast
    semi-joins, ``.cache()``), i.e. the in-memory encode→pushdown→decode
    pipeline shape. It removes the one Exchange that carries payload
    bytes (the decode becomes a pure map stage). NOT valid for blocks
    read back from disk (file splitting can cut a group in half) or any
    plan with a shuffle between encode and decode. Safety: a violated
    adjacency assumption splits a group into fragments that are each
    missing columns, so the strict group assembly REFUSES loudly
    (``missing_columns='error'``, the default) instead of mis-decoding;
    combining ``pre_grouped=True`` with ``missing_columns='null'`` puts
    that contract on the caller."""
    if missing_columns not in ("error", "null"):
        raise ValueError("missing_columns must be 'error' or 'null'")
    if headers is None or refs is None:
        headers, refs = _headers_by_column(blocks)
    if columns is None:
        # the header read already enumerated the columns — no extra job
        columns = sorted(headers)
    if with_positions:
        clash = [c for c in columns if c in POS_COLUMNS]
        if clash:
            raise ValueError(
                f"with_positions reserves column names {POS_COLUMNS}; the "
                f"table already has {clash}"
            )
    out_schema = _schema_from_headers(headers, columns)
    pos_schema = pa.schema(
        list(out_schema)
        + [pa.field("_src_file", pa.string()),
           pa.field("_part_id", pa.int64()),
           pa.field("_block_id", pa.int64()),
           pa.field("_pos", pa.int64())]
    ) if with_positions else out_schema
    ddl = _spark_ddl_of(pos_schema)
    # xref columns need their reference column's blocks in the group even
    # when the caller didn't request it
    fetch_cols = _fetch_closure(headers, refs, columns)

    # Restrict to the fetched columns BEFORE grouping, then co-locate and
    # sort each (file, part_id, block_id) group's rows. Groups flush on key
    # transition (the sort makes a group's rows adjacent), and completeness
    # is judged PER GROUP against the requested columns — so batches encoded
    # by different jobs with different column sets or codecs each decode by
    # their own dependencies instead of a global column count.
    # pre_grouped: encode output already satisfies the adjacency the
    # shuffle+sort would establish — skip the payload Exchange entirely.
    part = _with_src_key(blocks, file_keyed).filter(F.col("column").isin(fetch_cols))
    if not pre_grouped:
        if num_partitions:
            part = part.repartition(num_partitions, "__src", "part_id",
                                    "block_id")
        else:
            part = part.repartition("__src", "part_id", "block_id")
        part = part.sortWithinPartitions("__src", "part_id", "block_id")

    fill = missing_columns == "null"

    def dec(batches):
        if not with_positions:
            for grp in _iter_groups(batches, columns, strict=not fill):
                yield _decode_group(grp, columns, out_schema, fill_missing=fill)
            return
        import numpy as np

        for key, grp in _iter_groups(batches, columns, strict=not fill,
                                     with_key=True):
            rb = _decode_group(grp, columns, out_schema, fill_missing=fill)
            src, pid, bid = key
            n = rb.num_rows
            # run-length-style constant columns: one distinct value each —
            # arrow repeats cheaply, and Spark sees plain columns
            coord = [
                pa.array([src] * n, pa.string()),
                pa.array(np.full(n, pid, dtype=np.int64)),
                pa.array(np.full(n, bid, dtype=np.int64)),
                pa.array(np.arange(n, dtype=np.int64)),
            ]
            yield pa.record_batch(list(rb.columns) + coord, schema=pos_schema)

    return part.mapInArrow(dec, schema=ddl)


def verify_roundtrip(source: DataFrame, decoded: DataFrame, key: str = "url",
                     columns: list[str] | None = None) -> dict:
    """Join on ``key`` and count per-column mismatches (bit-identity gate).

    Uses md5 over a canonical binary rendering so arbitrarily wide values
    compare cheaply and NULL is distinguished from empty.
    """
    cols = columns or [c for c in source.columns if c in decoded.columns]

    def canon(df: DataFrame) -> DataFrame:
        exprs = [F.col(key).alias("_k")]
        for c in cols:
            if c == key:
                continue
            dt = dict(df.dtypes)[c]
            col = F.col(c)
            if dt == "binary":
                b = col
            elif dt.startswith("timestamp"):
                b = F.encode(F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS"), "UTF-8")
            else:
                b = F.encode(col.cast("string"), "UTF-8")
            exprs.append(
                F.when(col.isNull(), F.lit("<NULL>")).otherwise(F.md5(b)).alias(f"h_{c}")
            )
        return df.select(*exprs)

    s = canon(source)
    d = canon(decoded)
    j = s.alias("s").join(d.alias("d"), "_k", "full_outer")
    agg = [F.count("*").alias("joined_rows")]
    for c in cols:
        if c == key:
            continue
        agg.append(
            F.sum(
                F.when(
                    ~F.col(f"s.h_{c}").eqNullSafe(F.col(f"d.h_{c}")), 1
                ).otherwise(0)
            ).alias(f"mismatch_{c}")
        )
    row = j.agg(*agg).collect()[0].asDict()
    row["total_mismatches"] = sum(v for k, v in row.items() if k.startswith("mismatch_"))
    return row


class _BufferedWriter:
    """Parquet sink that coalesces decoded group batches (8-64k rows) into
    ~128k-row row groups with 1 MB pages: one row group per encode block
    costs the C++ writer ~20% in per-group overhead (stats flush, page
    finalize) and yields worse files for downstream scans. Bounded buffer,
    not whole-file — the live set stays ~100 MB at web-page row widths."""

    ROW_GROUP_ROWS = 131072

    def __init__(self, tmp, schema, compression, use_dictionary):
        self._args = (tmp, schema, compression, use_dictionary)
        self.writer = None
        self.n_rows = 0
        self._pending: list = []
        self._pending_rows = 0

    def write(self, rb) -> None:
        self._pending.append(rb)
        self._pending_rows += rb.num_rows
        if self._pending_rows >= self.ROW_GROUP_ROWS:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        if self.writer is None:
            import pyarrow.parquet as _pq

            tmp, schema, compression, use_dictionary = self._args
            self.writer = _pq.ParquetWriter(
                tmp, schema, compression=compression,
                use_dictionary=use_dictionary, data_page_size=1 << 20)
        self.writer.write_table(pa.Table.from_batches(self._pending),
                                row_group_size=self.ROW_GROUP_ROWS)
        self.n_rows += self._pending_rows
        self._pending, self._pending_rows = [], 0

    def close(self) -> bool:
        """Flush + close; True if anything was written."""
        self.flush()
        if self.writer is None:
            return False
        self.writer.close()
        return True


def decode_to_parquet(blocks: DataFrame, out_dir: str,
                      columns: list[str] | None = None,
                      num_partitions: int | None = None,
                      compression: str = "snappy",
                      file_keyed: bool = True,
                      use_dictionary=False,
                      missing_columns: str = "error") -> DataFrame:
    """Sink-side decode: tasks write decoded rows straight to parquet with
    the pyarrow C++ writer, so the decoded raw bytes never cross the
    Python->JVM boundary (the mirror of ``encode_parquet_files`` — measured
    ~10x faster than decode_table + a JVM sink for binary-heavy columns).

    Returns a small manifest DataFrame (file, n_rows); the decoded table is
    ``spark.read.parquet(out_dir)``.

    ``file_keyed`` semantics (and the round-3 breaking default for tables
    rewritten after encoding) are documented on ``decode_table``.

    ``use_dictionary`` defaults to False: decoded web pages are mostly
    unique (dict pages overflow and fall back anyway) and skipping the
    attempt is ~20% off the write wall; pass True (or a column-name list)
    to re-dictionarize low-cardinality outputs.

    ``missing_columns="null"``: schema-evolution read — groups lacking a
    requested column null-fill it (see ``decode_table``).
    """
    import os

    if missing_columns not in ("error", "null"):
        raise ValueError("missing_columns must be 'error' or 'null'")
    fill = missing_columns == "null"
    headers, refs = _headers_by_column(blocks)
    if columns is None:
        columns = sorted(headers)
    out_schema = _schema_from_headers(headers, columns)
    fetch_cols = _fetch_closure(headers, refs, columns)
    os.makedirs(out_dir, exist_ok=True)

    # Same column-subset, group-key, and flush-on-transition rules as
    # decode_table.
    part = _with_src_key(blocks, file_keyed).filter(F.col("column").isin(fetch_cols))
    if num_partitions:
        part = part.repartition(num_partitions, "__src", "part_id", "block_id")
    else:
        part = part.repartition("__src", "part_id", "block_id")
    part = part.sortWithinPartitions("__src", "part_id", "block_id")

    def dec(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        tid = ctx.partitionId() if ctx is not None else 0
        att = ctx.attemptNumber() if ctx is not None else 0
        path = os.path.join(out_dir, f"part-{tid:05d}.parquet")
        # attempt-unique temp + atomic rename: duplicate task attempts
        # (speculation, zombie retries) must never interleave into the
        # final file (see encode_parquet_dir)
        tmp = os.path.join(out_dir, f".part-{tid:05d}.attempt-{att}.inprogress")
        import glob as _glob2
        import re as _re2

        # only temps from STRICTLY OLDER attempts (see encode_parquet_dir)
        for stale in _glob2.glob(os.path.join(out_dir, f".part-{tid:05d}.attempt-*.inprogress")):
            m = _re2.search(r"attempt-(\d+)\.inprogress$", stale)
            if m and int(m.group(1)) < att:
                try:
                    os.remove(stale)
                except OSError:
                    pass
        w = _BufferedWriter(tmp, out_schema, compression, use_dictionary)
        for grp in _iter_groups(batches, columns, strict=not fill):
            w.write(_decode_group(grp, columns, out_schema, fill_missing=fill))
        if w.close():
            os.replace(tmp, path)
            yield pa.record_batch(
                [pa.array([path]), pa.array([w.n_rows], pa.int64())],
                names=["file", "n_rows"],
            )

    return part.mapInArrow(dec, schema="file string, n_rows bigint")


def decode_parquet_dir(spark, blocks_dir: str, out_dir: str,
                       columns: list[str] | None = None,
                       compression: str = "snappy",
                       use_dictionary=False,
                       missing_columns: str = "error"):
    """Shuffle-free decode: each task reads one block-parquet FILE with the
    pyarrow C++ reader, decodes its (complete) groups, and writes decoded
    parquet in place.

    Valid whenever the blocks were written by this engine's encode (every
    writer task emits whole groups into its own file), so no repartition is
    needed to co-locate a block's columns — zero shuffle, C++ IO on both
    ends. For arbitrary block layouts use ``decode_to_parquet``.

    ``missing_columns="null"``: schema-evolution read — groups lacking a
    requested column null-fill it (see ``decode_table``).
    """
    import os

    if missing_columns not in ("error", "null"):
        raise ValueError("missing_columns must be 'error' or 'null'")
    fill = missing_columns == "null"

    from nail_parquet_spark.sources.io import list_parquet_files

    files = list_parquet_files(blocks_dir)
    if not files:
        raise ValueError(f"no block files under {blocks_dir}")
    if len(files) <= _DRIVER_HEADER_MAX_FILES:
        headers, refs = _headers_from_files(files)
    else:
        headers, refs = _headers_by_column(spark.read.parquet(blocks_dir))
    if columns is None:
        columns = sorted(headers)
    out_schema = _schema_from_headers(headers, columns)
    fetch_cols = _fetch_closure(headers, refs, columns)
    os.makedirs(out_dir, exist_ok=True)

    # one file per slice via parallelize — no repartition, so the job is a
    # single shuffle-free stage (same pattern as encode_parquet_dir)
    rdd = spark.sparkContext.parallelize([[f] for f in files], len(files)) \
        .flatMap(lambda s: [(p,) for p in s])
    items = spark.createDataFrame(rdd, "path string")

    def dec(batches):
        import pyarrow.parquet as _pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        tid = ctx.partitionId() if ctx is not None else 0
        att = ctx.attemptNumber() if ctx is not None else 0
        out_path = os.path.join(out_dir, f"part-{tid:05d}.parquet")
        tmp = os.path.join(out_dir, f".part-{tid:05d}.attempt-{att}.inprogress")  # atomic commit (see decode_to_parquet)
        import glob as _glob2
        import re as _re2

        # only temps from STRICTLY OLDER attempts (see encode_parquet_dir)
        for stale in _glob2.glob(os.path.join(out_dir, f".part-{tid:05d}.attempt-*.inprogress")):
            m = _re2.search(r"attempt-(\d+)\.inprogress$", stale)
            if m and int(m.group(1)) < att:
                try:
                    os.remove(stale)
                except OSError:
                    pass
        w = _BufferedWriter(tmp, out_schema, compression, use_dictionary)
        colset = set(fetch_cols)
        for batch in batches:
            for path in batch.column(0).to_pylist():
                # use_threads=False: a Spark task owns ONE core (see encode)
                tbl = _pq.read_table(
                    path,
                    columns=["part_id", "block_id", "column", "header", "payload"],
                    use_threads=False,
                )
                pids = tbl.column("part_id").to_pylist()
                bids = tbl.column("block_id").to_pylist()
                cols_ = tbl.column("column").to_pylist()
                hdrs = tbl.column("header").to_pylist()
                pays = tbl.column("payload")
                groups: dict[tuple[int, int], dict[str, tuple[str, bytes]]] = {}
                for i in range(tbl.num_rows):
                    if cols_[i] not in colset:
                        continue  # column-subset decode: ignore unrequested blocks
                    g = groups.setdefault((pids[i], bids[i]), {})
                    if cols_[i] in g:
                        raise ValueError(
                            f"duplicate block for column {cols_[i]!r} in "
                            f"group {(pids[i], bids[i])} of {path}: colliding "
                            "group ids (run compact_blocks to re-key)"
                        )
                    g[cols_[i]] = (hdrs[i], pays[i].as_py())
                for key, grp in groups.items():
                    # completeness is per group against the REQUESTED
                    # columns (xref deps raise inside _decode_group): blocks
                    # of heterogeneous jobs may carry different column sets
                    missing = [c for c in columns if c not in grp]
                    if missing and not fill:
                        raise ValueError(
                            f"block group {key} in {path} is missing "
                            f"requested columns {missing}"
                        )
                    w.write(_decode_group(grp, columns, out_schema,
                                          fill_missing=fill))
        if w.close():
            os.replace(tmp, out_path)
            yield pa.record_batch(
                [pa.array([out_path]), pa.array([w.n_rows], pa.int64())],
                names=["file", "n_rows"],
            )

    return items.mapInArrow(dec, schema="file string, n_rows bigint")


# ---------------------------------------------------------------------------
# zone-map predicate pushdown (block pruning from the per-block min/max)
# ---------------------------------------------------------------------------

_PRUNE_OPS = ("=", "==", "!=", ">", ">=", "<", "<=", "prefix", "in",
              "isnull", "notnull")

# IN-lists longer than this skip zone/bloom pruning (the OR-of-intervals
# expression and the driver-side probe-hash work grow linearly; past this
# the residual isin filter alone is the right plan)
_IN_PRUNE_CAP = 64


def _keep_groups(blocks: DataFrame, meta: DataFrame, may,
                 max_groups: int) -> DataFrame:
    """Collect the (part_id, block_id) keep-set satisfying ``may`` and
    re-apply it as literal isin filters (pushed into the parquet scan).
    Above ``max_groups`` pruning is skipped — never wrong, only unpruned."""
    pairs = (
        meta.filter(may).select("part_id", "block_id").distinct()
        .limit(max_groups + 1).collect()
    )
    if len(pairs) > max_groups:
        return blocks
    parts = sorted({r["part_id"] for r in pairs})
    bids = sorted({r["block_id"] for r in pairs})
    return blocks.filter(F.col("part_id").isin(parts) & F.col("block_id").isin(bids))


def prune_blocks(blocks: DataFrame, column: str, op: str, value,
                 max_groups: int = 100_000,
                 headers: dict[str, dict] | None = None) -> DataFrame:
    """Drop whole (part_id, block_id) groups whose ``column`` zone stats
    (encode-side ``min_val``/``max_val``) prove no row can satisfy
    ``column op value`` — the engine's parquet-row-group-pruning analogue.

    The keep-set is collected driver-side (O(#groups), capped at
    ``max_groups`` — above the cap pruning is skipped, never wrong) and
    re-applied as LITERAL ``isin`` filters on (part_id, block_id), which
    Catalyst pushes into the parquet scan: pruned groups' payload bytes are
    never read, not merely decoded-and-dropped. The pair-of-INs is a
    superset of the exact pair set — safe, and the residual row filter
    (decode_table_where) keeps semantics exact.

    Safety rules encoded below:
    - stats are rendered with str()[:64]; a 64-char string max may be
      truncated, so it prunes nothing (treated as +inf). A truncated min is
      a prefix of the true min, hence still a valid lower bound.
    - numeric/timestamp stats re-parse with try_cast; a failed parse keeps
      the group (NULL bound = unknown, never prunes).
    - min_val NULL with null_count < n_rows means stats were unavailable →
      keep; min_val NULL on an all-null block → no comparison can match →
      prune. Binary columns carry no stats → no pruning.
    """
    if op not in _PRUNE_OPS:
        raise ValueError(f"op must be one of {_PRUNE_OPS}, got {op!r}")
    if headers is None:
        headers, _ = _headers_by_column(blocks)
    if column not in headers:
        raise ValueError(f"column {column!r} not in the blocks table")
    may = _zone_may_expr(column, op, value, headers)
    if may is None:
        return blocks
    meta = blocks.filter(F.col("column") == column).select(
        "part_id", "block_id", "min_val", "max_val", "n_rows", "null_count")
    return _keep_groups(blocks, meta, may, max_groups)


def _zone_may_expr(column: str, op: str, value, headers: dict):
    """The zone-map may-keep Column for ``column op value`` over a blocks
    metadata row, or None when stats cannot prune this column/op (binary
    columns, an oversized IN list). The expression references only
    min_val/max_val/n_rows/null_count — all prune rules and safety notes
    of :func:`prune_blocks` live here."""
    from nail_parquet_spark.codec.kernels import _type_from_str

    if op in ("isnull", "notnull"):
        # null predicates need only the null counters, recorded for EVERY
        # column type (binary included): isnull keeps blocks with any null,
        # notnull keeps blocks with any non-null row
        return (F.col("null_count") > 0) if op == "isnull" else (
            F.col("null_count") < F.col("n_rows"))
    t = _type_from_str(headers[column]["type"])
    is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
    if op == "prefix" and not is_str:
        raise ValueError("prefix predicate is only valid on string columns")
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        cast = "bigint"
    elif pa.types.is_floating(t):
        cast = "double"
    elif pa.types.is_timestamp(t) or pa.types.is_date(t):
        cast = "timestamp"
    elif is_str:
        cast = None
    else:
        return None  # binary etc.: no usable stats

    in_vals: list | None = None
    if op == "in":
        in_vals = list(value)
        if len(in_vals) > _IN_PRUNE_CAP:
            return None
    if cast is not None:
        lo = F.col("min_val").try_cast(cast)
        hi = F.col("max_val").try_cast(cast)
        v = F.lit(None if in_vals is not None else value).cast(cast)
        hi_known = hi.isNotNull()
        lo_known = lo.isNotNull()
        lits = [F.lit(x).cast(cast) for x in (in_vals or [])]
    else:
        lo = F.col("min_val")
        hi = F.col("max_val")
        v = F.lit(None if in_vals is not None else value)
        hi_known = hi.isNotNull() & (F.length("max_val") < 64)
        # a 64-char min may be truncated: a prefix of the true min, valid
        # as a lower bound but NOT as an exact value for !=-constancy
        lo_known = F.length("min_val") < 64
        lits = [F.lit(x) for x in (in_vals or [])]
    if op == "in":
        if not lits:
            # empty IN-list matches no row anywhere — prune every group
            return F.lit(False)
        cond = F.lit(False)
        for lv in lits:
            cond = cond | ((lo <= lv) & F.when(hi_known, hi >= lv)
                           .otherwise(F.lit(True)))
    elif op == "!=":
        # prune only blocks provably CONSTANT-equal to the value: every
        # non-null row is v (nulls never satisfy !=); all-null blocks fall
        # out below via ~lo.isNull()
        cond = ~(lo_known & hi_known & (lo == v) & (hi == v))
    elif op == "prefix":
        # strings with prefix p form the interval [p, p⁺). A block may hold
        # one iff hi >= p and (lo <= p OR lo itself starts with p) — the
        # lo-side disjunction stays valid under 64-char min truncation: a
        # truncated lo is a prefix of the true lo, so it is <= p whenever
        # the true lo's first len(lo) chars sit within p, and startswith
        # still fires when the truncation kept at least len(p) chars.
        cond = ((lo <= v) | lo.startswith(v)) & F.when(
            hi_known, hi >= v
        ).otherwise(F.lit(True))
    elif op in ("=", "=="):
        cond = (lo <= v) & F.when(hi_known, hi >= v).otherwise(F.lit(True))
    elif op == ">=":
        cond = F.when(hi_known, hi >= v).otherwise(F.lit(True))
    elif op == ">":
        cond = F.when(hi_known, hi > v).otherwise(F.lit(True))
    elif op == "<=":
        cond = lo <= v
    else:  # "<"
        cond = lo < v
    stats_missing = lo.isNull() & (F.col("null_count") < F.col("n_rows"))
    return stats_missing | ((~lo.isNull()) & cond)


def prune_blocks_bloom(blocks: DataFrame, column: str, value,
                       max_groups: int = 100_000,
                       headers: dict[str, dict] | None = None,
                       op: str = "=") -> DataFrame:
    """Equality (and, with ``op='prefix'``, string-prefix) pushdown via the
    opt-in per-block bloom bitmaps (codec/bloom.py): drop (part_id,
    block_id) groups whose ``column`` bloom proves the predicate matches no
    row. The complement of zone maps — min/max rarely excludes an equality
    probe on a high-cardinality column, a 10-bits/key bloom excludes ~99%
    of non-matching blocks. Prefix pruning needs bitmaps built with
    ``"col:<P>"`` specs and a query prefix of at least P bytes; blocks
    without prefix keys are kept (never wrong, only less pruned).

    The membership test runs distributed as a pure Catalyst expression
    (``bloom_probe_sql``: substring/conv/bit arithmetic on the bitmap
    bytes, probe hashes computed driver-side); only the surviving keep-set
    is collected, same O(#groups) cap-and-skip contract as
    ``prune_blocks``. A NULL bloom (no filter on that block, pre-bloom
    dir, unsupported type) always keeps the group — never wrong, only
    less pruned. Bitmaps stay out of the decode path entirely: this
    projection reads (part_id, block_id, bloom) only."""
    if "bloom" not in blocks.columns:
        return blocks
    if headers is None:
        headers, _ = _headers_by_column(blocks)
    if column not in headers:
        raise ValueError(f"column {column!r} not in the blocks table")
    meta = blocks.filter(F.col("column") == column).select(
        "part_id", "block_id", "bloom")
    may = _bloom_may_expr(meta, column, value, headers, op)
    if may is None:
        return blocks
    return _keep_groups(blocks, meta, may, max_groups)


def _bloom_may_expr(meta: DataFrame, column: str, value, headers: dict,
                    op: str = "="):
    """The bloom may-keep Column for ``column op value`` over a blocks
    metadata row carrying a ``bloom`` column, or None when bitmaps cannot
    prune (unsupported column kind, unprobable value, oversized IN list).
    ``meta`` must be the column-filtered metadata frame — the
    prefix/contains paths pull their stored key lengths from it. All
    probe rules and safety notes of :func:`prune_blocks_bloom` live
    here."""
    from nail_parquet_spark.codec.bloom import (
        _NGRAM_FLAG, _PREFIX_FLAG, bloom_ngram_probe_sql,
        bloom_prefix_probe_sql, bloom_probe_sql)
    from nail_parquet_spark.codec.kernels import _type_from_str

    t = _type_from_str(headers[column]["type"])
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        kind = "int"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        kind = "str"
    else:
        return None
    if op == "prefix":
        if kind != "str":
            return None
        # discover the stored prefix-key lengths (tail byte of flagged
        # bitmaps — P rides BEFORE the N byte when gram keys are also
        # present): one encode run uses one P, so this driver pull is a
        # handful of tiny rows — then each block probes with its own P
        b0 = F.conv(F.hex(F.substring("bloom", 1, 1)), 16, 10).cast("int")
        flag = b0.bitwiseAND(_PREFIX_FLAG) != 0
        ppos = F.when(b0.bitwiseAND(_NGRAM_FLAG) != 0, F.lit(-2)) \
            .otherwise(F.lit(-1))
        plens = [
            int(r[0]) for r in meta.filter(F.col("bloom").isNotNull() & flag)
            .select(F.conv(F.hex(F.substring(F.col("bloom"), ppos, F.lit(1))),
                           16, 10).cast("int")).distinct().limit(64).collect()
        ]
        probe = bloom_prefix_probe_sql("bloom", value, plens)
    elif op == "contains":
        if kind != "str":
            return None
        # discover the stored n-gram-key lengths (always the LAST tail
        # byte of 0x40-flagged bitmaps); each block probes its own N
        b0 = F.conv(F.hex(F.substring("bloom", 1, 1)), 16, 10).cast("int")
        nflag = b0.bitwiseAND(_NGRAM_FLAG) != 0
        nlens = [
            int(r[0]) for r in meta.filter(F.col("bloom").isNotNull() & nflag)
            .select(F.conv(F.hex(F.substring("bloom", -1, 1)), 16, 10)
                    .cast("int")).distinct().limit(64).collect()
        ]
        probe = bloom_ngram_probe_sql("bloom", value, nlens)
    elif op == "in":
        # OR of per-value probes: a block survives if ANY listed value may
        # be present. Any unprobable value (or an oversized list) keeps the
        # whole thing unpruned — never wrong.
        vals = list(value)
        if not vals or len(vals) > _IN_PRUNE_CAP:
            return None if vals else F.lit(False)
        probes = [bloom_probe_sql("bloom", x, kind) for x in vals]
        if any(p is None for p in probes):
            return None
        probe = " OR ".join(f"({p})" for p in probes)
    else:
        probe = bloom_probe_sql("bloom", value, kind)
    if probe is None:
        return None
    return F.col("bloom").isNull() | F.expr(probe)


def decode_table_where(blocks: DataFrame, column: str, op: str, value,
                       columns: list[str] | None = None,
                       num_partitions: int | None = None,
                       file_keyed: bool = True,
                       max_groups: int = 100_000,
                       pre_grouped: bool = False) -> DataFrame:
    """decode_table with predicate pushdown: zone-map block pruning
    (prune_blocks) + the exact residual row filter after decode. Semantics
    equal decode_table(blocks, columns).filter(column op value); cost skips
    reading and decoding every group the stats rule out."""
    return decode_table_where_all(
        blocks, [(column, op, value)], columns=columns,
        num_partitions=num_partitions, file_keyed=file_keyed,
        max_groups=max_groups, pre_grouped=pre_grouped)


def _pred_expr(col_: str, op_: str, val_) -> F.Column:
    """The exact Catalyst expression for one (column, op, value) predicate —
    the residual filter that keeps pushdown semantics identical to
    decode-then-filter."""
    c = F.col(col_)
    if op_ == "prefix":
        return c.startswith(val_)
    if op_ == "contains":
        return c.contains(val_)
    if op_ == "in":
        vals_ = list(val_)
        return c.isin(vals_) if vals_ else F.lit(False)
    if op_ == "isnull":
        return c.isNull()
    if op_ == "notnull":
        return c.isNotNull()
    return {
        "=": c == val_, "==": c == val_, "!=": c != val_,
        ">": c > val_, ">=": c >= val_,
        "<": c < val_, "<=": c <= val_,
    }[op_]


def _as_clause(item) -> list[tuple]:
    """Normalize a predicate item: a bare (col, op, val) triple is a
    1-disjunct clause; a list/tuple of triples is an OR-clause."""
    if (isinstance(item, (list, tuple)) and item
            and isinstance(item[0], (list, tuple))):
        return [tuple(p) for p in item]
    return [tuple(item)]


def _prune_one(pruned: DataFrame, col_: str, op_: str, val_,
               max_groups: int, headers: dict) -> DataFrame:
    """Zone-map + bloom pruning for one predicate in ONE metadata job:
    the two may-keep expressions AND together over the same
    column-filtered metadata frame, so the keep-set collect runs once
    where the chained prune_blocks -> prune_blocks_bloom form ran two
    (r06 — at corpus scale each collect is a full metadata-table job).
    The combined keep-set equals the sequential composition's; the only
    divergence is at the max_groups cap, where either form may simply
    prune less — never wrong, the residual row filter keeps semantics
    exact."""
    if op_ not in _PRUNE_OPS and op_ != "contains":
        raise ValueError(
            f"op must be one of {_PRUNE_OPS + ('contains',)}, got {op_!r}")
    if col_ not in headers:
        raise ValueError(f"column {col_!r} not in the blocks table")
    mays = []
    if op_ != "contains":
        # zone maps cannot bound a substring predicate
        z = _zone_may_expr(col_, op_, val_, headers)
        if z is not None:
            mays.append(z)
    meta_cols = ["part_id", "block_id", "min_val", "max_val",
                 "n_rows", "null_count"]
    if "bloom" in pruned.columns:
        meta_cols.append("bloom")
    meta = pruned.filter(F.col("column") == col_).select(*meta_cols)
    if op_ in ("=", "==", "prefix", "in", "contains") and "bloom" in meta_cols:
        b = _bloom_may_expr(meta, col_, val_, headers, op_)
        if b is not None:
            mays.append(b)
    if not mays:
        return pruned
    may = mays[0]
    for m in mays[1:]:
        may = may & m
    return _keep_groups(pruned, meta, may, max_groups)


def _prune_clause(pruned: DataFrame, clause: list[tuple],
                  max_groups: int, headers: dict) -> DataFrame:
    """Prune for an OR-clause: a group survives when ANY disjunct's zone
    maps / blooms admit it — the UNION of the per-disjunct keep-sets,
    collected driver-side (O(#groups) per disjunct, same cost class as
    prune_blocks) and re-applied as literal isin filters. Over
    ``max_groups`` the clause prunes nothing — never wrong, only
    unpruned."""
    if len(clause) == 1:
        return _prune_one(pruned, *clause[0], max_groups, headers)
    pairs: set = set()
    for col_, op_, val_ in clause:
        f1 = _prune_one(pruned, col_, op_, val_, max_groups, headers)
        got = (f1.select("part_id", "block_id").distinct()
               .limit(max_groups + 1).collect())
        if len(got) > max_groups:
            return pruned
        pairs |= {(r["part_id"], r["block_id"]) for r in got}
        if len(pairs) > max_groups:
            return pruned
    parts = sorted({p for p, _ in pairs})
    bids = sorted({b for _, b in pairs})
    return pruned.filter(F.col("part_id").isin(parts)
                         & F.col("block_id").isin(bids))


def decode_table_where_all(blocks: DataFrame, predicates,
                           columns: list[str] | None = None,
                           num_partitions: int | None = None,
                           file_keyed: bool = True,
                           max_groups: int = 100_000,
                           pre_grouped: bool = False) -> DataFrame:
    """CNF pushdown decode: ``predicates`` is a list of clauses ANDed
    together, where each clause is either a bare (column, op, value)
    triple or a LIST of triples ORed together. Each clause prunes block
    groups via zone maps + blooms (single-disjunct clauses chain exactly
    as before; OR-clauses keep the union of their disjuncts' keep-sets —
    see _prune_clause), then ONE decode runs over the surviving groups and
    the exact CNF expression filters residually. Semantics equal
    decode_table(...).filter((p11 OR p12 ...) AND (p21 ...) AND ...)."""
    clauses = [_as_clause(p) for p in predicates]
    if not clauses:
        raise ValueError("predicates must be non-empty")
    headers, refs = _headers_by_column(blocks)
    out_cols = columns if columns is not None else sorted(headers)
    pruned = blocks
    for clause in clauses:
        pruned = _prune_clause(pruned, clause, max_groups, headers)
    use_cols = list(out_cols)
    for clause in clauses:
        for col_, _, _ in clause:
            if col_ not in use_cols:
                use_cols.append(col_)
    # headers pass through: an all-pruned frame decodes to an empty typed
    # frame, so the emptiness probe job is gone (r06)
    dec = decode_table(pruned, columns=use_cols,
                       num_partitions=num_partitions, file_keyed=file_keyed,
                       headers=headers, refs=refs, pre_grouped=pre_grouped)
    residual = None
    for clause in clauses:
        one = None
        for col_, op_, val_ in clause:
            e = _pred_expr(col_, op_, val_)
            one = e if one is None else (one | e)
        residual = one if residual is None else (residual & one)
    return dec.filter(residual).select(*out_cols)


def _stats_parser(headers: dict[str, dict], column: str):
    """(parse, is_str) for reading a column's str()-rendered zone stats back
    into a totally-ordered python value. Raises for stat kinds whose renders
    are not truncation-order-safe (timestamps) — callers decode-then-sort."""
    from nail_parquet_spark.codec.kernels import _type_from_str

    t = _type_from_str(headers[column]["type"])
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return int, False
    if pa.types.is_floating(t):
        return float, False
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return str, True
    raise ValueError(
        f"top-k pruning needs integer/float/string zone stats; column "
        f"{column!r} has type {headers[column]['type']}")


def prune_blocks_topk(blocks: DataFrame, column: str, k: int,
                      descending: bool = True,
                      max_groups: int = 100_000,
                      headers: dict[str, dict] | None = None) -> DataFrame:
    """Zone-map pruning for ``ORDER BY column [DESC|ASC] LIMIT k``: keep
    only block groups that can contain a top-k row.

    Metadata algorithm (driver-side, O(#groups), reads NO data):
    1. collect per-group (min, max, n_rows, null_count) for ``column``;
    2. sort bound-known groups by their best-possible value (max for
       desc, min for asc);
    3. take groups greedily until the taken groups' non-null rows reach
       ``k``; the bound L = the worst value GUARANTEED inside the taken
       set (min of taken mins for desc, max of taken maxes for asc) —
       at least k rankable rows are at-or-better-than L;
    4. additionally keep every group whose best side beats-or-ties L.
       Any row outside the keep-set is strictly worse than L <= the true
       k-th value, so it cannot rank; boundary ties all live inside the
       keep-set, where the exact residual sort resolves them.

    Safety degradations (never wrong, only unpruned):
    - groups with missing stats (min NULL, not all-null) are always kept
      and never contribute to the bound;
    - string stats at the 64-char render cap: a truncated MAX is unknown
      (treated as +inf: kept in desc mode, bars the bound in asc mode);
      a truncated MIN is a valid lower bound (prefix <= true min) —
      usable for the desc bound, and only ever keeps extra in asc;
    - all-null groups are dropped (NULL never ranks — see decode_topk);
    - over ``max_groups``, or when bounded groups hold fewer than k
      rankable rows, pruning is skipped entirely.

    Supported stat kinds: integer/boolean, float, string (the zone stats
    are str()-rendered; timestamp renders are not total-order-safe under
    truncation, so they raise — decode then sort for those).
    """
    if k < 1:
        raise ValueError("prune_blocks_topk: k must be >= 1")
    if headers is None:
        headers, _ = _headers_by_column(blocks)
    if column not in headers:
        raise ValueError(f"column {column!r} not in the blocks table")
    parse, is_str = _stats_parser(headers, column)

    meta = (blocks.filter(F.col("column") == column)
            .select("part_id", "block_id", "min_val", "max_val",
                    "n_rows", "null_count")
            .limit(max_groups + 1).collect())
    if len(meta) > max_groups:
        return blocks

    always: list[tuple] = []     # kept unconditionally, no bound available
    bounded: list[tuple] = []    # (best, worst, nn, part, block)
    for r in meta:
        nn = int(r["n_rows"]) - int(r["null_count"])
        if nn <= 0:
            continue  # all-null group: NULL never ranks
        key = (r["part_id"], r["block_id"])
        lo_s, hi_s = r["min_val"], r["max_val"]
        if lo_s is None or hi_s is None:
            always.append(key)
            continue
        try:
            lo, hi = parse(lo_s), parse(hi_s)
        except (TypeError, ValueError):
            always.append(key)
            continue
        lo_trunc = is_str and len(lo_s) >= 64
        hi_trunc = is_str and len(hi_s) >= 64
        if descending:
            # best = hi (+inf when truncated -> unconditional keep);
            # worst-guarantee = lo (truncated lo is still a lower bound)
            if hi_trunc:
                always.append(key)
            else:
                bounded.append((hi, lo, nn, key))
        else:
            # best = lo (truncated lo only ever sorts the group earlier
            # and weakens nothing); worst-guarantee = hi, unusable when
            # truncated -> unconditional keep
            if hi_trunc:
                always.append(key)
            else:
                bounded.append((lo, hi, nn, key))

    if sum(nn for _, _, nn, _ in bounded) < k:
        return blocks  # cannot form a k-row guarantee: no pruning

    bounded.sort(key=lambda g: g[0], reverse=descending)
    taken = 0
    bound = None
    keep = set(always)
    for i, (best, worst, nn, key) in enumerate(bounded):
        keep.add(key)
        taken += nn
        if taken >= k:
            worsts = [g[1] for g in bounded[: i + 1]]
            bound = min(worsts) if descending else max(worsts)
            rest = bounded[i + 1:]
            break
    for best, _, _, key in rest:
        ok = (best >= bound) if descending else (best <= bound)
        if ok:
            keep.add(key)
    parts = sorted({p for p, _ in keep})
    bids = sorted({b for _, b in keep})
    return blocks.filter(F.col("part_id").isin(parts)
                         & F.col("block_id").isin(bids))


def decode_topk(blocks: DataFrame, column: str, k: int,
                tiebreak: str | None = None, descending: bool = True,
                columns: list[str] | None = None,
                num_partitions: int | None = None,
                file_keyed: bool = True,
                max_groups: int = 100_000,
                pre_grouped: bool = False) -> DataFrame:
    """``ORDER BY column [DESC|ASC][, tiebreak ASC] LIMIT k`` served with
    zone-map block pruning (:func:`prune_blocks_topk`): only groups that
    can contain a top-k row are read and decoded, then the exact global
    sort-limit runs on the decoded remainder (Spark plans it as
    TakeOrderedAndProject — per-partition heaps, no full sort).

    Pinned semantics: rows with NULL in ``column`` never rank (excluded —
    engines disagree on default null ordering, the contract removes the
    divergence); pass ``tiebreak`` (sorted ascending) whenever boundary
    determinism matters. Semantics equal
    ``decode_table(blocks, columns).filter(col.isNotNull())
    .orderBy(col [desc], tiebreak).limit(k)``.
    """
    headers, refs = _headers_by_column(blocks)
    out_cols = columns if columns is not None else sorted(headers)
    use_cols = list(out_cols)
    for extra in (column, tiebreak):
        if extra is not None and extra not in use_cols:
            use_cols.append(extra)
    pruned = prune_blocks_topk(blocks, column, k, descending=descending,
                               max_groups=max_groups, headers=headers)
    # headers pass through, so an all-pruned frame decodes to an empty typed
    # frame directly — no emptiness probe job (r06: each extra action over
    # an uncached blocks plan re-ran the whole upstream encode)
    dec = decode_table(pruned, columns=use_cols,
                       num_partitions=num_partitions, file_keyed=file_keyed,
                       headers=headers, refs=refs, pre_grouped=pre_grouped)
    order = [F.col(column).desc() if descending else F.col(column).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    return (dec.filter(F.col(column).isNotNull())
            .orderBy(*order).limit(int(k)).select(*out_cols))


def prune_blocks_topk_by(blocks: DataFrame, group_col: str, column: str,
                         k: int, descending: bool = True,
                         max_groups: int = 100_000,
                         headers: dict[str, dict] | None = None) -> DataFrame:
    """Zone-map pruning for a per-group top-k (``row_number() OVER
    (PARTITION BY group_col ORDER BY column [DESC|ASC]) <= k``): keep only
    block groups that can contain a top-k row of SOME group.

    The reference has no grouped pushdown at all (`nail-parquet` decodes
    then sorts, src/commands/data.rs); this is the lakehouse-native shape:
    when the ingest layout clusters by the group column (sort / Z-order by
    lang or domain — exactly what ``optimize --sort-by`` produces), most
    blocks are single-group "point blocks" and the single-column greedy
    bound of :func:`prune_blocks_topk` applies independently per group.

    Metadata algorithm (driver-side, O(#groups), reads NO payloads):
    - a block whose group zone is a single parseable untruncated value
      ("point block") joins that group's greedy bound: sort the group's
      point blocks by best value, take until the guaranteed rankable-row
      count reaches k, then additionally keep every point block whose best
      side beats-or-ties the resulting bound;
    - a block whose group zone spans values (or is unparseable/truncated)
      is ALWAYS kept — its rows may belong to any group, including groups
      living only in spanning blocks, so no per-group bound can drop it;
    - guaranteed rankable rows per block = n_rows - group nulls - value
      nulls (conservative under joint nulls: understating only prunes
      less); a block certainly empty of rankable rows (all-null group or
      all-null value) is dropped — NULLs never rank in either column;
    - value-side truncation rules are exactly prune_blocks_topk's (a
      truncated MAX bars the bound side it backs; a truncated MIN is a
      valid lower bound).

    Supported stat kinds for BOTH columns: integer/boolean, float, string
    (timestamp renders are not truncation-order-safe and raise). Over
    ``max_groups`` metadata rows per column, pruning is skipped.
    """
    if k < 1:
        raise ValueError("prune_blocks_topk_by: k must be >= 1")
    if group_col == column:
        raise ValueError("group_col and column must differ")
    if headers is None:
        headers, _ = _headers_by_column(blocks)
    for c in (group_col, column):
        if c not in headers:
            raise ValueError(f"column {c!r} not in the blocks table")
    vparse, v_str = _stats_parser(headers, column)
    gparse, g_str = _stats_parser(headers, group_col)

    # physical-block identity is (source file, part_id, block_id): encode
    # jobs restart part ids at 0, so the bare pair COLLIDES across the
    # batch=* dirs a snapshot table unions — keying stats by the pair
    # alone would overwrite one batch's block with another's and could
    # prune rows that hold a group's true top-k
    meta = (_src_expr_frame(blocks)
            .filter(F.col("column").isin([group_col, column]))
            .select("__src", "column", "part_id", "block_id", "min_val",
                    "max_val", "n_rows", "null_count")
            .limit(2 * max_groups + 1).collect())
    if len(meta) > 2 * max_groups:
        return blocks
    gstats: dict[tuple, object] = {}
    vstats: dict[tuple, object] = {}
    for r in meta:
        key = (r["__src"], r["part_id"], r["block_id"])
        side = gstats if r["column"] == group_col else vstats
        if key in side:
            # physical identity collapsed (empty __src over a union of
            # in-memory encode jobs): stats would shadow each other, so
            # prune NOTHING — the decode layer's duplicate-group refusal
            # then decides loudly whether the table is even readable
            return blocks
        side[key] = r

    always: set[tuple] = set()
    # gval -> {"always": [key], "bounded": [(best, worst, nn, key)]}
    per_group: dict[object, dict] = {}
    for key, gr in gstats.items():
        vr = vstats.get(key)
        if vr is None:
            always.add(key)  # value stats missing: keep unconditionally
            continue
        n = int(gr["n_rows"])
        if int(gr["null_count"]) >= n or int(vr["null_count"]) >= n:
            continue  # certainly no rankable row in this block
        glo_s, ghi_s = gr["min_val"], gr["max_val"]
        if glo_s is None or ghi_s is None:
            always.add(key)
            continue
        if g_str and (len(glo_s) >= 64 or len(ghi_s) >= 64):
            always.add(key)  # truncated render: point-ness unknowable
            continue
        try:
            glo, ghi = gparse(glo_s), gparse(ghi_s)
        except (TypeError, ValueError):
            always.add(key)
            continue
        if glo != ghi:
            always.add(key)  # spanning block: may hold any group
            continue
        nn = max(0, n - int(gr["null_count"]) - int(vr["null_count"]))
        bucket = per_group.setdefault(glo, {"always": [], "bounded": []})
        vlo_s, vhi_s = vr["min_val"], vr["max_val"]
        if vlo_s is None or vhi_s is None:
            bucket["always"].append(key)
            continue
        try:
            vlo, vhi = vparse(vlo_s), vparse(vhi_s)
        except (TypeError, ValueError):
            bucket["always"].append(key)
            continue
        hi_trunc = v_str and len(vhi_s) >= 64
        if descending:
            if hi_trunc:
                bucket["always"].append(key)  # best side unknown: +inf
            else:
                bucket["bounded"].append((vhi, vlo, nn, key))
        else:
            if hi_trunc:
                bucket["always"].append(key)  # worst-guarantee unusable
            else:
                bucket["bounded"].append((vlo, vhi, nn, key))

    keep = set(always)
    for bucket in per_group.values():
        keep.update(bucket["always"])
        bounded = bucket["bounded"]
        if sum(nn for _, _, nn, _ in bounded) < k:
            keep.update(key for _, _, _, key in bounded)
            continue
        bounded.sort(key=lambda g: g[0], reverse=descending)
        taken = 0
        rest: list = []
        bound = None
        for i, (best, worst, nn, key) in enumerate(bounded):
            keep.add(key)
            taken += nn
            if taken >= k:
                worsts = [g[1] for g in bounded[: i + 1]]
                bound = min(worsts) if descending else max(worsts)
                rest = bounded[i + 1:]
                break
        for best, _, _, key in rest:
            ok = (best >= bound) if descending else (best <= bound)
            if ok:
                keep.add(key)

    # project physical keys back to (part, block) pairs: the pair filter
    # keeps every physical block sharing a kept pair — a superset, sound
    # (an empty keep-set short-circuits to filter(False) inside the helper)
    return _filter_block_pairs(blocks, {(p, b) for _, p, b in keep})


def decode_topk_by(blocks: DataFrame, group_col: str, column: str, k: int,
                   tiebreak: str | None = None, descending: bool = True,
                   columns: list[str] | None = None,
                   num_partitions: int | None = None,
                   file_keyed: bool = True,
                   max_groups: int = 100_000,
                   pre_grouped: bool = False) -> DataFrame:
    """Per-group ``ORDER BY column [DESC|ASC][, tiebreak ASC] LIMIT k``
    (top-k rows for EVERY distinct group_col value) served with grouped
    zone-map block pruning (:func:`prune_blocks_topk_by`), then the exact
    per-group window on the decoded remainder — a keyed window
    (PARTITION BY group_col), never a global one.

    Pinned semantics: rows with NULL in ``group_col`` OR ``column`` never
    rank (engines disagree on null partitions/ordering; the contract
    removes the divergence). Equal to::

        decode_table(blocks, columns)
          .filter(g.isNotNull() & v.isNotNull())
          .withColumn(rn, row_number().over(
              Window.partitionBy(g).orderBy(v [desc], tiebreak)))
          .filter(rn <= k)

    Pass ``tiebreak`` whenever boundary determinism matters.
    """
    from pyspark.sql import Window

    headers, refs = _headers_by_column(blocks)
    out_cols = columns if columns is not None else sorted(headers)
    use_cols = list(out_cols)
    for extra in (group_col, column, tiebreak):
        if extra is not None and extra not in use_cols:
            use_cols.append(extra)
    pruned = prune_blocks_topk_by(blocks, group_col, column, k,
                                  descending=descending,
                                  max_groups=max_groups, headers=headers)
    # headers pass through: no emptiness probe job (see decode_topk)
    dec = decode_table(pruned, columns=use_cols,
                       num_partitions=num_partitions, file_keyed=file_keyed,
                       headers=headers, refs=refs, pre_grouped=pre_grouped)
    order = [F.col(column).desc() if descending else F.col(column).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (dec.filter(F.col(group_col).isNotNull()
                       & F.col(column).isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(k))
            .select(*out_cols))


def _filter_block_pairs(blocks: DataFrame, pairs: set[tuple]) -> DataFrame:
    """Restrict a blocks table to an exact (part_id, block_id) pair set —
    NOT the parts x bids superset filter: callers here keep DIFFERENT
    blocks in different parts, which the superset would undo. Small sets
    apply as a literal isin on a concat key (pushed into the scan); larger
    ones as a broadcast semi-join."""
    if not pairs:
        return blocks.filter(F.lit(False))
    if len(pairs) <= 4096:
        sep_key = F.concat_ws("#", F.col("part_id").cast("string"),
                              F.col("block_id").cast("string"))
        return blocks.filter(sep_key.isin([f"{p}#{b}" for p, b in pairs]))
    keys_df = blocks.sparkSession.createDataFrame(
        sorted(pairs), "part_id long, block_id long")
    return blocks.join(F.broadcast(keys_df), ["part_id", "block_id"],
                       "left_semi")


def decode_semijoin(blocks: DataFrame, keys: DataFrame, key_col: str,
                    columns: list[str] | None = None,
                    num_partitions: int | None = None,
                    file_keyed: bool = True,
                    max_groups: int = 100_000,
                    inline_keys_max: int = 64,
                    deletes: DataFrame | None = None,
                    pre_grouped: bool = False) -> DataFrame:
    """Late-materialization lookup join: the rows of the encoded table whose
    ``key_col`` value appears in the ``keys`` DataFrame — SQL
    ``WHERE key_col IN (SELECT key_col FROM keys)``. NULL keys never match
    (IN semantics); semi-join cardinality (each table row at most once,
    duplicate probe keys don't duplicate output).

    The reference can only decode-everything-then-filter
    (/root/reference/src/commands/data.rs); this is the columnar-native
    plan, staged so payload bytes it can rule out are NEVER read:

    1. a small probe set (<= ``inline_keys_max`` distinct values, found via
       a limit probe) prunes blocks first through zone maps + equality
       blooms (the ``'in'`` op of prune_blocks/prune_blocks_bloom);
    2. ONLY ``key_col`` decodes (with row coordinates) and semi-joins the
       probe to find matching coordinates — for a web corpus this touches
       the dict/FSST url blocks, never the text/html payloads;
    3. block groups holding at least one match decode fully
       (:func:`_filter_block_pairs` — exact pair filter), and a coordinate
       semi-join on ``POS_COLUMNS`` keeps exactly the matching rows.

    ``keys`` must either contain ``key_col`` or be a single-column frame
    (renamed). Above ``max_groups`` matching groups, stage 3's block filter
    is skipped (decode-all + coordinate semi-join — correct, unpruned).
    To enrich probe rows instead of filtering the table, join the returned
    frame back to ``keys`` on ``key_col``.

    ``deletes`` (optional): committed row coordinates in the ``POS_COLUMNS``
    shape (position deletes, or equality deletes resolved via
    ``pipeline.deletes.equality_positions``) — matching coordinates are
    anti-joined out BEFORE full materialization, so a snapshot table's
    merge-on-read view composes without resurfacing deleted rows.
    """
    headers, refs = _headers_by_column(blocks)
    if key_col not in headers:
        raise ValueError(f"column {key_col!r} not in the blocks table")
    if key_col in keys.columns:
        probe = keys.select(key_col)
    elif len(keys.columns) == 1:
        probe = keys.select(F.col(keys.columns[0]).alias(key_col))
    else:
        raise ValueError(
            f"keys frame (columns {keys.columns}) has no {key_col!r} column "
            "and is not single-column")
    probe = probe.filter(F.col(key_col).isNotNull()).distinct()

    out_cols = columns if columns is not None else sorted(headers)
    use_cols = list(out_cols)
    if key_col not in use_cols:
        use_cols.append(key_col)

    def empty():
        schema = _schema_from_headers(headers, out_cols)
        return blocks.sparkSession.createDataFrame([], _spark_ddl_of(schema))

    # stage 1: inline-able probe -> metadata-only block pruning
    pruned = blocks
    sample = [r[0] for r in probe.limit(inline_keys_max + 1).collect()]
    if not sample:
        return empty()
    if len(sample) <= inline_keys_max:
        try:
            pruned = _prune_one(blocks, key_col, "in", sample,
                                max_groups, headers)
        except ValueError:
            pruned = blocks  # kind without zone stats: no pruning
        # no emptiness probe job: with headers passed through, an all-
        # pruned frame flows to empty coords -> empty() in the tail (r06)

    # stage 2: key-column-only decode -> matching row coordinates
    keydec = decode_table(pruned, columns=[key_col], with_positions=True,
                          num_partitions=num_partitions,
                          file_keyed=file_keyed, headers=headers, refs=refs,
                          pre_grouped=pre_grouped)
    coords = keydec.join(probe, key_col, "left_semi").select(*POS_COLUMNS)
    if deletes is not None:
        coords = coords.join(deletes.select(*POS_COLUMNS),
                             on=POS_COLUMNS, how="left_anti")

    # stage 3: decode only block groups holding a match, keep exact rows
    return _materialize_coords(pruned, coords, out_cols, use_cols, empty,
                               num_partitions, file_keyed, max_groups,
                               headers=headers, refs=refs,
                               pre_grouped=pre_grouped)


def _materialize_coords(blocks: DataFrame, coords: DataFrame,
                        out_cols: list[str], use_cols: list[str],
                        empty, num_partitions, file_keyed,
                        max_groups: int,
                        headers: dict[str, dict] | None = None,
                        refs: dict[str, set] | None = None,
                        pre_grouped: bool = False) -> DataFrame:
    """Late-materialization tail shared by the coordinate-driven decodes:
    decode full payloads ONLY for block groups holding at least one
    coordinate (exact pair filter, driver pull capped at ``max_groups`` —
    over the cap the filter is skipped, correct but unpruned), then keep
    exactly the addressed rows by coordinate semi-join."""
    got = (coords.select("_part_id", "_block_id").distinct()
           .limit(max_groups + 1).collect())
    hit = blocks
    if len(got) <= max_groups:
        if not got:
            return empty()
        hit = _filter_block_pairs(
            blocks, {(r["_part_id"], r["_block_id"]) for r in got})
    full = decode_table(hit, columns=use_cols, with_positions=True,
                        num_partitions=num_partitions, file_keyed=file_keyed,
                        headers=headers, refs=refs, pre_grouped=pre_grouped)
    return (full.join(coords, on=POS_COLUMNS, how="left_semi")
            .select(*out_cols))


def decode_sample(blocks: DataFrame, key_col: str, fraction: float,
                  seed: int = 0,
                  columns: list[str] | None = None,
                  num_partitions: int | None = None,
                  file_keyed: bool = True,
                  max_groups: int = 100_000,
                  deletes: DataFrame | None = None,
                  pre_grouped: bool = False) -> DataFrame:
    """Key-stable deterministic sample of an encoded table with late
    materialization: ONLY ``key_col`` decodes first, rows are picked by
    the repo's pinned portable 60-bit md5 lane
    (``int(md5(key_str || ':' || seed)[:15 hex]) / 2^60 < fraction`` —
    the same lane split_by_group/weighted_sample use, reproducible in any
    engine), and full payloads decode only for block groups holding a
    picked row. For a web corpus that means sampling 1% of 100 TB reads
    the key blocks plus ~1% of the payload blocks, never the rest.

    Key-stable: the same key always draws the same uniform — re-encodes,
    re-layouts, and re-runs pick the same rows, and duplicate-key rows
    move as one unit (the dedup-friendly shape). NULL keys take the
    pinned ``'\\x00'`` sentinel (all-or-none together, matching
    split_by_group). ``seed`` re-deals. ``deletes`` composes the
    merge-on-read view exactly as :func:`decode_semijoin`.

    The reference samples only via full scans (src/commands/sample.rs);
    a block-granular shortcut would bias toward co-located rows — this
    keeps row-exact semantics AND block-level IO.
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("decode_sample: fraction must be in [0, 1]")
    headers, refs = _headers_by_column(blocks)
    if key_col not in headers:
        raise ValueError(f"column {key_col!r} not in the blocks table")
    out_cols = columns if columns is not None else sorted(headers)
    use_cols = list(out_cols)
    if key_col not in use_cols:
        use_cols.append(key_col)

    def empty():
        schema = _schema_from_headers(headers, out_cols)
        return blocks.sparkSession.createDataFrame([], _spark_ddl_of(schema))

    if fraction == 0.0:
        return empty()
    keydec = decode_table(blocks, columns=[key_col], with_positions=True,
                          num_partitions=num_partitions,
                          file_keyed=file_keyed, headers=headers, refs=refs,
                          pre_grouped=pre_grouped)
    ks = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(ks, F.lit(":" + str(int(seed)))),
                               "UTF-8")),
                1, 15),
            16, 10,
        ).cast("bigint").cast("double")
        / float(1 << 60)
    )
    coords = keydec.filter(u < float(fraction)).select(*POS_COLUMNS)
    if deletes is not None:
        coords = coords.join(deletes.select(*POS_COLUMNS),
                             on=POS_COLUMNS, how="left_anti")
    return _materialize_coords(blocks, coords, out_cols, use_cols, empty,
                               num_partitions, file_keyed, max_groups,
                               headers=headers, refs=refs,
                               pre_grouped=pre_grouped)
