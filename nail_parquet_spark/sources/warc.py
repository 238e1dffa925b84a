"""WARC source/sink — Common Crawl's native archive format.

The north-rule input table (url, warc_ts, html, text, lang) is what a
pipeline DERIVES from WARC files; this module closes the first hop:
``read_warc`` turns a directory of ``.warc`` / ``.warc.gz`` files into the
(url, warc_ts, html) page table, and ``write_warc`` exports a page table
back to spec-conformant WARC/1.0 for interchange.

Format (ISO 28500, the subset Common Crawl emits): each record is

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

For ``WARC-Type: response`` records the block is an HTTP/1.1 response;
the page payload is the bytes after the first ``\r\n\r\n`` of the block.
Parsing is length-directed (Content-Length), never delimiter-scanning, so
payload bytes that happen to contain ``WARC/1.0`` cannot desync it.

Scale shape: the parallel unit is the FILE (Common Crawl ships ~1 GB
``.warc.gz`` segments, thousands per crawl), via Spark's ``binaryFile``
source — one task per file, no shuffle. Decompression + parsing stream
through ``gzip.GzipFile`` and yield Arrow batches of ``batch_rows``
records, so peak memory per task is the COMPRESSED file (binaryFile
materializes it) plus one batch — never the whole decompressed archive.
Multi-member gzip (one member per record, how several writers emit) reads
transparently. No per-row Python on the Spark side of the boundary:
record fields land in Arrow arrays inside the generator.
"""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa

SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("warc_type", pa.string()),
    ("html", pa.binary()),
])


def _iter_records(stream):
    """Yield (headers: dict lower->str, block: bytes) per WARC record.
    Length-directed; tolerates any amount of \r\n padding between
    records; raises on a malformed header block (truncated archives
    should fail loudly, not silently drop tail records)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"malformed WARC: expected version line, got "
                             f"{line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h == b"":
                raise ValueError("malformed WARC: EOF inside a header block")
            if h in (b"\r\n", b"\n"):
                break
            k, _, v = h.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace"))
        n = int(headers.get("content-length", "0"))
        block = stream.read(n)
        if len(block) != n:
            raise ValueError("malformed WARC: truncated record block")
        yield headers, block


def _http_payload(block: bytes) -> bytes:
    """Body of an HTTP message block: bytes after the first CRLFCRLF
    (the whole block when no header separator exists — raw payloads)."""
    i = block.find(b"\r\n\r\n")
    return block[i + 4:] if i >= 0 else block


def parse_warc_bytes(data: bytes, gz: bool, types: tuple[str, ...],
                     batch_rows: int):
    """Yield pyarrow RecordBatches of SCHEMA from one archive's bytes."""
    import pandas as pd

    stream = gzip.GzipFile(fileobj=io.BytesIO(data)) if gz else io.BytesIO(data)
    urls, tss, kinds, bodies = [], [], [], []

    def _flush():
        ts = pd.to_datetime(pd.Series(tss, dtype="object"), utc=True,
                            format="ISO8601")
        yield pa.record_batch([
            pa.array(urls, pa.string()),
            pa.Array.from_pandas(ts, type=SCHEMA[1].type),
            pa.array(kinds, pa.string()),
            pa.array(bodies, pa.binary()),
        ], schema=SCHEMA)
        urls.clear(); tss.clear(); kinds.clear(); bodies.clear()

    for headers, block in _iter_records(stream):
        kind = headers.get("warc-type", "")
        if types and kind not in types:
            continue
        ct = headers.get("content-type", "")
        body = (_http_payload(block)
                if ct.startswith("application/http") else block)
        urls.append(headers.get("warc-target-uri"))
        tss.append(headers.get("warc-date"))
        kinds.append(kind)
        bodies.append(body)
        if len(urls) >= batch_rows:
            yield from _flush()
    if urls:
        yield from _flush()


def read_warc(spark, path: str, types: tuple[str, ...] = ("response",),
              batch_rows: int = 1024):
    """Distributed WARC scan: ``(url, warc_ts, warc_type, html)`` with one
    row per record of a kind in ``types`` (default: response records only
    — pass ``()`` to keep warcinfo/request/metadata records too).

    ``html`` carries the HTTP response body verbatim (feed it to
    functions/html.html_body_text / the encode pipeline); ``warc_ts`` is
    the WARC-Date capture timestamp.
    """
    from pyspark.sql import functions as F

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))

    def _parse(it):
        for pdf in it:
            for p, data in zip(pdf["path"], pdf["content"]):
                gz = p.endswith(".gz")
                for batch in parse_warc_bytes(bytes(data), gz, tuple(types),
                                              batch_rows):
                    yield batch.to_pandas()

    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType, TimestampType)

    out_schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("warc_type", StringType()),
        StructField("html", BinaryType()),
    ])
    return files.mapInPandas(_parse, out_schema)


def _record_bytes(url, ts, body: bytes, wet: bool = False) -> bytes:
    """One spec-conformant WARC/1.0 record: an HTTP-wrapped ``response``
    (the shape Common Crawl WARC files have) or, with ``wet=True``, a
    bare ``conversion`` record with a text/plain block (the WET extracted-
    text sidecar format)."""
    if wet:
        kind, ctype, block = "conversion", "text/plain", body
    else:
        kind, ctype = "response", "application/http; msgtype=response"
        block = (b"HTTP/1.1 200 OK\r\nContent-Length: "
                 + str(len(body)).encode() + b"\r\n\r\n" + body)
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {kind}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return headers + block + b"\r\n\r\n"


def write_warc(df, out_dir: str, url_col: str = "url",
               ts_col: str = "warc_ts", body_col: str = "html",
               compress: bool = True, wet: bool = False,
               cdx: bool = False) -> int:
    """Export a page table to WARC: each partition writes ONE
    ``part-<pid>.warc[.gz]`` via an attempt-unique temp name + atomic
    rename (same crash-safe sink discipline as codec/encode.py), records
    in partition order. ``wet=True`` emits WET conversion records (bare
    text/plain blocks — pass the extracted-text column as ``body_col``)
    and names parts ``.warc.wet[.gz]``. Returns the number of part files
    written.

    Compressed output uses ONE GZIP MEMBER PER RECORD — exactly how
    Common Crawl writes its archives (the multi-member stream reads
    identically to whole-file gzip, and every record is independently
    decompressible). That makes ``cdx=True`` possible: alongside the
    parts it writes a ``_cdx/`` parquet index of (url, warc_ts, filename,
    offset, length) byte spans — the capture-index shape (CDXJ) the
    Wayback/CC infrastructure serves — enabling :func:`fetch_record`
    random access to one page without scanning the archive.
    """
    from pyspark.sql import functions as _F
    from pyspark.sql.types import StringType

    os.makedirs(out_dir, exist_ok=True)
    if cdx:
        os.makedirs(os.path.join(out_dir, "_cdx"), exist_ok=True)
    ext = (".warc.wet" if wet else ".warc") + (".gz" if compress else "")

    sel = df.select(url_col, ts_col, body_col)
    if isinstance(sel.schema[body_col].dataType, StringType):
        sel = sel.withColumn(body_col, _F.encode(_F.col(body_col), "UTF-8"))

    def _write(it):
        import pandas as pd  # noqa: F401

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        att = ctx.attemptNumber() if ctx is not None else 0
        fname = f"part-{pid:05d}{ext}"
        final = os.path.join(out_dir, fname)
        tmp = final + f".attempt{att}.tmp"
        n = 0
        idx_urls, idx_ts, idx_off, idx_len = [], [], [], []
        with open(tmp, "wb") as f:
            for pdf in it:
                for u, ts, body in zip(pdf[url_col], pdf[ts_col],
                                       pdf[body_col]):
                    rec = _record_bytes(u, ts, bytes(body), wet=wet)
                    if compress:
                        rec = gzip.compress(rec, compresslevel=6)
                    if cdx:
                        idx_urls.append(u)
                        idx_ts.append(ts)
                        idx_off.append(f.tell())
                        idx_len.append(len(rec))
                    f.write(rec)
                    n += 1
        if n:
            os.replace(tmp, final)
            if cdx:
                import pyarrow.parquet as _pq

                t = pa.table({
                    "url": pa.array(idx_urls, pa.string()),
                    "warc_ts": pa.Array.from_pandas(
                        pd.Series(idx_ts), type=SCHEMA[1].type),
                    "filename": pa.array([fname] * n, pa.string()),
                    "offset": pa.array(idx_off, pa.int64()),
                    "length": pa.array(idx_len, pa.int64()),
                })
                cpath = os.path.join(out_dir, "_cdx", f"part-{pid:05d}.parquet")
                ctmp = cpath + f".attempt{att}.tmp"
                _pq.write_table(t, ctmp)
                os.replace(ctmp, cpath)
        else:
            os.remove(tmp)
        yield pd.DataFrame({"part": [pid], "n_records": [n]})

    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    manifest = sel.mapInPandas(
        _write, StructType([StructField("part", IntegerType()),
                            StructField("n_records", LongType())]))
    return manifest.filter("n_records > 0").count()


def read_cdx(spark, out_dir: str):
    """The capture index written by ``write_warc(cdx=True)``."""
    return spark.read.parquet(os.path.join(out_dir, "_cdx"))


def fetch_record(out_dir: str, filename: str, offset: int, length: int):
    """Random-access one record by its CDX byte span: seek, read
    ``length`` bytes, decompress the single gzip member if compressed,
    parse. Returns ``(headers, payload)`` — the payload with HTTP headers
    already stripped for http blocks. This is the driver-side page-serve
    path (one page out of a 100-TB archive without touching the rest)."""
    path = os.path.join(out_dir, filename)
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(length)
    if filename.endswith(".gz"):
        raw = gzip.decompress(raw)
    headers, block = next(_iter_records(io.BytesIO(raw)))
    ct = headers.get("content-type", "")
    body = _http_payload(block) if ct.startswith("application/http") else block
    return headers, body
