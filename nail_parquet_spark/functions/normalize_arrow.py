"""Single-pass Arrow kernel for the script-profile COUNTS.

The SQL form (``normalize.script_profile_table(engine='sql')``) runs seven
``regexp_count`` scans plus a whitespace-strip ``regexp_replace`` per row —
"once each" after staging, but still eight full passes through the Java
regex / UTF-16 machinery, the same measured floor the quality suite
documents (BENCH/BASELINE §10/§17). This kernel decodes each batch to
UTF-32 codepoints ONCE (C-level ``str.join`` + ``encode``; no per-row
Python in the counting path) and answers EVERY class with a single
``np.searchsorted`` over one sorted 138-interval table — the seven script
classes are mutually disjoint and the ``[ \\t\\n\\r]`` space class overlaps
none of them, so one class-id lookup serves all eight counts.

Ground truth: ``functions/script_data.SCRIPT_INTERVALS`` is GENERATED from
the Java regex classes themselves (scripts/gen_script_tables.py), so the
kernel cannot drift from the oracle-attested regex path by transcription;
test_normalize_arrow sweeps every interval boundary (±1) and a random
codepoint sample against the SQL form per run.

Division of labor (the quality_arrow precedent): the kernel emits RAW
INTEGER counts only; the nonspace/other arithmetic and the dominance
argmax stay in the SAME Catalyst projection the SQL form uses, so the two
engines either match bit-for-bit or fail the equality tests — there is no
float or tie-break logic to diverge. NULL text emits NULL counts (the
shared projection then yields 'und', matching SQL's NULL semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from nail_parquet_spark.functions.script_data import SCRIPT_INTERVALS

#: class order must equal normalize.SCRIPT_CLASSES (script_data preserves it)
SCRIPT_NAMES = list(SCRIPT_INTERVALS)
_K = len(SCRIPT_NAMES)

#: the nonspace denominator class [ \t\n\r] — disjoint from every script
_SPACE_INTERVALS = [(0x09, 0x0A), (0x0D, 0x0D), (0x20, 0x20)]

_rows: list[tuple[int, int, int]] = []
for _k, _name in enumerate(SCRIPT_NAMES):
    _rows += [(a, b, _k) for a, b in SCRIPT_INTERVALS[_name]]
_rows += [(a, b, _K) for a, b in _SPACE_INTERVALS]
_rows.sort()
_STARTS = np.array([r[0] for r in _rows], dtype=np.uint32)
_ENDS = np.array([r[1] for r in _rows], dtype=np.uint32)
_CLS = np.array([r[2] for r in _rows], dtype=np.int64)

COUNT_COLUMNS = ["__len"] + [f"{n}_chars" for n in SCRIPT_NAMES] + ["space_chars"]


def _counts_of_batch(texts: pa.Array) -> dict[str, np.ndarray]:
    texts_py = texts.to_pylist()
    n = len(texts_py)
    lens = np.fromiter((len(t) if t is not None else 0 for t in texts_py),
                       dtype=np.int64, count=n)
    joined = "".join(t for t in texts_py if t)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    idx = np.searchsorted(_STARTS, cps, side="right") - 1
    idx_c = np.maximum(idx, 0)
    member = (idx >= 0) & (cps <= _ENDS[idx_c])
    code = doc_of[member] * (_K + 1) + _CLS[idx_c[member]]
    binc = np.bincount(code, minlength=n * (_K + 1)).reshape(n, _K + 1)
    out = {"__len": lens}
    for k, name in enumerate(SCRIPT_NAMES):
        out[f"{name}_chars"] = binc[:, k]
    out["space_chars"] = binc[:, _K]
    return out


def script_counts_arrow(df: DataFrame, id_col: str,
                        text_col: str) -> DataFrame:
    """(id, __len, <script>_chars..., space_chars) in ONE vectorized pass —
    the drop-in stage-1 twin of the SQL count projection inside
    ``normalize.script_profile_table``."""
    src = df.select(id_col, text_col)
    id_field = src.schema[id_col]
    chunk = 8192  # cache-resident working set (quality_arrow precedent)

    def run(batches):
        for batch in batches:
            for off in range(0, batch.num_rows, chunk):
                part = batch.slice(off, chunk)
                texts = part.column(1)
                counts = _counts_of_batch(texts)
                valid = (np.asarray(texts.is_valid())
                         if texts.null_count else None)
                arrays = [part.column(0)]
                for c in COUNT_COLUMNS:
                    mask = None if valid is None else ~valid
                    arrays.append(pa.array(counts[c], pa.int64(), mask=mask))
                yield pa.record_batch(arrays, names=[id_col] + COUNT_COLUMNS)

    ddl = ", ".join([f"`{id_col}` {id_field.dataType.simpleString()}"]
                    + [f"`{c}` bigint" for c in COUNT_COLUMNS])
    return src.mapInArrow(run, schema=ddl)
