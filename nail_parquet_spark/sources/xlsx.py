"""Minimal dependency-free XLSX read/write (stdlib zipfile + ElementTree).

The reference reads/writes Excel driver-side with calamine/rust_xlsxwriter
(io.rs:36-322); this container ships no openpyxl/xlsxwriter, so a small
native implementation covers the same surface: one sheet, header row,
strings / numbers / booleans / None. Like the reference, it is driver-side
and bounded by Excel's 1,048,576-row sheet limit — xlsx is an exchange
format, not a data-lake format.

Writer uses inline strings (no sharedStrings table, simpler and legal);
reader handles inline strings, sharedStrings, booleans, and numbers.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


# \x0d (CR) is *legal* XML but parsers normalize it to LF on read, so it
# must be escaped too for round-trip fidelity (OOXML emits _x000D_ as well).
_ILLEGAL_XML = re.compile("[\x00-\x08\x0b-\x1f]")
_OOXML_ESC = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _sanitize(s: str) -> str:
    """XML 1.0 forbids most control chars even escaped; OOXML's convention
    is the literal _xHHHH_ escape, which Excel round-trips."""
    s = s.replace("_x", "_x005F_x")  # escape pre-existing literal escapes
    return _ILLEGAL_XML.sub(lambda m: f"_x{ord(m.group()):04X}_", s)


def _unsanitize(s: str) -> str:
    return _OOXML_ESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def _cell_xml(ref: str, v) -> str:
    if v is None or (isinstance(v, float) and v != v):  # None/NaN -> blank
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(_sanitize(str(v)))}</t></is></c>'
    )


def write_xlsx(pdf, path: str) -> None:
    """Write a pandas DataFrame (header + rows) as a single-sheet xlsx."""
    rows_xml = []
    header = "".join(
        _cell_xml(f"{_col_letter(j)}1", str(c)) for j, c in enumerate(pdf.columns)
    )
    rows_xml.append(f'<row r="1">{header}</row>')
    for i, row in enumerate(pdf.itertuples(index=False), start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(j)}{i}", v) for j, v in enumerate(row)
        )
        rows_xml.append(f'<row r="{i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


_REF_RE = re.compile(r"([A-Z]+)(\d+)")

_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOCREL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _first_sheet_part(z: zipfile.ZipFile) -> str | None:
    """The workbook's FIRST sheet in tab order (workbook.xml sheet list ->
    rels target) — lexicographic part names lie (sheet10.xml < sheet2.xml,
    and Excel renumbers parts after deletions)."""
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {r.get("Id"): r.get("Target") for r in rels.iter(f"{_REL_NS}Relationship")}
        for sheet in wb.iter(f"{_NS}sheet"):
            rid = sheet.get(f"{_DOCREL_NS}id")
            tgt = targets.get(rid)
            if tgt:
                tgt = tgt.lstrip("/")
                part = tgt if tgt.startswith("xl/") else f"xl/{tgt}"
                if part in z.namelist():
                    return part
    except (KeyError, ET.ParseError):
        pass
    names = sorted(
        n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
    )
    return names[0] if names else None


def _col_index(letters: str) -> int:
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch) - 64)
    return i - 1


def read_xlsx(path: str):
    """Read sheet 1 of an xlsx into a pandas DataFrame (first row = header).

    Handles inline strings, sharedStrings, booleans, and numbers (ints kept
    integral); blank cells -> None."""
    import pandas as pd

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet_part = _first_sheet_part(z)
        if sheet_part is None:
            raise ValueError(f"no worksheet in {path}")
        root = ET.fromstring(z.read(sheet_part))

    rows: dict[int, dict[int, object]] = {}
    max_col = -1
    for row_el in root.iter(f"{_NS}row"):
        # register the row even when every cell is blank (written rows with
        # only NULLs must survive the round trip)
        r_attr = row_el.get("r")
        if r_attr:
            rows.setdefault(int(r_attr), {})
        for c in row_el.findall(f"{_NS}c"):
            m = _REF_RE.match(c.get("r", ""))
            if not m:
                continue
            ci, ri = _col_index(m.group(1)), int(m.group(2))
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = (
                    _unsanitize("".join(x.text or "" for x in is_el.iter(f"{_NS}t")))
                    if is_el is not None else None
                )
            else:
                v_el = c.find(f"{_NS}v")
                if v_el is None or v_el.text is None:
                    val = None
                elif t == "s":
                    val = _unsanitize(shared[int(v_el.text)])
                elif t == "b":
                    val = v_el.text == "1"
                elif t == "str":
                    val = _unsanitize(v_el.text)
                elif re.fullmatch(r"[+-]?\d+", v_el.text):
                    # exact integer text (write_xlsx emits full digit strings):
                    # parse as int directly so |v| >= 2^53 longs survive the
                    # round trip instead of rounding through float
                    val = int(v_el.text)
                else:
                    f = float(v_el.text)
                    val = int(f) if f.is_integer() and abs(f) < 2**53 else f
            rows.setdefault(ri, {})[ci] = val
            max_col = max(max_col, ci)

    if not rows:
        return pd.DataFrame()
    order = sorted(rows)
    header_cells = rows[order[0]]
    cols = [str(header_cells.get(i, f"col{i}")) for i in range(max_col + 1)]
    data = [
        [rows[r].get(i) for i in range(max_col + 1)]
        for r in order[1:]
    ]
    pdf = pd.DataFrame(data, columns=cols, dtype=object)
    # per-column type inference: all-numeric -> numeric dtype, all-bool ->
    # boolean; anything mixed or all-None stays object (Spark maps it to
    # string via the explicit schema the io layer builds)
    for c in pdf.columns:
        nn = pdf[c].dropna()
        if len(nn) and all(isinstance(v, bool) for v in nn):
            pdf[c] = pdf[c].astype("boolean")  # nullable bool dtype (kind 'b')
        elif len(nn) and all(
            isinstance(v, int) and not isinstance(v, bool) for v in nn
        ) and all(-(2**63) <= v < 2**63 for v in nn):
            # nullable Int64 (kind 'i') — to_numeric would go float64 when
            # NULLs are present and round |v| >= 2^53
            pdf[c] = pdf[c].astype("Int64")
        elif len(nn) and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in nn
        ) and all(
            not isinstance(v, int) or abs(v) <= 2**53 for v in nn
        ):
            # mixed int/float -> float64, but only when every int survives the
            # cast exactly; otherwise the column stays object (exact values)
            pdf[c] = pd.to_numeric(pdf[c])
    return pdf
