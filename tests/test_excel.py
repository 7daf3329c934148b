"""Excel source/sink: lossless roundtrip + foreign-writer compat.

Oracle parity of the full pipeline is q49 (run_verify/driver); here we
cover what the oracle can't: odd cell values, shared-strings workbooks
(as Excel/openpyxl write them), and multi-file distributed reads.
"""

from __future__ import annotations

import io
import os
import zipfile

from batch_processing_new_spark.sources.excel import (
    _parse_sheet,
    read_xlsx,
    workbook_bytes,
)

MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def test_roundtrip_odd_values():
    header = ["s", "n", "b", "missing"]
    rows = [
        ("a<b>&amp;\"quote'", 1.5, True, None),
        ("  spaces  kept ", -7, False, None),
        ("", 2.0**53, True, None),
    ]
    h2, body = _parse_sheet(workbook_bytes(header, rows))
    assert h2 == header
    assert body[0][0] == "a<b>&amp;\"quote'"
    assert body[1][0] == "  spaces  kept "
    assert float(body[0][1]) == 1.5
    assert int(body[1][1]) == -7
    assert body[0][2] is True and body[1][2] is False
    assert body[0][3] is None


def test_reads_shared_strings_workbook():
    """Workbooks from Excel/openpyxl use a sharedStrings table, which our
    writer doesn't emit — build one by hand and parse it."""
    sheet = (
        f'<worksheet xmlns="{MAIN_NS}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        f'<sst xmlns="{MAIN_NS}" count="2" uniqueCount="2">'
        "<si><t>alpha</t></si><si><t>beta</t></si></sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)
    header, body = _parse_sheet(buf.getvalue())
    assert header == ["alpha", "beta"]
    assert body == [["beta", "42"]]


def test_distributed_multi_file_read(spark, tmp_path):
    """binaryFile glob over N workbooks -> one DataFrame, all rows."""
    for i in range(3):
        payload = workbook_bytes(
            ["id", "txt"], [(i * 10 + j, f"doc{i}_{j}") for j in range(4)]
        )
        (tmp_path / f"wb{i}.xlsx").write_bytes(payload)
    df = read_xlsx(spark, f"{os.fspath(tmp_path)}/*.xlsx", columns=["id", "txt"])
    rows = sorted((int(r.id), r.txt) for r in df.collect())
    assert len(rows) == 12
    assert rows[0] == (0, "doc0_0") and rows[-1] == (23, "doc2_3")


def test_permissive_csv_tolerates_malformed_rows(spark, tmp_path):
    """Schema-on-read tolerance parity with pandas (reference
    test.py:170): ragged/malformed CSV rows must not fail the scan in
    PERMISSIVE mode."""
    from batch_processing_new_spark.sources.readers import read_csv

    p = tmp_path / "ragged.csv"
    p.write_text("id,text,amount\n1,ok,2.5\n2,missing-amount\n3,extra,7.5,boom\n4,fine,1.0\n")
    df = read_csv(spark, str(p), schema="id int, text string, amount double")
    rows = {r.id: (r.text, r.amount) for r in df.collect()}
    assert len(rows) == 4           # no row aborts the job
    assert rows[1] == ("ok", 2.5)
    assert rows[2][1] is None       # short row -> null-padded
    assert rows[4] == ("fine", 1.0)


def test_permissive_jsonl_tolerates_malformed_lines(spark, tmp_path):
    from batch_processing_new_spark.sources.readers import read_jsonl

    p = tmp_path / "ragged.jsonl"
    p.write_text(
        '{"id": 1, "v": 2.5}\nNOT JSON AT ALL\n{"id": 3, "v": 7.5}\n'
    )
    df = read_jsonl(spark, str(p), schema="id int, v double")
    rows = [(r.id, r.v) for r in df.collect()]
    assert (1, 2.5) in rows and (3, 7.5) in rows
    assert len(rows) == 3  # corrupt line lands as a null row, not a crash
