"""Excel (.xlsx) source and sink with no third-party dependency.

The reference declares Excel I/O via its dependency manifest
(reference requirements.txt:47 ``openpyxl``, :23 ``et-xmlfile`` — see
SURVEY.md §1.3); openpyxl is not available in this image, and an xlsx
workbook is just a zip of ECMA-376 SpreadsheetML XML parts, so the
format is implemented directly on ``zipfile`` + ``xml.etree``.

Read path is distributed and scale-shaped: ``spark.read.format
("binaryFile")`` lands one row per workbook (many-workbook corpora are
the realistic 100 TB shape — thousands of files, not one giant sheet),
and parsing runs executor-side in ``mapInPandas`` over Arrow batches.
The write path is a driver-side small-result edge format, same category
as the single-file CSV sink (sinks/writers.py): Excel is a delivery
format, not a storage format — at scale you write parquet and export
the final small result to xlsx.

Supported cell types on read: inline strings, shared strings, formula
string results, numbers, booleans — enough for workbooks produced by
openpyxl/Excel/pandas. Write emits inline strings and raw numbers (no
sharedStrings table needed for correctness; consumers accept both).
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _scratch_dir(name: str) -> str:
    """Per-purpose scratch dir, stable within a process, removed at
    process exit.

    mkdtemp() per invocation leaked a full materialized table copy per
    bench/verify run (2 warm-ups + best-of-3 = 5 copies each, never
    cleaned); a per-(purpose, pid) path + mode("overwrite") writers
    keeps exactly one copy per purpose, the pid component keeps
    concurrent verify/bench processes from overwriting each other's
    files mid-read, and the atexit hook removes the whole tree.
    """
    import atexit
    import os
    import shutil
    import tempfile

    d = os.path.join(tempfile.gettempdir(), f"bpns_{name}_{os.getpid()}")
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


# ------------------------------------------------------------- write

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<workbook xmlns="{_MAIN_NS}" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None or (isinstance(value, float) and value != value):
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def workbook_bytes(header: list[str], rows: list[tuple]) -> bytes:
    """Serialize header + rows into a single-sheet xlsx workbook."""
    parts = ["<sheetData>"]
    for rnum, row in enumerate([tuple(header), *rows], start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{rnum}", v) for c, v in enumerate(row)
        )
        parts.append(f'<row r="{rnum}">{cells}</row>')
    parts.append("</sheetData>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}">' + "".join(parts) + "</worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def write_xlsx(df: DataFrame, path: str, max_rows: int = 1_048_575) -> str:
    """Driver-side xlsx sink for small final results (sheet row limit is
    2^20; refuse anything bigger rather than silently truncate)."""
    rows = [tuple(r) for r in df.collect()]
    if len(rows) > max_rows:
        raise ValueError(
            f"xlsx sink is for small results: {len(rows)} rows > {max_rows}; "
            "write parquet/csv instead"
        )
    payload = workbook_bytes(list(df.columns), rows)
    with open(path, "wb") as f:
        f.write(payload)
    return path


# -------------------------------------------------------------- read

def _parse_sheet(
    data: bytes,
) -> tuple[list[str], list[list]]:
    """Parse the first worksheet of an xlsx blob -> (header, rows)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root:
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_MAIN_NS}}}t")))
        sheet_name = next(
            n for n in sorted(names) if n.startswith("xl/worksheets/sheet")
        )
        root = ElementTree.fromstring(z.read(sheet_name))

    rows: list[list] = []
    for row_el in root.iter(f"{{{_MAIN_NS}}}row"):
        cells: dict[int, object] = {}
        for c in row_el.iter(f"{{{_MAIN_NS}}}c"):
            ref = c.get("r", "")
            m = _CELL_REF.match(ref)
            if not m:
                continue
            col = 0
            for ch in m.group(1):
                col = col * 26 + (ord(ch) - ord("A") + 1)
            col -= 1
            ctype = c.get("t", "n")
            value: object = None
            if ctype == "inlineStr":
                value = "".join(
                    t.text or "" for t in c.iter(f"{{{_MAIN_NS}}}t")
                )
            else:
                v = c.find(f"{{{_MAIN_NS}}}v")
                if v is not None and v.text is not None:
                    if ctype == "s":
                        value = shared[int(v.text)]
                    elif ctype == "str":
                        value = v.text
                    elif ctype == "b":
                        value = v.text == "1"
                    else:
                        value = v.text  # numeric: keep lexical form
            cells[col] = value
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])

    if not rows:
        return [], []
    header = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
    width = len(header)
    body = [r[:width] + [None] * (width - len(r)) for r in rows[1:]]
    return header, body


def read_xlsx(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Distributed xlsx read: one binaryFile row per workbook, parsed
    executor-side. ``columns`` declares the expected header (order
    defines the output schema; all columns land as strings — cast
    downstream, exactly like schema-on-read CSV).

    Scale: workbooks are independent files, so parallelism = number of
    files; a single huge workbook cannot be split (zip + XML are not
    splittable formats) — the same limitation every Excel reader has.
    """
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(spark)
    binary = spark.read.format("binaryFile").load(path).select("content")
    out_schema = ", ".join(f"`{c}` string" for c in columns)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for blob in pdf["content"]:
                header, body = _parse_sheet(bytes(blob))
                missing = [c for c in columns if c not in header]
                if missing:
                    raise ValueError(f"workbook missing columns {missing}")
                idx = [header.index(c) for c in columns]
                frames.append(
                    pd.DataFrame(
                        {
                            c: [
                                None if r[i] is None else str(r[i])
                                for r in body
                            ]
                            for c, i in zip(columns, idx)
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return binary.mapInPandas(parse, schema=out_schema)


# ------------------------------------------------------------ query

from batch_processing_new_spark.registry import query  # noqa: E402
from batch_processing_new_spark.sources.readers import load_table  # noqa: E402


@query(
    "q49_excel_roundtrip",
    oracle="""
SELECT c_mktsegment,
       count(*)                                                  AS n_customers,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)     AS total_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q49_excel_roundtrip(spark, sf_dir: str):
    """customer -> xlsx sink -> distributed xlsx scan -> cast -> agg.

    The oracle aggregates the parquet directly, so a hash-match proves
    the workbook writer and the executor-side reader are lossless
    (float cells round-trip via repr -> cast). Exercises the declared
    Excel surface end to end (reference requirements.txt:47).
    """
    import os

    from pyspark.sql import functions as F

    c = load_table(spark, sf_dir, "customer")
    path = os.path.join(
        _scratch_dir("xlsx_roundtrip"), "customer.xlsx"
    )
    write_xlsx(c, path)
    back = read_xlsx(spark, path, columns=list(c.columns))
    return (
        back.select(
            "c_mktsegment", F.col("c_acctbal").cast("double").alias("c_acctbal")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q70_jsonl_roundtrip",
    oracle="""
SELECT event_type,
       count(*)                                              AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)     AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q70_jsonl_roundtrip(spark, sf_dir: str):
    """events -> distributed JSONL sink -> schema'd JSONL scan -> agg.

    Same lossless-roundtrip proof as the Excel query (q49) for the JSON
    lines format; numeric fidelity survives the text encoding because
    Spark serializes doubles round-trippably.
    """
    import os
    import tempfile

    from pyspark.sql import functions as F

    from batch_processing_new_spark.sources.readers import read_jsonl

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    path = os.path.join(_scratch_dir("jsonl_roundtrip"), "events")
    e.write.mode("overwrite").json(path)
    back = read_jsonl(
        spark, path, schema="event_id bigint, event_type string, value double"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q153_schema_evolution",
    oracle="""
WITH unioned AS (
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
    FROM orders
)
SELECT coalesce(o_orderpriority, 'MISSING')                  AS priority,
       count(*)                                              AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_price
FROM unioned
GROUP BY priority
ORDER BY priority
""",
)
def q153_schema_evolution(spark, sf_dir: str):
    """Schema evolution on read: a v1 parquet batch written WITHOUT
    ``o_orderpriority`` (even orderkeys) and a v2 batch WITH it (odd
    orderkeys) land in one directory; ``mergeSchema`` unifies them on
    scan, null-filling the missing column, and the aggregate buckets
    the nulls as 'MISSING'. This is the landing-zone reality at 100 TB
    — producers add columns mid-stream and historical files are never
    rewritten. Scale note: mergeSchema footer-merges ALL file schemas
    at planning time, so production tables pin the merged schema in a
    catalog/metastore instead of re-deriving it per query; the
    null-fill-on-read semantics verified here are identical.
    """
    import os
    import tempfile

    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    base = os.path.join(_scratch_dir("schema_evo"), "orders")
    o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(base, "v1"))
    # overwrite, NOT append: the scratch dir is stable within a
    # process, so append would accumulate duplicate v2 files across
    # re-runs (caught by the determinism checker's two-run protocol)
    o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(base, "v2"))
    back = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(base)
    )
    return (
        back.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("MISSING")).alias(
                "priority"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("priority")
    )


@query(
    "q154_corrupt_records",
    oracle="""
WITH sim AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 7 THEN NULL ELSE o_totalprice END AS price,
           (o_orderkey % 10 = 7) AS is_corrupt
    FROM orders
)
SELECT CASE WHEN is_corrupt THEN 'corrupt' ELSE 'good' END AS status,
       count(*)                                            AS n_rows,
       CAST(CAST(sum(CAST(price AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)   AS total_price,
       min(o_orderkey)                                     AS min_orderkey
FROM sim
GROUP BY status
ORDER BY status
""",
)
def q154_corrupt_records(spark, sf_dir: str):
    """PERMISSIVE schema-on-read over a dirty CSV: every 10th order row
    lands with a non-numeric price ('N/A'); the typed read must parse
    the clean rows, null the broken field, and capture each broken
    row's RAW LINE in ``_corrupt_record`` — from which the pipeline
    still recovers the orderkey. This is the reference's CSV contract
    (SURVEY §2A op 2: arbitrary user uploads, inferSchema, PERMISSIVE
    mode) under actually-malformed input: the job degrades per-row and
    reports, never aborts — the same no-fail discipline as the enrich
    sentinel (§2A.1 rule 3). The corrupt lines are written and parsed
    distributed; nothing funnels through the driver.
    """
    import os
    import tempfile

    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # coalesce('') keeps a NULL price as an EMPTY CSV FIELD ("42,"):
    # concat_ws silently SKIPS null args, which would emit a one-column
    # line ("42") that parses as malformed instead of as a null price
    # (heavy-null poison-sweep finding)
    line = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.when(F.col("o_orderkey") % 10 == 7, F.lit("N/A")).otherwise(
            F.coalesce(F.col("o_totalprice").cast("string"), F.lit(""))
        ),
    )
    path = os.path.join(_scratch_dir("dirty_csv"), "orders")
    o.select(line.alias("value")).write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "o_orderkey long, o_totalprice double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    status = F.when(
        F.col("_corrupt_record").isNotNull(), F.lit("corrupt")
    ).otherwise(F.lit("good"))
    # the corrupt row's key comes back out of the RAW captured line —
    # the recovery path a production quarantine sink needs
    okey = F.coalesce(
        F.col("o_orderkey"),
        F.split(F.col("_corrupt_record"), ",")[0].cast("long"),
    )
    return (
        back.select(status.alias("status"), okey.alias("okey"), "o_totalprice")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_price"),
            F.min("okey").alias("min_orderkey"),
        )
        .orderBy("status")
    )


@query(
    "q155_gzip_csv_roundtrip",
    oracle="""
SELECT o_orderpriority,
       count(*)                                                 AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q155_gzip_csv_roundtrip(spark, sf_dir: str):
    """Compressed-source handling: orders -> gzip CSV -> typed scan ->
    agg, values identical to the direct parquet path. Spark resolves
    the codec from the ``.gz`` extension on read; nothing else changes.

    Scale note (the reason this is a query and not a footnote): gzip
    is NOT splittable — each .gz file is one task no matter its size,
    so a landing zone of few huge gzip files serializes the scan. The
    distributed writer here emits one .gz per input partition (many
    small files — the workable layout); at 100 TB prefer zstd/bzip2 or
    decompress-on-land so maxPartitionBytes can split the scan.
    """
    import os
    import tempfile

    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = os.path.join(_scratch_dir("gz_csv"), "orders")
    o.write.mode("overwrite").option("header", "true").option(
        "compression", "gzip"
    ).csv(path)
    back = (
        spark.read.schema(
            "o_orderkey long, o_orderpriority string, o_totalprice double"
        )
        .option("header", "true")
        .csv(path)
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q156_quoted_multiline_csv",
    oracle="""
WITH noisy AS (
    SELECT doc_id,
           'a,"b' || chr(10) || substr(text, 1, 40) AS payload
    FROM documents
)
SELECT count(*)                                   AS n_docs,
       CAST(sum(length(payload)) AS BIGINT)       AS total_chars,
       CAST(sum(CASE WHEN contains(payload, chr(10))
                THEN 1 ELSE 0 END) AS BIGINT)     AS n_multiline
FROM noisy
""",
)
def q156_quoted_multiline_csv(spark, sf_dir: str):
    """Quoting-edge-case CSV roundtrip: payloads containing commas,
    double quotes, AND embedded newlines written by the CSV sink
    (which must quote+escape them) and read back with
    ``multiLine=true`` — the reader must reassemble records across
    physical lines. Arbitrary user CSVs (reference §2A op 2) contain
    exactly this; a naive line-splitting reader shreds them. The
    aggregate proves byte-exact payload survival (count, total chars,
    rows still containing a newline).

    Scale note: multiLine CSV, like gzip, makes files non-splittable
    (records cross line boundaries, so Spark can't chunk by newline
    offsets) — one task per file; fine for many modest landing files,
    a serialization hazard for single huge ones.
    """
    import os
    import tempfile

    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit('a,"b\n'), F.substring(F.col("text"), 1, 40)
    )
    src = d.select(F.col("doc_id"), payload.alias("payload"))
    path = os.path.join(_scratch_dir("quoted_csv"), "docs")
    # the CSV WRITER trims field whitespace by default
    # (ignoreLeading/TrailingWhiteSpace default TRUE for writes, false
    # for reads) — byte-exact roundtrip requires turning that off
    src.write.mode("overwrite").option("header", "true").option(
        "ignoreLeadingWhiteSpace", "false"
    ).option("ignoreTrailingWhiteSpace", "false").csv(path)
    back = (
        spark.read.schema("doc_id long, payload string")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("payload")).alias("total_chars"),
        F.sum(
            F.when(F.col("payload").contains("\n"), 1).otherwise(0)
        ).alias("n_multiline"),
    )
