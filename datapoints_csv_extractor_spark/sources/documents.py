"""Document-corpus sources for the LLM-pipeline operators.

The dedup/similarity/text operators consume a canonical
``(doc_id, text, ...)`` frame; these readers produce it from the
formats corpora actually arrive in:

- JSONL (one JSON object per line) — the de-facto corpus interchange
  format. Parsed as ``text`` + ``from_json`` with an EXPLICIT schema:
  no inference pass over the corpus, and — unlike the native json
  reader's PERMISSIVE mode — no internal corrupt-record column, whose
  restriction ("queries referencing only the corrupt column are not
  allowed") makes innocent patterns like ``reader(...).count()`` throw
  after column pruning. Malformed lines parse to a NULL struct and are
  counted/dropped explicitly — the same skip-don't-fail posture as the
  TEBIS value parser (csv_extractor.py:98-102).
- One-document-per-file text trees (``wholetext``) — crawl/export
  layouts. The doc_id derives from the file path via xxhash64:
  deterministic, collision-safe at corpus scale, and computed JVM-side.

Everything returns a lazy DataFrame; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


# from_json in PERMISSIVE mode yields an all-null struct for malformed
# input, indistinguishable from a valid-but-empty object — so the parse
# schema carries its own corrupt-record field (populated by the parser
# with the raw line). Unlike the native json reader's internal corrupt
# column, a from_json struct field has no "referencing only the corrupt
# column" restriction, so reader(...).count() works after pruning.
_PARSE_SCHEMA = T.StructType(
    list(DOCUMENT_SCHEMA.fields) + [T.StructField("_cr", T.StringType())]
)


def _parsed_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per input line: parsed struct ``d`` whose ``_cr`` field
    holds the raw line when parsing failed."""
    return spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            _PARSE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_cr"},
        ).alias("d")
    )


def read_documents_jsonl(
    spark: SparkSession, path: str, drop_corrupt: bool = True
) -> DataFrame:
    """Read a JSONL corpus into the canonical documents frame.

    Malformed lines surface as ``_corrupt`` (the raw line) when
    ``drop_corrupt=False``; by default they are dropped. Line-delimited
    JSON splits by newline, so a 100 TB corpus parallelizes per file
    split like any text source.
    """
    parsed = _parsed_lines(spark, path)
    ok = F.col("d").isNotNull() & F.col("d._cr").isNull()
    if drop_corrupt:
        return parsed.where(ok).select("d.*").drop("_cr")
    return parsed.select(
        *[F.col(f"d.{f.name}") for f in DOCUMENT_SCHEMA.fields],
        F.when(~ok, F.coalesce(F.col("d._cr"), F.lit(""))).alias("_corrupt"),
    )


def read_documents_text_tree(spark: SparkSession, path: str) -> DataFrame:
    """Read a one-document-per-file text tree (recursive) into the
    canonical frame. ``wholetext`` keeps each file a single row (no
    line splitting); doc_id = xxhash64 of the file path — deterministic
    and JVM-side, so re-ingesting the same tree yields the same ids.
    One caveat at scale: a single file must fit in one task's memory,
    which is the correct constraint for "a document"."""
    return (
        spark.read.option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .text(path)
        .select(
            F.xxhash64(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.input_file_name().alias("source"),
        )
    )


def corrupt_line_stats(spark: SparkSession, path: str) -> DataFrame:
    """Ingest-quality report for a JSONL corpus: clean vs corrupt line
    counts (the gauge a pipeline alarms on before training)."""
    parsed = _parsed_lines(spark, path)
    corrupt = F.col("d").isNull() | F.col("d._cr").isNotNull()
    return parsed.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(corrupt, 1).otherwise(0)).alias("n_corrupt"),
        F.sum(
            F.when(~corrupt & F.col("d.text").isNull(), 1).otherwise(0)
        ).alias("n_missing_text"),
    )


def parse_warc_binary(
    binary_df: DataFrame,
    record_types: tuple[str, ...] = ("response", "conversion"),
    strip_http_headers: bool = True,
) -> DataFrame:
    """Parse a (path, content) binary-file frame of WARC archives into
    the canonical documents frame — the engine shared by the batch
    reader (``read_documents_warc``) and the streaming drive
    (``plans.corpus_ingest.stream_warc_ingest``), which feeds each
    micro-batch's newly-arrived archives through the same parser.
    See ``read_documents_warc`` for format semantics."""
    return _parse_warc_binary_impl(binary_df, record_types, strip_http_headers)


def _parse_warc_binary_impl(
    binary_df: DataFrame,
    record_types: tuple[str, ...],
    strip_http_headers: bool,
) -> DataFrame:
    """Body of the WARC parse (see parse_warc_binary). Original batch
    docstring follows for the format contract:

    Read WARC archives (ISO 28500 — the Common Crawl format) into
    a canonical documents frame: one row per selected WARC record
    with (doc_id, text, url, warc_date, content_type, n_bytes,
    source).

    Parallelism is FILE-level (``binaryFile`` scan -> one archive per
    task, parsed inside Arrow-batched ``mapInPandas``), which is how
    WARC is processed everywhere: records are length-prefixed, so an
    archive cannot be split mid-stream, but crawls ship millions of
    ~1 GB archives and the files ARE the parallel unit. ``.warc.gz``
    is handled as the spec's per-record gzip members (a multistream
    decompressobj loop — NOT one monolithic stream).

    Record selection by ``WARC-Type`` (default: ``response`` — raw
    HTTP captures — and ``conversion`` — pre-extracted text the way
    Common Crawl's WET files carry it). For response records the HTTP
    header block is stripped by default so ``text`` is the body
    payload. Bytes decode utf-8-with-replacement: corpus text with
    invalid sequences survives (skip-don't-fail) rather than killing
    the task. doc_id = xxhash64(record id) computed JVM-side after
    the parse, deterministic across re-ingests.

    One archive must fit in one task's memory — the correct
    constraint for this format; a production cluster sizes executor
    memory for the crawl's archive size, not for the corpus."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("record_id", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("warc_date", T.StringType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("source", T.StringType()),
        ]
    )
    want = {t.lower() for t in record_types}

    def _gunzip_members(raw: bytes) -> bytes:
        import zlib

        out = bytearray()
        pos = 0
        while pos < len(raw):
            d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
            out += d.decompress(raw[pos:])
            out += d.flush()
            tail = d.unused_data
            if not tail:
                break
            pos = len(raw) - len(tail)
        return bytes(out)

    def _records(payload: bytes):
        """Yield (headers dict, body bytes) per WARC record."""
        pos = 0
        n = len(payload)
        while pos < n:
            # Skip inter-record blank lines.
            while pos < n and payload[pos : pos + 2] in (b"\r\n", b"\n"):
                pos += 2 if payload[pos : pos + 2] == b"\r\n" else 1
            if not payload[pos : pos + 5] == b"WARC/":
                return
            hdr_end = payload.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                return
            headers: dict[str, str] = {}
            for line in payload[pos:hdr_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                return
            body_start = hdr_end + 4
            body = payload[body_start : body_start + length]
            yield headers, body
            pos = body_start + length

    def parse(batches):
        for pdf in batches:
            rows = {k.name: [] for k in out_schema.fields}
            for fname, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                try:
                    if raw[:2] == b"\x1f\x8b":
                        raw = _gunzip_members(raw)
                    for headers, body in _records(raw):
                        rtype = headers.get("warc-type", "").lower()
                        if rtype not in want:
                            continue
                        ctype = headers.get("content-type", "")
                        if (
                            strip_http_headers
                            and rtype == "response"
                            and body[:5] in (b"HTTP/",)
                        ):
                            split = body.find(b"\r\n\r\n")
                            if split >= 0:
                                body = body[split + 4 :]
                        rows["record_id"].append(
                            headers.get("warc-record-id", "")
                        )
                        rows["text"].append(
                            body.decode("utf-8", errors="replace")
                        )
                        rows["url"].append(
                            headers.get("warc-target-uri")
                        )
                        rows["warc_date"].append(headers.get("warc-date"))
                        rows["content_type"].append(ctype)
                        rows["n_bytes"].append(len(body))
                        rows["source"].append(fname)
                except Exception:  # noqa: BLE001 — a corrupt archive
                    # poisons only its own records, never the job
                    continue
            yield pd.DataFrame(rows)

    return (
        binary_df.select("path", "content")
        .mapInPandas(parse, out_schema)
        .select(
            F.xxhash64(F.col("record_id")).alias("doc_id"),
            "text",
            "url",
            "warc_date",
            "content_type",
            "n_bytes",
            "source",
            F.col("record_id").alias("warc_record_id"),
        )
    )


def read_documents_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response", "conversion"),
    strip_http_headers: bool = True,
) -> DataFrame:
    """Batch WARC reader: binaryFile scan (file-level parallelism —
    the correct unit, see ``parse_warc_binary``) over ``path``, then
    the shared parse."""
    return parse_warc_binary(
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.warc*")
        .load(path),
        record_types,
        strip_http_headers,
    )
