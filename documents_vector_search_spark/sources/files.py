"""Local-files source: binaryFile scan → canonical documents.

Spark-first re-expression of the reference's recursive walk
(main/sources/files/files_document_reader.py:110-158: include/exclude
regex, ~100-entry binary-extension blacklist at lines 10-108, mtime
predicate) + converter (main/sources/files/files_document_converter.py:
16-58: id = relative path, url = file://, folderN metadata from path
components).

Pushdown: ``pathGlobFilter`` and ``modifiedAfter`` are native
binaryFile scan options — the mtime predicate the reference implements
by hand (files_document_reader.py:206) is pruned at file-listing time.
Include/exclude REGEX (fullmatch, like the reference) and the extension
blacklist are Column filters on the path — evaluated before content
ever reaches Python.

Rich-format parsing (PDF/DOCX via `unstructured`, reference
files_document_reader.py:218-258) is a decoder seam: plain text decodes
JVM-side; an optional ``parser`` pandas-UDF handles opaque formats on
executors (the library is not in this container — inject your own).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# condensed from the reference's blacklist (files_document_reader.py:10-108):
# media/binary extensions that are never text-indexed
BINARY_EXTENSION_BLACKLIST = [
    "png", "jpg", "jpeg", "gif", "bmp", "ico", "svg", "webp", "tiff",
    "mp3", "wav", "ogg", "flac", "mp4", "avi", "mov", "mkv", "webm",
    "zip", "tar", "gz", "bz2", "xz", "7z", "rar", "jar", "war",
    "exe", "dll", "so", "dylib", "bin", "class", "pyc", "o", "a",
    "woff", "woff2", "ttf", "otf", "eot", "db", "sqlite", "parquet",
]

# formats routed through the rich-format parser seam when one is given
# (reference parses these via `unstructured`,
# files_document_reader.py:218-258)
RICH_FORMAT_EXTENSIONS = {
    "pdf", "docx", "doc", "pptx", "ppt", "xlsx", "xls", "epub", "rtf",
    "odt", "odp", "ods",
}

# a parser takes (content_bytes, relative_path) and returns content
# PARTS: [{"text": str, "metadata": {"pageNumber": int}?}, ...] — the
# reference reader's shape (files_document_reader.py:218-246)
RichParser = Callable[[bytes, str], list[dict]]


def group_elements_by_page(elements: Iterable) -> list[dict]:
    """Group unstructured-style elements into content parts — the mirror
    of reference files_document_reader.py:233-258: no page numbers →
    one part of all texts joined by blank lines; else one part per page
    with ``{"pageNumber": n}`` metadata, preserving element order."""
    elements = list(elements)
    if not elements:
        return []
    first_page = getattr(elements[0].metadata, "page_number", None)
    if first_page is None:
        return [
            {
                "text": "\n\n".join(
                    e.text for e in elements if hasattr(e, "text")
                ).strip()
            }
        ]
    grouped: dict[int, list[str]] = {}
    for e in elements:
        page = e.metadata.page_number
        grouped.setdefault(page, [])
        if hasattr(e, "text"):
            grouped[page].append(e.text)
    return [
        {"metadata": {"pageNumber": page}, "text": "\n\n".join(texts).strip()}
        for page, texts in grouped.items()
    ]


def make_unstructured_parser(partition: Callable | None = None) -> RichParser:
    """Build the rich-format parser from an ``unstructured``-style
    ``partition(file=...)`` callable (injectable — the library is not in
    this container; reference files_document_reader.py:227-231 uses
    ``unstructured.partition.auto.partition``)."""
    if partition is None:
        try:
            from unstructured.partition.auto import partition as _partition
        except ImportError as exc:  # pragma: no cover - not in container
            raise NotImplementedError(
                "unstructured is not installed; inject a partition callable"
            ) from exc
        partition = _partition

    def parser(content: bytes, rel_path: str) -> list[dict]:
        import io

        return group_elements_by_page(partition(file=io.BytesIO(content)))

    return parser


def read_files_documents(
    spark: SparkSession,
    base_path: str,
    path_glob: str | None = None,
    include_pattern: str | None = None,
    exclude_pattern: str | None = None,
    modified_after: datetime | str | None = None,
    blacklist: list[str] | None = None,
    parser: RichParser | None = None,
    parser_extensions: set[str] | None = None,
) -> DataFrame:
    """Scan a directory tree into canonical documents.

    - ``path_glob`` / ``modified_after``: pushed into the file listing
      (native binaryFile options — zero wasted IO).
    - ``include_pattern`` / ``exclude_pattern``: Java regex fullmatch on
      the relative path (reference semantics,
      files_document_reader.py:200-204).
    - ``parser``: rich-format seam — rows whose extension is in
      ``parser_extensions`` (default RICH_FORMAT_EXTENSIONS) decode on
      executors via mapInPandas with this callable; their document text
      is the parser's part texts concatenated (reference
      files_document_converter.py:29-34). Everything else decodes
      JVM-side. Without a parser, rich formats take the lenient
      plain-text path.
    """
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if modified_after:
        if isinstance(modified_after, datetime):
            modified_after = modified_after.strftime("%Y-%m-%dT%H:%M:%S")
        reader = reader.option("modifiedAfter", modified_after)
    raw = reader.load(base_path)

    # binaryFile yields absolute file: URIs; derive the relative path.
    # The scheme strip is a CONSTANT regex; the base-path strip is a
    # length-based substring so regex metacharacters in the directory
    # name ('+', '(', '[', ...) can't corrupt document ids.
    base_prefix = base_path.rstrip("/") + "/"
    no_scheme = F.regexp_replace(F.col("path"), r"^file:(//)?", "")
    rel = F.when(
        no_scheme.startswith(base_prefix),
        F.substring(no_scheme, len(base_prefix) + 1, 2**31 - 1),
    ).otherwise(no_scheme)
    df = raw.select(
        rel.alias("rel_path"),
        F.col("path"),
        F.col("modificationTime"),
        F.col("content"),
    )

    ext = F.lower(F.element_at(F.split(F.col("rel_path"), r"\."), -1))
    df = df.filter(~ext.isin(blacklist or BINARY_EXTENSION_BLACKLIST))
    if include_pattern:
        df = df.filter(F.col("rel_path").rlike(f"^(?:{include_pattern})$"))
    if exclude_pattern:
        df = df.filter(~F.col("rel_path").rlike(f"^(?:{exclude_pattern})$"))

    # folderN metadata from path components (files_document_converter.py:52-55)
    folders = F.slice(
        F.split(F.col("rel_path"), "/"),
        1,
        F.greatest(F.size(F.split(F.col("rel_path"), "/")) - 1, F.lit(0)),
    )
    folder_keys = F.transform(
        folders, lambda _, i: F.concat(F.lit("folder"), (i + 1).cast("string"))
    )
    metadata = F.map_concat(
        F.map_from_arrays(folder_keys, folders),
        F.create_map(
            F.lit("lastModifiedAt"),
            F.date_format("modificationTime", "yyyy-MM-dd'T'HH:mm:ss"),
        ),
    )

    # lenient decode: `decode(content,'UTF-8')` RAISES on the first
    # malformed byte (fatal for a large ingest); casting replaces bad
    # sequences with U+FFFD — the degrade-don't-die behavior of the
    # reference's resilient scan (main/utils/batch.py:18-41)
    if parser is not None:
        exts = sorted(parser_extensions or RICH_FORMAT_EXTENSIONS)
        plain = (
            df.filter(~ext.isin(exts))
            .withColumn("text", F.expr("try_cast(content AS STRING)"))
            .drop("content")
        )
        rich = _decode_rich(df.filter(ext.isin(exts)), parser)
        df = plain.unionByName(rich)
    else:
        df = df.withColumn(
            "text", F.expr("try_cast(content AS STRING)")
        ).drop("content")

    # document text = relative path + blank line + stripped content
    # (files_document_converter.py:29-34: convert_to_text([rel_path,
    # content]) with falsy filtering and .strip() at both levels) — the
    # path line doubles as the title/chunk-0 element, same shape as the
    # jira/confluence converters. Java \s is ASCII-only where Python
    # .strip() is unicode — a documented corner, irrelevant for the
    # ASCII whitespace real files end with.
    stripped = F.regexp_replace(
        F.regexp_replace(F.col("text"), r"^\s+", ""), r"\s+$", ""
    )
    doc_text = F.when(
        stripped.isNull() | (stripped == ""), F.col("rel_path")
    ).otherwise(F.concat(F.col("rel_path"), F.lit("\n\n"), stripped))
    return df.select(
        F.col("rel_path").alias("id"),
        F.concat(F.lit("file://"), F.lit(base_path.rstrip("/") + "/"), F.col("rel_path")).alias("url"),
        metadata.alias("metadata"),
        doc_text.alias("text"),
        F.col("modificationTime").alias("last_modified_at"),
        F.lit("localFiles").alias("source_type"),
    )


def _decode_rich(df: DataFrame, parser: RichParser) -> DataFrame:
    """Executor-side rich-format decode: Arrow-batched mapInPandas,
    one parser call per file; part texts joined per the reference's
    document-text assembly (files_document_converter.py:29-34). A file
    the parser raises on degrades to empty text (resilient-scan
    behavior) rather than failing the ingest."""
    schema = (
        "rel_path string, path string, modificationTime timestamp, text string"
    )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            texts = []
            for content, rel in zip(pdf["content"], pdf["rel_path"]):
                try:
                    parts = parser(bytes(content), rel)
                    texts.append(
                        "".join(p.get("text", "") for p in parts).strip()
                    )
                except Exception:
                    texts.append("")
            yield pd.DataFrame(
                {
                    "rel_path": pdf["rel_path"],
                    "path": pdf["path"],
                    "modificationTime": pdf["modificationTime"],
                    "text": texts,
                }
            )

    return df.mapInPandas(decode, schema=schema)
