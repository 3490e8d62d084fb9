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


def read_files_documents(
    spark: SparkSession,
    base_path: str,
    path_glob: str | None = None,
    include_pattern: str | None = None,
    exclude_pattern: str | None = None,
    modified_after: datetime | str | None = None,
    blacklist: list[str] | None = None,
) -> DataFrame:
    """Scan a directory tree into canonical documents.

    - ``path_glob`` / ``modified_after``: pushed into the file listing
      (native binaryFile options — zero wasted IO).
    - ``include_pattern`` / ``exclude_pattern``: Java regex fullmatch on
      the relative path (reference semantics,
      files_document_reader.py:200-204).
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

    return df.select(
        F.col("rel_path").alias("id"),
        F.concat(F.lit("file://"), F.lit(base_path.rstrip("/") + "/"), F.col("rel_path")).alias("url"),
        metadata.alias("metadata"),
        # lenient decode: `decode(content,'UTF-8')` RAISES on the first
        # malformed byte (fatal for a large ingest); casting replaces bad
        # sequences with U+FFFD — the degrade-don't-die behavior of the
        # reference's resilient scan (main/utils/batch.py:18-41)
        F.expr("try_cast(content AS STRING)").alias("text"),
        F.col("modificationTime").alias("last_modified_at"),
        F.lit("localFiles").alias("source_type"),
    )
