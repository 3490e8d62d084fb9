"""Jira source: REST scan → canonical documents.

Spark-first re-expression of the reference's Jira readers/converters:

- Server/DC: offset pagination over ``/rest/api/latest/search`` with
  JQL + fixed field projection (main/sources/jira/jira_document_reader.py:
  37-90, page size 500)
- Cloud: ``nextPageToken`` keyset pagination over
  ``/rest/api/3/search/jql`` (main/sources/jira/jira_cloud_document_reader.py:
  66-104)
- Conversion (main/sources/jira/jira_document_converter.py:14-102):
  project = key.split('-')[0]; null-safe nested extraction; lowercased
  emails; epic = coalesce(epic key, parent key); text = summary +
  description + comments joined with blank lines; Cloud ADF flattening
  (jira_cloud_document_converter.py:67-76).

Transport is an injectable callable ``(path, params) -> dict`` so the
reader is testable offline; the default uses ``requests`` with the
reference's timeout/retry defaults. Pagination is inherently sequential
(token chains), so pages are fetched driver-side and handed to Spark as
a DataFrame — the converter stage on is fully distributed (SURVEY §7.4
"Non-parallelizable source pagination").
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from documents_vector_search_spark.collection.catalog import DOCUMENT_SCHEMA
from documents_vector_search_spark.sources.batching import execute_with_retry

Transport = Callable[[str, dict], dict]

JIRA_FIELDS = (
    # the reference's exact projection (jira_document_reader.py:35):
    # `epic` is the literal Agile field name (an object with a key),
    # NOT a customfield id; `parent` is its fallback
    "key,summary,description,comment,created,reporter,updated,"
    "issuetype,priority,assignee,status,epic,parent"
)
PAGE_SIZE = 500
HTTP_TIMEOUT = 60


def requests_transport(base_url: str, token: str | None = None) -> Transport:
    import requests

    headers = {"Authorization": f"Bearer {token}"} if token else {}

    def call(path: str, params: dict) -> dict:
        resp = requests.get(
            f"{base_url.rstrip('/')}{path}",
            params=params,
            headers=headers,
            timeout=HTTP_TIMEOUT,
        )
        resp.raise_for_status()
        return resp.json()

    return call


def fetch_issues_server(
    transport: Transport, jql: str, page_size: int = PAGE_SIZE
) -> Iterator[dict]:
    """Offset pagination (startAt/maxResults) with per-page retry."""
    start_at = 0
    while True:
        page = execute_with_retry(
            lambda: transport(
                "/rest/api/latest/search",
                {
                    "jql": jql,
                    "startAt": start_at,
                    "maxResults": page_size,
                    "fields": JIRA_FIELDS,
                },
            ),
            what=f"jira search startAt={start_at}",
        )
        issues = page.get("issues", [])
        yield from issues
        start_at += len(issues)
        if start_at >= page.get("total", 0) or not issues:
            return


def fetch_issues_cloud(
    transport: Transport, jql: str, page_size: int = PAGE_SIZE
) -> Iterator[dict]:
    """Keyset pagination (nextPageToken) — Cloud API."""
    token: str | None = None
    while True:
        params: dict[str, Any] = {
            "jql": jql,
            "maxResults": page_size,
            "fields": JIRA_FIELDS,
        }
        if token:
            params["nextPageToken"] = token
        page = execute_with_retry(
            lambda: transport("/rest/api/3/search/jql", params),
            what="jira cloud search",
        )
        yield from page.get("issues", [])
        token = page.get("nextPageToken")
        if not token:
            return


def flatten_adf(node: Any) -> str:
    """Flatten Atlassian Document Format to text
    (jira_cloud_document_converter.py:67-76: nested content[].text
    joined with newlines, empty text nodes dropped). The reference
    reads exactly two levels (doc → block → text nodes); this recurses
    arbitrarily deep, a deliberate superset that is identical on the
    two-level shape real ADF documents use — pinned by the reference
    differential harness (tests/test_converter_differential.py)."""
    if node is None:
        return ""
    if isinstance(node, str):
        return node
    parts: list[str] = []
    if isinstance(node, dict):
        # empty text nodes are dropped, matching the reference's
        # falsy-filtering join (jira_cloud_document_converter.py:76-82)
        if node.get("text"):
            parts.append(str(node["text"]))
        for child in node.get("content", []) or []:
            flat = flatten_adf(child)
            if flat:
                parts.append(flat)
    elif isinstance(node, list):
        for child in node:
            flat = flatten_adf(child)
            if flat:
                parts.append(flat)
    return "\n".join(parts)


def _get(d: dict | None, *path, default=None):
    cur: Any = d
    for p in path:
        if not isinstance(cur, dict) or cur.get(p) is None:
            return default
        cur = cur[p]
    return cur


def issue_to_canonical(issue: dict, base_url: str, cloud: bool = False) -> dict:
    """One REST issue → canonical envelope (jira_document_converter.py:
    14-102 semantics)."""
    key = issue.get("key", "")
    fields = issue.get("fields", {}) or {}
    description = fields.get("description")
    if cloud:
        # cloud descriptions/comments are ADF documents; the reference
        # flattens + strips each (jira_cloud_document_converter.py:54-76)
        description = (
            flatten_adf(description).strip()
            if isinstance(description, dict)
            else (description or "")
        )
    comments = []
    for c in _get(fields, "comment", "comments", default=[]) or []:
        body = c.get("body")
        if cloud and isinstance(body, dict):
            body = flatten_adf(body).strip()
        if body:
            comments.append(str(body))

    summary = fields.get("summary")
    # the first text element is the main-info line "KEY : summary"
    # (jira_document_converter.py:59-60) — it is part of the stored
    # document text AND becomes chunk 0 downstream; the reference would
    # render a None summary as the string 'None', we render '' (the one
    # deliberate robustness delta — Jira always returns a string)
    main_info = f"{key} : {summary if summary is not None else ''}"
    # description+comments joined by blank lines, stripped as one unit
    # (jira_document_converter.py:53-57); the cloud converter also
    # strips the outer join (jira_cloud_document_converter.py:81-82) —
    # a no-op here because main_info never starts with whitespace
    d_and_c = "\n\n".join(str(p) for p in [description, *comments] if p).strip()
    text = "\n\n".join(p for p in [main_info, d_and_c] if p)
    # epic: a truthy epic object wins even when it has no key — the
    # reference does NOT fall through to parent in that case
    # (jira_document_converter.py:65-72)
    epic_obj = fields.get("epic")
    if epic_obj:
        epic = epic_obj.get("key")
    else:
        parent_obj = fields.get("parent")
        epic = parent_obj.get("key") if parent_obj else None
    metadata = {
        "createdAt": fields.get("created"),
        # reporter, not creator: jira_document_converter.py:89-92 maps
        # createdBy from fields.reporter.emailAddress (they differ when an
        # issue is filed on someone's behalf)
        "createdBy": (_get(fields, "reporter", "emailAddress") or "").lower() or None,
        "lastModifiedAt": fields.get("updated"),
        "project": key.split("-")[0] if key else None,
        "type": _get(fields, "issuetype", "name"),
        "epic": epic,
        "priority": _get(fields, "priority", "name"),
        "assignee": (_get(fields, "assignee", "emailAddress") or "").lower() or None,
        "status": _get(fields, "status", "name"),
    }
    return {
        "id": key,
        "url": f"{base_url.rstrip('/')}/browse/{key}",
        "metadata": {k: str(v) for k, v in metadata.items() if v is not None},
        "text": text,
        "last_modified_at": None,  # parsed from metadata by read_jira_documents
        "source_type": "jira",
    }


def read_jira_documents(
    spark: SparkSession,
    base_url: str,
    jql: str,
    transport: Transport | None = None,
    token: str | None = None,
    cloud: bool | None = None,
) -> DataFrame:
    """Scan Jira into canonical documents. ``cloud`` auto-detects on
    '.atlassian.net' like the reference CLI adapter
    (jira_collection_create_cmd_adapter.py:29)."""
    if cloud is None:
        cloud = ".atlassian.net" in base_url
    transport = transport or requests_transport(base_url, token)
    fetch = fetch_issues_cloud if cloud else fetch_issues_server
    rows = [
        issue_to_canonical(issue, base_url, cloud=cloud)
        for issue in fetch(transport, jql)
    ]
    df = spark.createDataFrame(rows, schema=DOCUMENT_SCHEMA)
    # typed watermark column from the ISO string in metadata (SURVEY §1.2)
    return df.withColumn(
        "last_modified_at",
        F.to_timestamp(F.element_at("metadata", "lastModifiedAt")),
    )
