"""Confluence source: REST scan → canonical documents.

Spark-first re-expression of the reference's Confluence readers and
converters:

- Server/DC: offset pagination over ``/rest/api/content/search`` with
  CQL auto-wrapped as ``type=page AND (...)`` and an expand list
  including body/ancestors/version/space/comments
  (main/sources/confluence/confluence_document_reader.py:42-124,
  page size 50)
- Cloud: cursor pagination parsed from ``_links.next``
  (main/sources/confluence/confluence_cloud_document_reader.py:45-129,
  147-161)
- Conversion (main/sources/confluence/confluence_document_converter.py:
  17-83): title path "ancestor1 -> ancestor2 -> title"; HTML body →
  text; metadata {createdAt, createdBy, lastModifiedAt, space}.

HTML→text uses bs4 when available (the reference's choice,
confluence_document_converter.py:62-68) and falls back to a tag-strip
regex otherwise (this container has no bs4).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from typing import Any
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from documents_vector_search_spark.collection.catalog import DOCUMENT_SCHEMA
from documents_vector_search_spark.sources.batching import execute_with_retry

Transport = Callable[[str, dict], dict]

PAGE_SIZE = 50
EXPAND = (
    "body.storage,ancestors,version,space,history,"
    "children.comment.body.storage"
)


def html_to_text(html: str | None) -> str:
    """HTML → text: bs4 when present, regex tag-strip fallback."""
    if not html:
        return ""
    try:
        from bs4 import BeautifulSoup

        return BeautifulSoup(html, "html.parser").get_text(
            separator="\n", strip=True
        )
    except ImportError:
        no_script = re.sub(
            r"<(script|style)[^>]*>.*?</\1>", " ", html, flags=re.S | re.I
        )
        block_breaks = re.sub(r"</?(p|div|br|li|tr|h[1-6])[^>]*>", "\n", no_script, flags=re.I)
        text = re.sub(r"<[^>]+>", "", block_breaks)
        text = text.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        text = text.replace("&quot;", '"').replace("&#39;", "'").replace("&nbsp;", " ")
        lines = [ln.strip() for ln in text.splitlines()]
        return "\n".join(ln for ln in lines if ln)


def wrap_cql(cql: str) -> str:
    """Auto-wrap user CQL as 'type=page AND (...)' (reference
    confluence_document_reader.py:70-75)."""
    return f"type=page AND ({cql})" if cql else "type=page"


def fetch_pages_server(
    transport: Transport, cql: str, page_size: int = PAGE_SIZE
) -> Iterator[dict]:
    start = 0
    while True:
        page = execute_with_retry(
            lambda: transport(
                "/rest/api/content/search",
                {
                    "cql": wrap_cql(cql),
                    "start": start,
                    "limit": page_size,
                    "expand": EXPAND,
                },
            ),
            what=f"confluence search start={start}",
        )
        results = page.get("results", [])
        yield from results
        start += len(results)
        if not results or start >= page.get("totalSize", page.get("size", 0)):
            return


def fetch_pages_cloud(
    transport: Transport, cql: str, page_size: int = PAGE_SIZE
) -> Iterator[dict]:
    """Cursor pagination: follow the cursor from _links.next
    (confluence_cloud_document_reader.py:147-161)."""
    cursor: str | None = None
    while True:
        params: dict[str, Any] = {
            "cql": wrap_cql(cql),
            "limit": page_size,
            "expand": EXPAND,
        }
        if cursor:
            params["cursor"] = cursor
        page = execute_with_retry(
            lambda: transport("/wiki/rest/api/search", params),
            what="confluence cloud search",
        )
        results = page.get("results", [])
        yield from results
        next_url = (page.get("_links") or {}).get("next")
        if not next_url or not results:
            return
        qs = parse_qs(urlparse(next_url).query)
        cursor = qs.get("cursor", [None])[0]
        if not cursor:
            return


def _user_identifier(user: dict | None, cloud: bool) -> str | None:
    """createdBy identity, mirroring the reference exactly: the CLOUD
    converter reads ``email`` lowered
    (confluence_cloud_document_converter.py:78-83), the Server/DC
    converter reads ``username`` lowered
    (confluence_document_converter.py:78-83) — Server user objects
    carry username/displayName, not email — and BOTH fall back to the
    un-lowered ``displayName``, else None. The key-presence checks
    (`'email' in user`) are kept verbatim so edge values round-trip
    identically."""
    if user:
        primary = "email" if cloud else "username"
        if primary in user:
            val = user[primary]
            # the reference would crash on a present-but-null value; we
            # degrade to None (the only deliberate delta)
            return val.lower() if val else None
        if "displayName" in user:
            return user["displayName"]
    return None


def page_to_canonical(page: dict, base_url: str, cloud: bool = False) -> dict:
    """One Confluence page (+ its comments) → canonical envelope
    (confluence_document_converter.py:17-83 semantics; ``cloud``
    selects the cloud converter's createdBy identity source)."""
    content = page.get("content", page)  # cloud search nests under content
    page_id = str(content.get("id", ""))
    # path-of-titles with KEY-PRESENCE semantics, matching
    # confluence_document_converter.py:70-72 exactly: ancestors without
    # a title key are skipped entirely (no empty segment), ancestors
    # whose title IS an empty string keep their segment, and a page
    # without a title key contributes nothing
    title_parts = [
        a["title"] for a in content.get("ancestors", []) or [] if "title" in a
    ]
    if "title" in content:
        title_parts.append(content["title"])
    title_path = " -> ".join(title_parts)

    body_html = (
        ((content.get("body") or {}).get("storage") or {}).get("value")
    )
    comments = []
    for c in (
        ((content.get("children") or {}).get("comment") or {}).get("results", [])
        or []
    ):
        c_html = ((c.get("body") or {}).get("storage") or {}).get("value")
        if c_html:
            comments.append(html_to_text(c_html))

    text_parts = [p for p in [title_path, html_to_text(body_html), *comments] if p]

    links = content.get("_links") or {}
    webui = links.get("webui", f"/pages/{page_id}")
    version = content.get("version") or {}
    history = content.get("history") or {}
    metadata = {
        "createdAt": history.get("createdDate"),
        "createdBy": _user_identifier(history.get("createdBy"), cloud),
        "lastModifiedAt": version.get("when"),
        "space": (content.get("space") or {}).get("key"),
    }
    return {
        "id": page_id,
        "url": f"{base_url.rstrip('/')}{webui}",
        "metadata": {k: str(v) for k, v in metadata.items() if v is not None},
        "text": "\n\n".join(text_parts),
        "last_modified_at": None,
        "source_type": "confluence",
    }


def read_confluence_documents(
    spark: SparkSession,
    base_url: str,
    cql: str = "",
    transport: Transport | None = None,
    token: str | None = None,
    cloud: bool | None = None,
) -> DataFrame:
    if cloud is None:
        cloud = ".atlassian.net" in base_url
    if transport is None:
        from documents_vector_search_spark.sources.jira import requests_transport

        transport = requests_transport(base_url, token)
    fetch = fetch_pages_cloud if cloud else fetch_pages_server
    rows = [
        page_to_canonical(p, base_url, cloud=cloud)
        for p in fetch(transport, cql)
    ]
    df = spark.createDataFrame(rows, schema=DOCUMENT_SCHEMA)
    return df.withColumn(
        "last_modified_at",
        F.to_timestamp(F.element_at("metadata", "lastModifiedAt")),
    )
