"""Sources: files scan, Jira/Confluence readers (fake transports),
resilient batching, read-through cache."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.sources.batching import (
    SkippedItemsLimitExceeded,
    execute_with_retry,
    read_items_in_batches,
)
from documents_vector_search_spark.sources.cache import cached_read, reader_cache_key
from documents_vector_search_spark.sources.confluence import (
    html_to_text,
    read_confluence_documents,
    wrap_cql,
)
from documents_vector_search_spark.sources.files import read_files_documents
from documents_vector_search_spark.sources.jira import (
    flatten_adf,
    issue_to_canonical,
    read_jira_documents,
)


@pytest.fixture()
def file_tree(tmp_path):
    (tmp_path / "eng" / "specs").mkdir(parents=True)
    (tmp_path / "hr").mkdir()
    (tmp_path / "eng" / "readme.txt").write_text("spark engine readme")
    (tmp_path / "eng" / "specs" / "design.md").write_text("join design doc")
    (tmp_path / "hr" / "policy.txt").write_text("holiday policy")
    (tmp_path / "eng" / "logo.png").write_bytes(b"\x89PNG fake")
    return str(tmp_path)


class TestFilesSource:
    def test_scan_and_metadata(self, spark, file_tree):
        docs = read_files_documents(spark, file_tree)
        rows = {r.id: r for r in docs.collect()}
        assert set(rows) == {"eng/readme.txt", "eng/specs/design.md", "hr/policy.txt"}
        design = rows["eng/specs/design.md"]
        assert design.metadata["folder1"] == "eng"
        assert design.metadata["folder2"] == "specs"
        # reference files_document_converter.py:29-34: document text is
        # "<rel_path>\n\n<stripped content>"
        assert design.text == "eng/specs/design.md\n\njoin design doc"
        assert design.url.endswith("/eng/specs/design.md")
        assert design.source_type == "localFiles"

    def test_binary_blacklist(self, spark, file_tree):
        ids = {r.id for r in read_files_documents(spark, file_tree).collect()}
        assert "eng/logo.png" not in ids

    def test_include_exclude_patterns(self, spark, file_tree):
        inc = read_files_documents(spark, file_tree, include_pattern=r"eng/.*")
        assert {r.id for r in inc.collect()} == {
            "eng/readme.txt",
            "eng/specs/design.md",
        }
        exc = read_files_documents(spark, file_tree, exclude_pattern=r".*\.md")
        assert "eng/specs/design.md" not in {r.id for r in exc.collect()}

    def test_modified_after_pushdown(self, spark, file_tree):
        cutoff = time.time() + 60  # everything is older than this
        docs = read_files_documents(
            spark,
            file_tree,
            modified_after=__import__("datetime").datetime.fromtimestamp(cutoff),
        )
        assert docs.count() == 0


def fake_jira_transport(issues: list[dict]):
    """Offset-paging fake for /rest/api/latest/search."""

    def call(path: str, params: dict) -> dict:
        assert path == "/rest/api/latest/search"
        start = params["startAt"]
        limit = params["maxResults"]
        return {"issues": issues[start : start + limit], "total": len(issues)}

    return call


def make_issue(key: str, summary: str, desc, updated="2024-05-01T10:00:00.000+0000"):
    return {
        "key": key,
        "fields": {
            "summary": summary,
            "description": desc,
            "created": "2024-01-01T00:00:00.000+0000",
            "updated": updated,
            # creator != reporter on purpose: createdBy must come from
            # reporter (jira_document_converter.py:89-92), and this fixture
            # would catch a regression back to creator
            "creator": {"emailAddress": "Proxy.Filer@Corp.COM"},
            "reporter": {"emailAddress": "Alice@Corp.COM"},
            "assignee": None,
            "issuetype": {"name": "Bug"},
            "priority": {"name": "High"},
            "status": {"name": "Open"},
            # epic OBJECT present only on even issues: epic.key must
            # win there (the reference reads the literal Agile `epic`
            # field, jira_document_converter.py:65-72), parent.key is
            # the fallback elsewhere
            **(
                {"epic": {"key": f"EPIC-{key.rsplit('-', 1)[1]}"}}
                if int(key.rsplit("-", 1)[1]) % 2 == 0
                else {}
            ),
            "parent": {"key": "PROJ-1"},
            "comment": {"comments": [{"body": "first comment"}]},
        },
    }


class TestJiraSource:
    def test_reader_pagination_and_conversion(self, spark):
        issues = [make_issue(f"PROJ-{i}", f"issue {i}", f"desc {i}") for i in range(7)]
        df = read_jira_documents(
            spark,
            "https://jira.example.com",
            "project = PROJ",
            transport=fake_jira_transport(issues),
            cloud=False,
        )
        rows = {r.id: r for r in df.collect()}
        assert len(rows) == 7
        r = rows["PROJ-3"]
        assert r.url == "https://jira.example.com/browse/PROJ-3"
        assert r.metadata["project"] == "PROJ"
        assert r.metadata["createdBy"] == "alice@corp.com"  # lowercased
        assert r.metadata["epic"] == "PROJ-1"  # odd issue: parent fallback
        # even issue carries the Agile epic OBJECT: epic.key wins
        assert rows["PROJ-2"].metadata["epic"] == "EPIC-2"
        assert "issue 3" in r.text and "desc 3" in r.text and "first comment" in r.text
        assert r.last_modified_at is not None

    def test_adf_flattening(self):
        adf = {
            "type": "doc",
            "content": [
                {"type": "paragraph", "content": [{"type": "text", "text": "hello"}]},
                {"type": "paragraph", "content": [{"type": "text", "text": "world"}]},
            ],
        }
        assert flatten_adf(adf) == "hello\nworld"

    def test_null_safe_extraction(self):
        doc = issue_to_canonical(
            {"key": "X-1", "fields": {"summary": "s"}}, "https://j", cloud=False
        )
        assert doc["metadata"]["project"] == "X"
        assert "assignee" not in doc["metadata"]


def fake_confluence_transport(pages: list[dict]):
    def call(path: str, params: dict) -> dict:
        assert path == "/rest/api/content/search"
        assert params["cql"].startswith("type=page AND")
        start = params["start"]
        limit = params["limit"]
        return {
            "results": pages[start : start + limit],
            "totalSize": len(pages),
        }

    return call


def make_page(pid: int, title: str, html: str):
    return {
        "id": str(pid),
        "title": title,
        "ancestors": [{"title": "Space Home"}],
        "body": {"storage": {"value": html}},
        "version": {"when": "2024-04-01T12:00:00.000Z"},
        "history": {
            "createdDate": "2024-01-01T00:00:00.000Z",
            # username != email != displayName ON PURPOSE: Server/DC
            # must read username (the reference's converter does —
            # Server user objects carry no usable email), Cloud must
            # read email; a regression to either shows immediately
            "createdBy": {
                "username": "BobU",
                "email": "Bob@corp.com",
                "displayName": "Bob Builder",
            },
        },
        "space": {"key": "ENG"},
        "_links": {"webui": f"/display/ENG/{title}"},
        "children": {
            "comment": {"results": [{"body": {"storage": {"value": "<p>a comment</p>"}}}]}
        },
    }


class TestConfluenceSource:
    def test_reader_and_conversion(self, spark):
        pages = [
            make_page(100 + i, f"Page{i}", f"<h1>T{i}</h1><p>body {i} text</p>")
            for i in range(3)
        ]
        df = read_confluence_documents(
            spark,
            "https://conf.example.com",
            "space = ENG",
            transport=fake_confluence_transport(pages),
            cloud=False,
        )
        rows = {r.id: r for r in df.collect()}
        assert len(rows) == 3
        r = rows["101"]
        assert r.metadata["space"] == "ENG"
        # Server/DC: username lowered (confluence_document_converter.py:78-83)
        assert r.metadata["createdBy"] == "bobu"
        assert r.text.startswith("Space Home -> Page1")
        assert "body 1 text" in r.text and "a comment" in r.text

    def test_cloud_reads_email_and_displayname_fallback(self):
        from documents_vector_search_spark.sources.confluence import (
            page_to_canonical,
        )

        page = make_page(7, "P", "<p>x</p>")
        # cloud converter: email lowered
        got = page_to_canonical(page, "https://x.atlassian.net", cloud=True)
        assert got["metadata"]["createdBy"] == "bob@corp.com"
        # both converters: displayName fallback, NOT lowered
        page["history"]["createdBy"] = {"displayName": "Bob Builder"}
        for cloud in (True, False):
            got = page_to_canonical(page, "https://x", cloud=cloud)
            assert got["metadata"]["createdBy"] == "Bob Builder"
        # no identity at all -> key absent
        page["history"]["createdBy"] = {}
        got = page_to_canonical(page, "https://x", cloud=False)
        assert "createdBy" not in got["metadata"]

    def test_html_to_text_fallback(self):
        html = "<div><h1>Title</h1><p>para &amp; more</p><script>x()</script></div>"
        text = html_to_text(html)
        assert "Title" in text and "para & more" in text
        assert "x()" not in text

    def test_wrap_cql(self):
        assert wrap_cql("space = X") == "type=page AND (space = X)"
        assert wrap_cql("") == "type=page"


class TestBatching:
    def test_retry_then_success(self):
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise IOError("boom")
            return "ok"

        assert execute_with_retry(flaky, retries=3, delay_seconds=0) == "ok"

    def test_retry_exhausted(self):
        with pytest.raises(RuntimeError, match="retries exhausted"):
            execute_with_retry(
                lambda: (_ for _ in ()).throw(IOError("x")), retries=2, delay_seconds=0
            )

    def test_batch_degradation_skips_bad_items(self):
        data = list(range(10))

        def read_batch(offset, limit):
            chunk = data[offset : offset + limit]
            if 3 in chunk:  # item 3 poisons any batch containing it
                raise ValueError("bad item")
            return chunk

        got = list(read_items_in_batches(read_batch, 10, batch_size=4))
        assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9]

    def test_skip_limit_exceeded(self):
        def read_batch(offset, limit):
            raise ValueError("always bad")

        with pytest.raises(SkippedItemsLimitExceeded):
            list(
                read_items_in_batches(
                    read_batch, 10, batch_size=10, max_skipped_items_in_row=3
                )
            )


class TestCache:
    def test_read_through_and_hit(self, spark, tmp_path):
        calls = []

        def source():
            calls.append(1)
            return spark.createDataFrame([(1, "a"), (2, "b")], ["id", "text"])

        details = {"reader": "files", "path": "/x"}
        df1 = cached_read(spark, str(tmp_path), details, source)
        assert df1.count() == 2 and len(calls) == 1
        df2 = cached_read(spark, str(tmp_path), details, source)
        assert df2.count() == 2 and len(calls) == 1  # cache hit: no re-read

        other = cached_read(
            spark, str(tmp_path), {"reader": "files", "path": "/y"}, source
        )
        assert len(calls) == 2  # different config → different key

    def test_cache_key_stable_under_key_order(self):
        assert reader_cache_key({"a": 1, "b": 2}) == reader_cache_key({"b": 2, "a": 1})
