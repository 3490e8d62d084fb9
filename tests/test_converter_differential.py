"""Differential harness: our dict-level source converters against the
REFERENCE converters, imported from /root/reference and used as a TEST
ORACLE only (no reference code is copied or shipped; pytest skips
cleanly if the reference tree is absent).

The last three rounds each found a converter-fidelity delta by hand
(Jira creator→reporter, Confluence per-variant createdBy, epic
coalesce). This file catches that class mechanically: one shared
logical fixture per scenario is rendered into BOTH input shapes (the
reference reader's composed document vs our fetch layer's page/issue
dicts — same REST objects, different composition points) and the
canonical envelopes must match field-for-field.

Normalizations applied, each a documented schema-level design delta,
not a semantic one:
- the reference keeps None-valued metadata entries; our envelope's
  MAP<STRING,STRING> cannot hold them, so None entries are dropped
  from the reference side before comparing;
- the reference emits `chunks` at convert time; our chunking happens
  at create_collection (T1/T2) and is covered by the chunking oracles,
  so chunks are not compared here.

Confluence HTML bodies need bs4 (absent in this container — the
reference imports it at module level, so a minimal import stub is
installed that FAILS if actually exercised); every Confluence fixture
therefore uses empty bodies, which the reference short-circuits before
touching BeautifulSoup. Metadata/id/url/title-path semantics are fully
covered; HTML-extraction parity is covered by our own html_to_text
tests and stays honestly out of scope here.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "main", "sources")),
    reason="reference tree not available",
)


class _SegmentSplitter:
    """Splitter stub injected into the reference converters: they only
    need .split_text; one-chunk passthrough keeps chunks irrelevant to
    the envelope comparison."""

    def split_text(self, text):
        return [text]

    def get_details(self):
        return {"stub": True}


@pytest.fixture(scope="module")
def ref():
    """Import the four reference converter classes (oracle only)."""
    installed_stub = False
    if "bs4" not in sys.modules:
        stub = types.ModuleType("bs4")

        class _NoBs4:
            def __init__(self, *a, **k):  # pragma: no cover
                raise AssertionError(
                    "differential fixtures must not exercise bs4 "
                    "(use empty HTML bodies)"
                )

        stub.BeautifulSoup = _NoBs4
        sys.modules["bs4"] = stub
        installed_stub = True
    sys.path.insert(0, REF_ROOT)
    try:
        from main.sources.confluence.confluence_cloud_document_converter import (
            ConfluenceCloudDocumentConverter,
        )
        from main.sources.confluence.confluence_document_converter import (
            ConfluenceDocumentConverter,
        )
        from main.sources.jira.jira_cloud_document_converter import (
            JiraCloudDocumentConverter,
        )
        from main.sources.jira.jira_document_converter import (
            JiraDocumentConverter,
        )
    finally:
        sys.path.remove(REF_ROOT)
    s = _SegmentSplitter()
    yield {
        "jira": JiraDocumentConverter(s),
        "jira_cloud": JiraCloudDocumentConverter(s),
        "confluence": ConfluenceDocumentConverter(s),
        "confluence_cloud": ConfluenceCloudDocumentConverter(s),
    }
    # remove the poisoned stub so later tests (e.g. the confluence
    # source's bs4 ImportError fallback) see a clean sys.modules
    if installed_stub:
        sys.modules.pop("bs4", None)


def _norm_ref(envelope: dict) -> dict:
    return {
        "id": envelope["id"],
        "url": envelope["url"],
        "metadata": {
            k: str(v) for k, v in envelope["metadata"].items() if v is not None
        },
        "text": envelope["text"],
    }


def _norm_ours(envelope: dict) -> dict:
    return {
        "id": envelope["id"],
        "url": envelope["url"],
        "metadata": envelope["metadata"],
        "text": envelope["text"],
    }


# ---------------------------------------------------------------------------
# Jira: one logical issue spec renders to the REST issue dict both
# converters consume (reference reads the same shape our fetch returns)
# ---------------------------------------------------------------------------

JIRA_BASE = "https://jira.corp.example/jira"


def _issue(
    key="PROJ-7",
    summary="Fix the shuffle",
    description="It is broken.",
    comments=("first comment", "second"),
    reporter={"emailAddress": "Rep@Example.com", "displayName": "Rep"},
    assignee={"emailAddress": "Asg@Example.com"},
    issuetype={"name": "Bug"},
    priority={"name": "High"},
    status={"name": "Open"},
    epic=None,
    parent=None,
    extra_fields=None,
):
    fields = {
        "created": "2024-01-02T03:04:05.000+0000",
        "updated": "2024-02-03T04:05:06.000+0000",
        "summary": summary,
        "description": description,
        "comment": {"comments": [{"body": b} for b in comments]},
        "reporter": reporter,
        "assignee": assignee,
        "issuetype": issuetype,
        "priority": priority,
        "status": status,
    }
    if epic is not None:
        fields["epic"] = epic
    if parent is not None:
        fields["parent"] = parent
    if extra_fields:
        fields.update(extra_fields)
    return {
        "key": key,
        "self": f"{JIRA_BASE}/rest/api/2/issue/10007",
        "fields": fields,
    }


def _adf(*paragraphs):
    """Realistic ADF: doc → paragraph content → text nodes (the 2-level
    shape the reference flattener reads)."""
    return {
        "type": "doc",
        "content": [
            {
                "type": "paragraph",
                "content": [{"type": "text", "text": t} for t in texts],
            }
            for texts in paragraphs
        ],
    }


JIRA_CASES = {
    "full": _issue(),
    "null_description": _issue(description=None),
    "empty_description": _issue(description=""),
    "no_comments": _issue(comments=()),
    "empty_comment_body": _issue(comments=("", "real")),
    "null_reporter": _issue(reporter=None),
    "reporter_no_email": _issue(reporter={"displayName": "Someone"}),
    "null_assignee": _issue(assignee=None),
    "assignee_empty_obj": _issue(assignee={}),
    "null_priority": _issue(priority=None),
    "missing_priority": _issue(priority=None, extra_fields=None),
    "null_status": _issue(status=None),
    "null_issuetype": _issue(issuetype=None),
    "epic_key": _issue(epic={"key": "EP-1"}),
    "parent_fallback": _issue(parent={"key": "PROJ-1"}),
    "epic_wins_over_parent": _issue(
        epic={"key": "EP-1"}, parent={"key": "PROJ-1"}
    ),
    # reference: a truthy epic object WITHOUT a key yields None and
    # does NOT fall through to parent
    "epic_nokey_blocks_parent": _issue(
        epic={"id": "123"}, parent={"key": "PROJ-1"}
    ),
    "empty_summary": _issue(summary=""),
    "spacey_summary": _issue(summary="  padded  "),
    "whitespace_description": _issue(description="   "),
}


@pytest.mark.parametrize("case", sorted(JIRA_CASES))
def test_jira_server_envelope_matches_reference(ref, case):
    from documents_vector_search_spark.sources.jira import issue_to_canonical

    issue = JIRA_CASES[case]
    expected = _norm_ref(ref["jira"].convert(issue)[0])
    got = _norm_ours(issue_to_canonical(issue, JIRA_BASE, cloud=False))
    assert got == expected, f"case={case}"


def _cloud_issue(case_issue):
    """Cloud twin of a server fixture: description/comment bodies become
    ADF documents with the same logical text."""
    import copy

    issue = copy.deepcopy(case_issue)
    f = issue["fields"]
    if isinstance(f.get("description"), str) and f["description"]:
        f["description"] = _adf([f["description"]])
    elif f.get("description") is not None:
        f["description"] = None if f["description"] is None else _adf()
    for c in f["comment"]["comments"]:
        c["body"] = _adf([c["body"]] if c["body"] else [])
    return issue


JIRA_CLOUD_CASES = {
    name: _cloud_issue(spec)
    for name, spec in JIRA_CASES.items()
    if name not in ("whitespace_description",)  # ADF text nodes carry it
} | {
    "adf_multi_paragraph": _issue(
        description=_adf(["para one"], ["para two", "same para"]),
        comments=(),
    ),
    "adf_empty_text_nodes": _issue(
        description=_adf(["kept", ""], [""], ["also kept"]),
        comments=(),
    ),
    "adf_paragraph_without_content": _issue(
        description={
            "type": "doc",
            "content": [
                {"type": "rule"},  # no nested content at all
                {
                    "type": "paragraph",
                    "content": [{"type": "text", "text": "after rule"}],
                },
            ],
        },
        comments=(),
    ),
}


@pytest.mark.parametrize("case", sorted(JIRA_CLOUD_CASES))
def test_jira_cloud_envelope_matches_reference(ref, case):
    from documents_vector_search_spark.sources.jira import issue_to_canonical

    issue = JIRA_CLOUD_CASES[case]
    expected = _norm_ref(ref["jira_cloud"].convert(issue)[0])
    got = _norm_ours(issue_to_canonical(issue, JIRA_BASE, cloud=True))
    assert got == expected, f"case={case}"


# ---------------------------------------------------------------------------
# Confluence: one logical page spec renders into the reference reader's
# composed {"page": ..., "comments": [...]} AND our fetch layer's page
# dict (children.comment.results nesting) — same REST objects
# ---------------------------------------------------------------------------

CONF_BASE = "https://wiki.corp.example"


def _page_spec(
    page_id="98765",
    title="Design notes",
    ancestors=({"title": "Space Home"}, {"title": "Architecture"}),
    created_by={"username": "JDoe", "displayName": "J. Doe"},
    space_key="ENG",
    webui="/display/ENG/Design+notes",
    n_comments=0,
    title_present=True,
):
    return {
        "page_id": page_id,
        "title": title,
        "title_present": title_present,
        "ancestors": list(ancestors),
        "created_by": created_by,
        "space_key": space_key,
        "webui": webui,
        "n_comments": n_comments,
    }


def _conf_content(spec, cloud):
    content = {
        "id": spec["page_id"],
        "ancestors": spec["ancestors"],
        "history": {
            "createdDate": "2024-03-04T05:06:07.000Z",
            "createdBy": spec["created_by"],
        },
        "version": {"when": "2024-04-05T06:07:08.000Z"},
        "space": {"key": spec["space_key"]},
        "body": {"storage": {"value": ""}},  # empty: bs4 never runs
        "_links": {
            "self": f"{CONF_BASE}/rest/api/content/{spec['page_id']}",
            "webui": spec["webui"],
        },
    }
    if spec["title_present"]:
        content["title"] = spec["title"]
    return content


def _conf_ref_document(spec, cloud):
    content = _conf_content(spec, cloud)
    comments = [
        {"body": {"storage": {"value": ""}}} for _ in range(spec["n_comments"])
    ]
    page = {"content": content} if cloud else content
    return {"page": page, "comments": comments}


def _conf_our_page(spec, cloud):
    content = _conf_content(spec, cloud)
    content["children"] = {
        "comment": {
            "results": [
                {"body": {"storage": {"value": ""}}}
                for _ in range(spec["n_comments"])
            ]
        }
    }
    return {"content": content} if cloud else content


CONF_CASES = {
    "full": _page_spec(),
    "no_ancestors": _page_spec(ancestors=()),
    "ancestor_without_title": _page_spec(
        ancestors=({"title": "Kept"}, {"id": "1"})
    ),
    "ancestor_empty_title": _page_spec(
        ancestors=({"title": ""}, {"title": "Real"})
    ),
    "missing_page_title": _page_spec(title_present=False),
    "empty_page_title": _page_spec(title=""),
    "empty_body_with_comments": _page_spec(n_comments=2),
    "created_by_displayname_only": _page_spec(
        created_by={"displayName": "Only Display"}
    ),
    "created_by_empty_obj": _page_spec(created_by={}),
    # server reads username (lowered); an email key alone must fall to
    # displayName on server but be used (lowered) on cloud
    "created_by_email_only": _page_spec(
        created_by={"email": "Who@Example.com", "displayName": "W"}
    ),
    "created_by_username_and_email": _page_spec(
        created_by={
            "username": "UName",
            "email": "Mail@Example.com",
            "displayName": "D",
        }
    ),
}


@pytest.mark.parametrize("cloud", [False, True], ids=["server", "cloud"])
@pytest.mark.parametrize("case", sorted(CONF_CASES))
def test_confluence_envelope_matches_reference(ref, case, cloud):
    from documents_vector_search_spark.sources.confluence import (
        page_to_canonical,
    )

    spec = CONF_CASES[case]
    conv = ref["confluence_cloud" if cloud else "confluence"]
    expected = _norm_ref(conv.convert(_conf_ref_document(spec, cloud))[0])
    got = _norm_ours(
        page_to_canonical(_conf_our_page(spec, cloud), CONF_BASE, cloud=cloud)
    )
    assert got == expected, f"case={case} cloud={cloud}"


# ---------------------------------------------------------------------------
# Chunk topology: with title_from_text (what the source create commands
# set), our build_chunks must reproduce the reference's chunk list —
# chunk 0 = the title/main-info line, the splitter sees ONLY the body.
# The stub splitter returns the body whole, so a generous chunk_size
# makes the two chunk lists comparable element-for-element.
# ---------------------------------------------------------------------------


def _our_chunks(spark, envelope, chunk_size=10_000):
    from documents_vector_search_spark.collection.creator import build_chunks

    df = spark.createDataFrame(
        [(envelope["id"], envelope["text"])], "id string, text string"
    )
    rows = build_chunks(
        df, chunk_size=chunk_size, chunk_overlap=0, title_from_text=True
    ).collect()
    return [
        r.indexed_data for r in sorted(rows, key=lambda r: r.chunk_number)
    ]


@pytest.mark.parametrize(
    "case", ["full", "null_description", "no_comments", "empty_summary"]
)
def test_jira_chunk_topology_matches_reference(ref, spark, case):
    from documents_vector_search_spark.sources.jira import issue_to_canonical

    issue = JIRA_CASES[case]
    expected = [
        c["indexedData"] for c in ref["jira"].convert(issue)[0]["chunks"]
    ]
    got = _our_chunks(spark, issue_to_canonical(issue, JIRA_BASE, cloud=False))
    assert got == expected, f"case={case}"


@pytest.mark.parametrize("case", ["full", "empty_body_with_comments"])
def test_confluence_chunk_topology_matches_reference(ref, spark, case):
    from documents_vector_search_spark.sources.confluence import (
        page_to_canonical,
    )

    spec = CONF_CASES[case]
    expected = [
        c["indexedData"]
        for c in ref["confluence"].convert(_conf_ref_document(spec, False))[0][
            "chunks"
        ]
    ]
    got = _our_chunks(
        spark, page_to_canonical(_conf_our_page(spec, False), CONF_BASE)
    )
    assert got == expected, f"case={case}"
