"""OpenAIChatBackend exercised beyond import-try (r2 verdict item 5):
a local OpenAI-compatible mock server (stdlib http.server, no network)
drives the stdlib urllib fallback client, standalone and through the
full actor-pool pipeline; malformed responses must quarantine to zero
interactions, never crash.  Plus the pinned v7 prompt contract hashes
against the reference checkout."""
import hashlib
import http.server
import json
import os
import threading

import pytest

from kgray.stages.extract import OpenAIChatBackend, _UrllibChatClient


class _MockOpenAI(http.server.BaseHTTPRequestHandler):
    """Returns one fixed BEL interaction when the user message mentions
    AKT1, an empty interaction list otherwise, and (on /broken) invalid
    JSON content to exercise the quarantine path."""

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        self.server.requests.append((self.path, payload))
        user = next(
            (m["content"] for m in payload.get("messages", [])
             if m.get("role") == "user"),
            "",
        )
        if "/down/" in self.path:  # permanent outage: every attempt 500s
            self.send_error(500, "backend down")
            return
        if "/flaky/" in self.path:  # transient 429: first hit per prompt
            key = hashlib.sha256(user.encode()).hexdigest()
            if key not in self.server.flaky_seen:
                self.server.flaky_seen.add(key)
                self.send_error(429, "rate limited")
                return
        if self.path.endswith("/broken/chat/completions"):
            content = "NOT JSON {{{"
        elif "AKT1" in user:
            content = json.dumps(
                {
                    "interactions": [
                        {
                            "bel_statement":
                                "p(HGNC:AKT1) increases act(p(HGNC:HSF1))",
                            "evidence": "AKT1 activates HSF1.",
                        }
                    ]
                }
            )
        else:
            content = json.dumps({"interactions": []})
        body = json.dumps(
            {"choices": [{"message": {"role": "assistant",
                                      "content": content}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # noqa: D102 - silence test output
        pass


@pytest.fixture(scope="module")
def mock_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _MockOpenAI)
    srv.requests = []
    srv.flaky_seen = set()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _base(srv) -> str:
    return f"http://127.0.0.1:{srv.server_address[1]}/v1"


def test_backend_extracts_via_mock_server(mock_server):
    be = OpenAIChatBackend(
        prompt_text="test prompt", base_url=_base(mock_server),
        api_key="test-key",
    )
    out = be.extract_batch(
        ["AKT1 activates HSF1.", "Nothing biological here."],
        [[{"entity_text": "AKT1"}], []],
    )
    assert len(out) == 2
    assert out[0][0]["bel_statement"] == (
        "p(HGNC:AKT1) increases act(p(HGNC:HSF1))"
    )
    assert out[1] == []
    # protocol shape: system prompt + user message, json response_format
    path, payload = mock_server.requests[-1]
    assert path.endswith("/chat/completions")
    assert payload["messages"][0] == {
        "role": "system", "content": "test prompt"
    }
    assert payload["response_format"] == {"type": "json_object"}
    assert payload["temperature"] == 0.0


def test_backend_malformed_json_quarantines(mock_server):
    be = OpenAIChatBackend(
        prompt_text="p", base_url=_base(mock_server) + "/broken",
    )
    out = be.extract_batch(["AKT1 activates HSF1."], [[]])
    assert out == [[]]


def test_backend_without_openai_needs_base_url():
    with pytest.raises(NotImplementedError):
        OpenAIChatBackend(prompt_text="p")


def test_urllib_client_bearer_header(mock_server):
    cl = _UrllibChatClient(_base(mock_server), api_key="sk-abc")
    resp = cl.chat.completions.create(
        model="m", messages=[{"role": "user", "content": "x"}]
    )
    assert resp.choices[0].message.content == json.dumps(
        {"interactions": []}
    )


def test_full_pipeline_through_mock_backend(mock_server, ray_session):
    """The openai backend as the pipeline's actor-pool stage: actors run
    in separate processes, so this also proves the client state pickles
    and the server is reached from workers."""
    import pyarrow as pa
    import ray.data

    from kgray.pipelines.kg import KGConfig, run_kg_pipeline
    from kgray.sources.textfile import raw_text_to_documents

    text = (
        "AKT1 activates HSF1 in stressed cells. This paragraph is long "
        "enough to be admitted by the filters."
    )
    docs = ray.data.from_arrow(
        raw_text_to_documents(
            pa.table({"doc_id": ["d1"], "raw_text": [text]})
        )
    )
    cfg = KGConfig(
        backend="openai",
        backend_kwargs={
            "prompt_text": "test prompt",
            "base_url": _base(mock_server),
        },
    )
    res = run_kg_pipeline(docs, cfg)
    edges = res.edges.to_pandas()
    assert len(edges) >= 1
    assert (edges.subj_label == "AKT1").any()
    assert (edges.bel_expression ==
            "p(HGNC:AKT1) increases act(p(HGNC:HSF1))").any()


def _annotated_batch(text="AKT1 activates HSF1 in stressed cells. This "
                          "paragraph is long enough to be admitted."):
    """ANNOTATED_CHUNKS batch for driving BELExtractor directly."""
    import pyarrow as pa

    from kgray.sources.textfile import raw_text_to_documents
    from kgray.stages.annotate import DictionaryAnnotator
    from kgray.stages.chunk import explode_spans

    docs = raw_text_to_documents(
        pa.table({"doc_id": ["d1"], "raw_text": [text]})
    )
    return DictionaryAnnotator()(explode_spans(docs))


def test_transient_failure_retries_then_extracts(mock_server):
    """r3 verdict ask #6, transient half: a 429 on the first attempt must
    retry (bounded) and then extract normally — rows lose nothing."""
    from kgray.stages.extract import BELExtractor

    ext = BELExtractor(
        backend=OpenAIChatBackend(
            prompt_text="p", base_url=_base(mock_server) + "/flaky",
            api_key="k",
        ),
        max_retries=1,
    )
    out = ext(_annotated_batch())
    errors = [e for e in out.column("extract_error").to_pylist() if e]
    assert errors == []  # retried through the 429, no quarantine
    stmts = [
        r["bel_statement"]
        for res in out.column("results").to_pylist() for r in res
    ]
    assert "p(HGNC:AKT1) increases act(p(HGNC:HSF1))" in stmts


def test_permanent_failure_quarantines_with_lineage(mock_server):
    """r3 verdict ask #6, permanent half: a backend that keeps failing
    lands the row in the errors table WITH (doc_id, span_seq) lineage and
    empty results — never a crash, never a dropped row."""
    import ray.data

    from kgray.stages.extract import BELExtractor, extraction_errors

    batch = _annotated_batch()
    ext = BELExtractor(
        backend=OpenAIChatBackend(
            prompt_text="p", base_url=_base(mock_server) + "/down",
            api_key="k",
        ),
        max_retries=1,
    )
    out = ext(batch)
    assert out.num_rows == batch.num_rows  # no dropped rows
    errs = [e for e in out.column("extract_error").to_pylist() if e]
    assert errs and "500" in errs[0]
    assert all(res == [] for res in out.column("results").to_pylist())
    table = extraction_errors(ray.data.from_arrow(out)).to_pandas()
    assert set(table.columns) == {"doc_id", "span_seq", "extract_error"}
    assert (table.doc_id == "d1").all()


# ---------------------------------------------------------------------------
# pinned v7 prompt contract (r2 verdict item 5, checksum half)
# ---------------------------------------------------------------------------

_REF_V7 = "/root/reference/textToKnowledgeGraph/prompt_file_v7.txt"


def test_v7_prompt_contract_hashes_match_reference():
    from kgray.functions.prompts import (
        V7_BLOCK_LEN,
        V7_BLOCK_SHA256,
        V7_FILE_SHA256,
        extract_block,
        verify_v7,
    )

    if not os.path.exists(_REF_V7):
        pytest.skip("reference prompt_file_v7.txt not present")
    content = open(_REF_V7, encoding="utf-8").read()
    assert hashlib.sha256(content.encode()).hexdigest() == V7_FILE_SHA256
    assert verify_v7(content)
    block = extract_block(content, "general prompt")
    assert len(block) == V7_BLOCK_LEN
    assert hashlib.sha256(block.encode()).hexdigest() == V7_BLOCK_SHA256
