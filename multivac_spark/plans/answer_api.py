"""HTTP answer service — the reference's Flask query app rebuilt as a
stdlib twin over the Spark query-answering path.

Reference counterpart: ``app.py:12-49`` (Flask; ``GET /`` renders the
query form, ``GET /results`` reads ``search-input`` /
``model-type-input`` / ``threshold-input`` / ``num-top-input`` /
``run-input`` / ``verbosity-input`` and calls ``map_queries.run``).
This twin keeps the same routes and parameter names but answers from
the engine's own pipeline — ``clean_query`` →
``extract_query_parts`` → ``answer_queries`` (operators/query.py, the
``map_queries.py:153-226`` analog) — and returns JSON (the echoed
args plus the ranked answers) instead of the reference's
echo-the-args-dict debug response.

Serving model: ``http.server.ThreadingHTTPServer`` (stdlib — Flask is
not a dependency of this repo) wrapping ONE long-lived SparkSession;
each request is a short driver-side job over the pre-checkpointed
triple/embedding tables, the same deployment shape as the reference's
single-process Flask app. For production-scale QPS the service is a
thin layer: the heavy state (canonical triples, mention vectors) is
already materialized once at construction.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F

_FORM_HTML = b"""<!doctype html><html><body>
<form action="/results" method="get">
<input name="search-input" placeholder="question">
<select name="model-type-input">
<option value="blend">blend</option><option value="transe">transe</option>
</select>
<input name="threshold-input" value="0.75">
<input name="num-top-input" value="10">
<button type="submit">Ask</button>
</form></body></html>"""


class AnswerService:
    """Holds the session + materialized KG state and answers one
    query string per call (the ``map_queries.run`` analog)."""

    def __init__(self, spark, final_triples, embeddings,
                 lexicon, lemmas):
        self.spark = spark
        self.triples = final_triples.localCheckpoint()
        self.embeddings = embeddings
        self.lexicon = lexicon
        self.lemmas = lemmas

    def answer(self, search: str, model: str = "blend",
               threshold: float = 0.75, num_top: int = 10,
               impute: bool = False) -> list[dict]:
        from multivac_spark.operators import query as Q

        cleaned = Q.clean_query(search)
        if not cleaned:
            return []
        qdf = self.spark.createDataFrame(
            [(0, cleaned)], "query_id long, query string")
        parts = Q.extract_query_parts(qdf, self.lexicon, self.lemmas)
        answers = Q.answer_queries(
            parts, self.triples, self.embeddings,
            threshold=threshold, impute=impute, model=model)
        cols = answers.columns
        order = [F.desc("score_micro")] if "score_micro" in cols else []
        rows = (answers.orderBy(*order, "answer")
                .limit(int(num_top)).collect())
        return [r.asDict() for r in rows]


def _make_handler(service: AnswerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet test runs
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, _FORM_HTML, "text/html")
                return
            if url.path != "/results":
                self._send(404, b"not found", "text/plain")
                return
            qs = {k: v[0] for k, v in parse_qs(url.query).items()}
            search = qs.get("search-input", "")
            if not search:
                # app.py:48-49 redirects non-queries back to the form
                self.send_response(302)
                self.send_header("Location", "/")
                self.end_headers()
                return
            args = {
                "search": search,
                "model": qs.get("model-type-input", "blend"),
                "threshold": float(qs.get("threshold-input", "0.75")),
                "num_top_rel": int(qs.get("num-top-input", "10")),
                "run": qs.get("run-input", "query"),
                "verbose": qs.get("verbosity-input", "false"),
            }
            try:
                answers = service.answer(
                    search, model=args["model"],
                    threshold=args["threshold"],
                    num_top=args["num_top_rel"],
                    impute=args["run"] == "predict")
            except Exception as exc:   # surface, don't hang the client
                self._send(500, json.dumps(
                    {"error": f"{type(exc).__name__}: {exc}"}).encode(),
                    "application/json")
                return
            body = json.dumps({"args": args, "answers": answers},
                              default=str).encode()
            self._send(200, body, "application/json")

    return Handler


def serve(service: AnswerService, host: str = "127.0.0.1",
          port: int = 0) -> tuple[ThreadingHTTPServer, int]:
    """Start the service on a background thread; returns (server,
    bound_port). ``server.shutdown()`` stops it."""
    srv = ThreadingHTTPServer((host, port), _make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
