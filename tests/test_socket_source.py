"""Socket-source end-to-end smoke (SentimentAnalysis.scala:41 ↔
sparksent/streaming/sources.py::socket_lines): the one reference
surface previously covered only by file-replay equivalence. A real
localhost TCP server feeds newline CSV through socket_lines ->
parse_lines -> memory sink; the parsed rows must round-trip the wire
format exactly, including a comma inside the text body (the
``msg.drop(2).mkString(",")`` behavior) and a malformed short line
(NULL fields, not a job abort, under Spark 4 ANSI mode)."""

from __future__ import annotations

import socket
import socketserver
import threading
import time

from sparksent.parse import parse_lines
from sparksent.streaming.sinks import to_memory
from sparksent.streaming.sources import socket_lines

LINES = [
    "general,alice,hello world",
    "dev,bob,commas, stay, in the text",
    "general,carol,",
    "short",  # < 2 commas: channel='short', user NULL, text ''
]


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        self.request.sendall(("\n".join(LINES) + "\n").encode())
        # the socket source reads until EOF ends the stream; hold the
        # connection open until the test signals it has its rows
        self.server.done.wait(timeout=60)


def test_socket_source_to_memory_sink(spark):
    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Handler)
    server.done = threading.Event()
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    query = None
    try:
        parsed = parse_lines(socket_lines(spark, "127.0.0.1", port))
        query = to_memory(parsed.select("channel", "user", "text"), "socket_smoke")
        deadline = time.monotonic() + 50
        rows = []
        while time.monotonic() < deadline and len(rows) < len(LINES):
            time.sleep(0.5)
            rows = spark.sql("SELECT * FROM socket_smoke").collect()
        nonefirst = lambda t: tuple((x is not None, x or "") for x in t)  # noqa: E731
        got = sorted(((r.channel, r.user, r.text) for r in rows), key=nonefirst)
        assert got == sorted(
            [
                ("general", "alice", "hello world"),
                ("dev", "bob", "commas, stay, in the text"),
                ("general", "carol", ""),
                ("short", None, ""),
            ],
            key=nonefirst,
        ), got
    finally:
        server.done.set()
        if query is not None:
            query.stop()
        server.shutdown()
        server.server_close()


def test_kafka_lines_clear_error_without_package(spark):
    """kafka_lines (the documented production ingest swap, made
    concrete in round 12) must fail with a RuntimeError NAMING the
    missing spark-sql-kafka package in this sandbox — not Spark's
    generic DATA_SOURCE_NOT_FOUND surfacing at a surprising distance
    from the call site.  If a future environment ships the package,
    this test's premise changes and it should become a live smoke
    test."""
    import pytest as _pytest

    from sparksent.streaming import kafka_lines

    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_lines(spark, "localhost:9092", "chat")
