"""Shim: the in-memory RESP2 server now lives in the package
(eventstream_spark/sources/resp_server.py) so registered queries can ingest
through it; tests keep importing from here."""

from eventstream_spark.sources.resp_server import (  # noqa: F401
    FakeRedisServer,
    RespFail,
    RespStatus,
)
