"""Source connectors: batch multi-format readers and streaming source
factories (reference A1 stream-source read, A21 range read, A22 length probe;
SURVEY §2A).
"""

from .batch import read_any, read_range, read_tail, stream_length
from .bucketed import read_bucketed, write_bucketed
from .redis_stream import RedisStreamClient, register_rediswire
from .stream import events_file_stream, file_stream, kafka_stream, rate_stream

__all__ = [
    "read_any",
    "read_range",
    "read_tail",
    "stream_length",
    "read_bucketed",
    "write_bucketed",
    "file_stream",
    "events_file_stream",
    "kafka_stream",
    "rate_stream",
    "RedisStreamClient",
    "register_rediswire",
]
