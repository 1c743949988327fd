"""Route compiler: declarative pipeline spec → DataFrame DAG.

The Spark analog of the reference's configuration graph + event bus
(EventBusConfigurations → EventBus/HandlerReader,
event_stream/configuration/bus.py + streams/bus.py): a validated config
declares busses (sources) and routes (event filter → transform → sink);
compilation produces batch DataFrames or a single-scan multi-sink streaming
query.
"""

from .config import (
    BusConfig,
    ConfigurationError,
    ConnectionConfig,
    EngineConfig,
    RouteConfig,
    Secret,
    SinkConfig,
    TransformRef,
)
from .routes import compile_bus, run_batch, start_streaming

__all__ = [
    "BusConfig",
    "ConfigurationError",
    "ConnectionConfig",
    "EngineConfig",
    "RouteConfig",
    "Secret",
    "SinkConfig",
    "TransformRef",
    "compile_bus",
    "run_batch",
    "start_streaming",
]
