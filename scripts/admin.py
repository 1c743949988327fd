"""Ops CLI (reference A29: close_local / clear_groups / clean_handler_records
/ unlock, top-level scripts at /root/reference/*.py). The Spark control
surface is the driver, so every admin action is a thin spark-submit job over
the library:

  python scripts/admin.py validate <config.json>     # A27 --validate dry-run
  python scripts/admin.py trim <table_dir> <keep_n> [archive_dir]   # A12
  python scripts/admin.py trim-partitions <table_dir> <iso_date> [archive_dir]
      # A12 at scale: drop whole date= partitions older than the horizon
  python scripts/admin.py run-batch <config.json> <sf_dir>          # one-shot
  python scripts/admin.py tail <table_dir> [n]       # A21 XREVRANGE probe
  python scripts/admin.py length <table_dir>         # A22 XLEN probe
  python scripts/admin.py close-local <config.json> <source_dir> [app] [inst]
      # reference close_local.py: bring up the config's per-route streams,
      # publish get_instance, await the correlated response, stop matched
  python scripts/admin.py schema [out.json]
      # reference generate_schema.py: dump the EngineConfig JSON Schema
      # to the file (or stdout when omitted) for editor/CI tooling
  python scripts/admin.py clear-groups <checkpoint_root> <idle_min>
      # reference clear_groups.py/clean_handler_records.py: sweep orphaned
      # checkpoint dirs idle past the threshold (the consumer-group GC
      # analog; in-process queries sweep via QueryManager.clear_idle)

The reference's lock sweeper (unlock.py) has no analog: Spark owns
executor coordination.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.plans.config import ConfigurationError, EngineConfig
from eventstream_spark.session import get_spark


def cmd_validate(config_path: str) -> int:
    """A27 `application.py --validate`: compile the config, aggregate every
    error (env substitution + transform import + sink kinds), exit nonzero
    on any."""
    try:
        cfg = EngineConfig.from_json_file(config_path)
    except ConfigurationError as exc:
        print(f"INVALID: {exc}")
        return 1
    n_routes = sum(len(b.routes) for b in cfg.busses)
    print(f"OK: {len(cfg.busses)} bus(ses), {n_routes} route(s)")
    return 0


def cmd_trim(table_dir: str, keep: str, archive_dir: str | None = None) -> int:
    from eventstream_spark.streaming.control import trim_and_archive

    spark = get_spark(app_name="admin-trim")
    stats = trim_and_archive(spark, table_dir, int(keep), archive_dir)
    print(json.dumps(stats))
    return 0


def cmd_trim_partitions(table_dir: str, horizon: str, archive_dir: str | None = None) -> int:
    """A12 at scale: archive-then-drop whole date= partitions older than
    the horizon (ISO date); no Spark session needed — pure directory moves."""
    from eventstream_spark.streaming.control import trim_partitions

    stats = trim_partitions(table_dir, horizon, archive_dir)
    print(json.dumps(stats))
    return 0


def cmd_compact(table_dir: str, target_mb: str = "128") -> int:
    from eventstream_spark.streaming.control import compact_table

    spark = get_spark(app_name="admin-compact")
    stats = compact_table(spark, table_dir, int(target_mb) << 20)
    print(json.dumps(stats))
    return 0


def cmd_run_batch(config_path: str, sf_dir: str) -> int:
    from eventstream_spark.plans.routes import run_batch

    cfg = EngineConfig.from_json_file(config_path)
    spark = get_spark(app_name="admin-run-batch")
    counts = run_batch(spark, cfg, sf_dir)
    print(json.dumps(counts))
    return 0


def cmd_tail(table_dir: str, n: str = "15") -> int:
    from eventstream_spark.sources import read_tail

    spark = get_spark(app_name="admin-tail")
    df = spark.read.parquet(table_dir)
    ts_col = "ts" if "ts" in df.columns else df.columns[0]
    for row in read_tail(df, int(n), ts_col=ts_col, id_col=None).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_length(table_dir: str) -> int:
    spark = get_spark(app_name="admin-length")
    print(spark.read.parquet(table_dir).count())
    return 0


def cmd_close_local(
    config_path: str,
    source_dir: str,
    app: str | None = None,
    inst: str | None = None,
) -> int:
    """A11+A14 composed through data (reference close_local.py:112-146):
    start the config's per-route streams over ``source_dir``, publish a
    ``get_instance`` request into the stream, poll the responding route's
    parquet sink for the correlated ``get_instance_response``, and stop the
    matched queries via the manager. The first parquet-sink route whose
    events include ``get_instance`` is taken as the responder."""
    from eventstream_spark.catalog import EVENTS_RAW_SCHEMA
    from eventstream_spark.plans.routes import start_streaming_per_route
    from eventstream_spark.streaming import QueryManager, close_local

    cfg = EngineConfig.from_json_file(config_path)
    bus = cfg.busses[0]
    responder = next(
        r for r in bus.routes if "get_instance" in r.events and r.sink.kind == "parquet"
    )
    spark = get_spark(app_name="admin-close-local")
    manager = QueryManager(spark)
    ckpt_root = source_dir.rstrip("/") + ".close_local_ckpt"
    start_streaming_per_route(
        spark, cfg, bus, source_dir, EVENTS_RAW_SCHEMA, ckpt_root,
        manager=manager, available_now=False,
    )
    try:
        result = close_local(
            spark, manager, source_dir, responder.sink.target,
            application_name=app, application_instance=inst,
        )
    finally:
        manager.stop_all()
    print(json.dumps(result))
    return 0 if result["closed"] else 1


def cmd_schema(out_path: str | None = None) -> int:
    """Reference generate_schema.py:71-92 (EventBusConfigurations.schema()
    → schema.json or stdout with --pipe): export the EngineConfig JSON
    Schema. No Spark session needed."""
    from eventstream_spark.plans.config import config_json_schema

    payload = json.dumps(config_json_schema(), indent=4)
    if out_path is None:
        print(payload)
    else:
        with open(out_path, "w") as f:
            f.write(payload + "\n")
        print(f"An updated schema was written to:\n{os.path.abspath(out_path)}")
    return 0


def cmd_clear_groups(checkpoint_root: str, idle_min: str) -> int:
    """Standalone orphan sweep: a fresh admin process has no registered
    queries, so every checkpoint dir under the root idle past the
    threshold is a dead run's state (reference clear_groups.py:85-128)."""
    from eventstream_spark.streaming import QueryManager

    spark = get_spark(app_name="admin-clear-groups")
    manager = QueryManager(spark)
    stats = manager.clear_idle(
        idle_seconds=float(idle_min) * 60, checkpoint_root=checkpoint_root
    )
    print(json.dumps(stats))
    return 0


COMMANDS = {
    "validate": cmd_validate,
    "schema": cmd_schema,
    "clear-groups": cmd_clear_groups,
    "close-local": cmd_close_local,
    "trim-partitions": cmd_trim_partitions,
    "trim": cmd_trim,
    "compact": cmd_compact,
    "run-batch": cmd_run_batch,
    "tail": cmd_tail,
    "length": cmd_length,
}


def main(argv: list[str]) -> int:
    if not argv or argv[0] not in COMMANDS:
        print(__doc__)
        return 2
    return COMMANDS[argv[0]](*argv[1:])


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
