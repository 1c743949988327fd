"""Admin CLI (A29): config validation paths, without a Spark session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADMIN = os.path.join(REPO, "scripts", "admin.py")
CONFIG = os.path.join(REPO, "examples", "bus_config.json")


def _run(args, env_extra=None):
    env = {**os.environ, **(env_extra or {})}
    return subprocess.run(
        [sys.executable, ADMIN, *args], capture_output=True, text=True, env=env
    )


def test_validate_ok_with_env():
    r = _run(["validate", CONFIG], {"SPARK_GRAFT_INSTANCE": "i-0"})
    assert r.returncode == 0 and "OK: 1 bus(ses), 2 route(s)" in r.stdout


def test_validate_fails_on_missing_env():
    env = {k: v for k, v in os.environ.items() if k != "SPARK_GRAFT_INSTANCE"}
    r = subprocess.run(
        [sys.executable, ADMIN, "validate", CONFIG], capture_output=True, text=True, env=env
    )
    assert r.returncode == 1 and "SPARK_GRAFT_INSTANCE" in r.stdout


def test_validate_aggregates_errors(tmp_path):
    bad = {
        "application_name": "a",
        "busses": [{"routes": [{"sink": {"kind": "bogus"}}]}],
    }
    path = tmp_path / "bad.json"
    path.write_text(json.dumps(bad))
    r = _run(["validate", str(path)])
    out = r.stdout
    assert r.returncode == 1
    for frag in ("application_instance", "source_table/source_path", "event: required", "bogus"):
        assert frag in out, out


def test_unknown_command_prints_usage():
    r = _run(["frobnicate"])
    assert r.returncode == 2 and "Ops CLI" in r.stdout


def test_close_local_cli_roundtrip(tmp_path):
    """close-local end to end in a fresh process: bring up the config's
    streams, publish get_instance, correlate the response, stop the match."""
    src = tmp_path / "master"
    src.mkdir()
    config = {
        "application_name": "workerA",
        "application_instance": "i-1",
        "busses": [
            {
                "name": "MASTER",
                "source_path": str(src),
                "routes": [
                    {
                        "name": "instance_info",
                        "event": "get_instance",
                        "transform": {
                            "module_name": "eventstream_spark.plans.transforms",
                            "name": "respond",
                        },
                        "kwargs": {
                            "application_name": "workerA",
                            "application_instance": "i-1",
                        },
                        "sink": {"kind": "parquet", "target": str(tmp_path / "resp")},
                    }
                ],
            }
        ],
    }
    path = tmp_path / "close_local.json"
    path.write_text(json.dumps(config))
    r = _run(["close-local", str(path), str(src), "workerA"], {"SPARK_GRAFT_CPUS": "4"})
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["targets"] == [["workerA", "i-1"]]
    assert out["closed"] == ["MASTER:instance_info"]


def test_trim_partitions_cli(tmp_path):
    """trim-partitions is pure directory manipulation — no Spark session."""
    table = tmp_path / "t"
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        (table / f"date={d}").mkdir(parents=True)
        (table / f"date={d}" / "part-0.parquet").write_bytes(b"x")
    archive = tmp_path / "arch"
    r = _run(["trim-partitions", str(table), "2024-01-02", str(archive)])
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out == {"partitions_dropped": 1, "partitions_kept": 2}
    assert (archive / "date=2024-01-01" / "part-0.parquet").exists()
    assert not (table / "date=2024-01-01").exists()


def test_schema_export_stdout_and_file(tmp_path):
    """Reference generate_schema.py parity: schema to stdout or a file."""
    r = _run(["schema"])
    assert r.returncode == 0
    schema = json.loads(r.stdout)
    assert schema["title"] == "EngineConfig"
    assert schema["required"] == ["application_name", "application_instance"]
    # Secrets are write-only: tooling may accept, must never echo.
    conn = schema["$defs"]["connection"]["properties"]
    assert conn["password"]["writeOnly"] is True
    assert conn["ssl_key_password"]["writeOnly"] is True

    out = tmp_path / "schema.json"
    r2 = _run(["schema", str(out)])
    assert r2.returncode == 0 and str(out) in r2.stdout
    assert json.loads(out.read_text()) == schema
