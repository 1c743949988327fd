"""Live Redis-Stream ingestion (A1 against a real socket): the RESP client
and the rediswire data source exercised end-to-end against an in-process
RESP2 server (tests/fake_redis.py) — no Redis binary needed."""

from __future__ import annotations

import pytest

from eventstream_spark.sources.redis_stream import (
    RedisStreamClient,
    RespError,
    register_rediswire,
)

from fake_redis import FakeRedisServer


def _fill(client, n=3):
    ids = []
    for i in range(n):
        ids.append(client.xadd("EVENTS", {"event": "click", "value": str(i)}))
    return ids


def test_client_stream_verbs_roundtrip():
    with FakeRedisServer() as server, RedisStreamClient("127.0.0.1", server.port) as c:
        assert c.ping() == "PONG"
        ids = _fill(c)
        assert c.xlen("EVENTS") == 3
        got = c.xrange("EVENTS")
        assert [e[0] for e in got] == ids
        assert got[0][1] == {"event": "click", "value": "0"}
        # exclusive start: everything after the first entry
        after = c.xrange("EVENTS", f"({ids[0]}")
        assert [e[0] for e in after] == ids[1:]
        assert c.last_id("EVENTS") == ids[-1]
        # explicit IDs are honored and monotonic with generated ones
        fixed = c.xadd("EVENTS", {"event": "purchase"}, entry_id="99999999999999-5")
        assert fixed == "99999999999999-5"
        assert c.last_id("EVENTS") == fixed


def test_client_auth_required():
    with FakeRedisServer(password="sesame") as server:
        with RedisStreamClient("127.0.0.1", server.port, password="sesame") as c:
            assert c.ping() == "PONG"
        bad = RedisStreamClient("127.0.0.1", server.port)
        with pytest.raises(RespError):
            bad.ping()
        bad.close()


def test_client_consumer_group_at_least_once():
    """Reference parity for the group verbs (XREADGROUP delivery + XACK),
    kept for admin flows even though the Spark source reads by ID range."""
    with FakeRedisServer() as server, RedisStreamClient("127.0.0.1", server.port) as c:
        ids = _fill(c)
        assert c.xgroup_create("EVENTS", "g1", start_id="0") == "OK"
        got = c.xreadgroup("g1", "worker-1", "EVENTS")
        assert [e[0] for e in got] == ids
        assert c.xreadgroup("g1", "worker-1", "EVENTS") == []  # cursor advanced
        assert c.xack("EVENTS", "g1", *ids) == 3
        assert c.xack("EVENTS", "g1", ids[0]) == 0  # already acked


def test_batch_read_matches_stream_contents(spark):
    with FakeRedisServer() as server:
        with RedisStreamClient("127.0.0.1", server.port) as c:
            ids = _fill(c, n=5)
        register_rediswire(spark)
        df = (
            spark.read.format("rediswire")
            .option("host", "127.0.0.1")
            .option("port", str(server.port))
            .option("stream", "EVENTS")
            .load()
        )
        rows = df.orderBy("message_id").collect()
        assert [r.message_id for r in rows] == sorted(ids)
        assert rows[0].fields == {"event": "click", "value": "0"}
        # event time = ID millis prefix (reference get_message_date)
        millis = int(ids[0].split("-")[0])
        assert int(rows[0].ts.timestamp() * 1000) == millis


def test_stream_read_is_incremental_and_replay_safe(spark, tmp_path):
    """Micro-batches advance by stream ID; a checkpoint restart re-reads
    nothing (exactly-once into an idempotent sink) and picks up new rows."""
    with FakeRedisServer() as server:
        client = RedisStreamClient("127.0.0.1", server.port)
        _fill(client, n=3)
        register_rediswire(spark)
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def run_once():
            q = (
                spark.readStream.format("rediswire")
                .option("host", "127.0.0.1")
                .option("port", str(server.port))
                .option("stream", "EVENTS")
                .load()
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        assert spark.read.parquet(out_dir).count() == 3
        # New entries after the checkpointed offset arrive incrementally...
        client.xadd("EVENTS", {"event": "purchase", "value": "9"})
        run_once()
        got = spark.read.parquet(out_dir)
        assert got.count() == 4
        # ...and nothing was double-read across restarts.
        assert got.select("message_id").distinct().count() == 4
        client.close()


def test_rediswire_rows_compose_into_envelopes(spark):
    """The full ingestion composition: live stream -> wire rows ->
    canonical envelope -> response derivation (A1 -> SURVEY §1 -> A8)."""
    from eventstream_spark.codec import create_response, stream_entry_to_envelope

    with FakeRedisServer() as server:
        with RedisStreamClient("127.0.0.1", server.port) as c:
            c.xadd(
                "EVENTS",
                {"event": "get_instance", "application_name": "w", "k": "7"},
            )
        register_rediswire(spark)
        df = (
            spark.read.format("rediswire")
            .option("host", "127.0.0.1")
            .option("port", str(server.port))
            .option("stream", "EVENTS")
            .load()
        )
        env = stream_entry_to_envelope(df)
        row = env.first()
        assert row.event == "get_instance" and row.application_name == "w"
        assert row.props == {"k": "7"}  # envelope keys lifted OUT of props
        assert row.message_id is not None and row.ts is not None
        resp = create_response(env, "responder", "i-9").first()
        assert resp.event == "get_instance_response"
        assert resp.response_to == row.message_id
