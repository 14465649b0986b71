"""S7 remote syslog sink: real UDP socket write, reference line format
(src/helpers/unified_logger.rs:455-607)."""

from __future__ import annotations

import re
import socket
import threading

from pyspark.sql import functions as F

from loki_rs_spark.config import ScanConfig
from loki_rs_spark.plans.pipeline import scan_transcripts
from loki_rs_spark.sources.syslog import routed_to_syslog_lines, write_syslog

CFG = ScanConfig(exclude_patterns=())

LINE_RE = re.compile(
    r"^<(\d+)>[A-Z][a-z]{2} \d{2} \d{2}:\d{2}:\d{2} test-host "
    r"Loki-RS: Loki-RS Match: (.+) Score: (\d+\.\d+)$"
)


def _routed(spark, sigs):
    df = spark.createDataFrame(
        [
            ("c0", 0, "user", "EICAR-TEST-PAYLOAD-ALPHA", "tool-1"),
            ("c0", 1, "user", "ran netcat -e /bin/sh now", "/tmp/nc.exe"),
            ("c0", 2, "user", "clean", "tool-2"),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2026-01-05 10:11:12").cast("timestamp"))
    return scan_transcripts(spark, df, sigs, CFG).routed


def test_syslog_udp_roundtrip(spark, sigs):
    received: list[bytes] = []
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(1)
    port = sock.getsockname()[1]
    stop = threading.Event()

    def recv_loop():
        while not stop.is_set():
            try:
                data, _ = sock.recvfrom(65535)
                received.append(data)
            except socket.timeout:
                continue  # keep listening until the test stops us
            except OSError:
                return

    t = threading.Thread(target=recv_loop, daemon=True)
    t.start()
    routed = _routed(spark, sigs)
    n_routed = routed.count()
    assert n_routed >= 2
    write_syslog(
        routed_to_syslog_lines(routed, hostname="test-host"),
        host="127.0.0.1",
        port=port,
    )
    import time

    deadline = time.time() + 30
    while len(received) < n_routed and time.time() < deadline:
        time.sleep(0.1)
    stop.set()
    t.join(timeout=3)
    sock.close()

    assert len(received) == n_routed
    lines = sorted(d.decode("utf-8") for d in received)
    for line in lines:
        m = LINE_RE.match(line)
        assert m, line
        pri = int(m.group(1))
        # facility 1 (user) * 8 + severity in {1 ALERT, 4 WARNING, 5 NOTICE}
        assert pri in (8 + 1, 8 + 4, 8 + 5), line
    # timestamp formatted %b %d %H:%M:%S from the turn ts
    assert all("Jan 05 10:11:12" in ln for ln in lines)


def test_remote_json_udp_roundtrip(spark, sigs):
    """RemoteFormat::Json analog (unified_logger.rs:505-510): the same
    structured JSONL events over the socket path — every datagram must be
    parseable JSON with the jsonl sink's event shape."""
    import json
    import time

    from loki_rs_spark.sources.syslog import (
        routed_to_remote_json_lines,
        write_syslog,
    )

    received: list[bytes] = []
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(1)
    port = sock.getsockname()[1]
    stop = threading.Event()

    def recv_loop():
        while not stop.is_set():
            try:
                data, _ = sock.recvfrom(65535)
                received.append(data)
            except socket.timeout:
                continue
            except OSError:
                return

    t = threading.Thread(target=recv_loop, daemon=True)
    t.start()
    routed = _routed(spark, sigs)
    n_routed = routed.count()
    write_syslog(
        routed_to_remote_json_lines(routed, hostname="test-host"),
        host="127.0.0.1",
        port=port,
    )
    deadline = time.time() + 30
    while len(received) < n_routed and time.time() < deadline:
        time.sleep(0.1)
    stop.set()
    t.join(timeout=3)
    sock.close()

    assert len(received) == n_routed
    events = [json.loads(d.decode("utf-8")) for d in received]
    for ev in events:
        assert ev["hostname"] == "test-host"
        assert ev["event_type"] == "turn_match"
        assert ev["level"] in ("ALERT", "WARNING", "NOTICE")
        assert isinstance(ev["score"], float)  # LogEvent score is double
        assert ev["file_path"]  # tool plays the path role
