"""S7: remote syslog sink — the real socket writer.

The reference's RemoteOutput (src/helpers/unified_logger.rs:455-607) sends
BSD-style syslog lines over UDP/TCP:

    <PRI>%b %d %H:%M:%S HOSTNAME Loki-RS: MESSAGE

with PRI = facility(1, user-level) * 8 + severity (ALERT=1, ERROR=3,
WARNING=4, NOTICE=5, INFO=6, DEBUG=7), and for match events (empty
LogEvent.message) the reconstructed body
``Loki-RS Match: {target} Score: {score}``.

Spark-first: the line rendering is a pure Catalyst projection
(`routed_to_syslog_lines`); the socket write is a `foreachPartition`
sender — one UDP socket per partition, executor-side, no driver collect.
For streams, wrap in `foreachBatch` (`stream_to_syslog`). TCP follows the
reference's connect-send-close strategy.
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import syslog_pri_col

SYSLOG_FACILITY = 1  # user-level, as the reference's RemoteOutput


def routed_to_syslog_lines(
    routed: DataFrame, hostname: str = "spark"
) -> DataFrame:
    """One BSD syslog line per routed row (column `value`)."""
    pri = syslog_pri_col(F.col("level"), facility=SYSLOG_FACILITY)
    ts = F.date_format(F.col("ts"), "MMM dd HH:mm:ss")
    body = F.concat(
        F.lit("Loki-RS Match: "),
        F.col("tool"),
        F.lit(" Score: "),
        F.col("score").cast("double").cast("string"),
    )
    line = F.concat(
        F.lit("<"),
        pri.cast("string"),
        F.lit(">"),
        ts,
        F.lit(f" {hostname} Loki-RS: "),
        F.regexp_replace(body, "\n", " "),
    )
    return routed.select(line.alias("value"))


def routed_to_remote_json_lines(
    routed: DataFrame, hostname: str = "spark"
) -> DataFrame:
    """RemoteFormat::Json analog (src/helpers/unified_logger.rs:505-510):
    the reference's remote sink can ship the SAME structured event JSON it
    writes to loki.jsonl over the socket instead of syslog framing. Reuses
    the JSONL sink's event rendering, so socket and file sinks stay
    byte-identical per event."""
    from .jsonl import routed_to_jsonl_df

    return routed_to_jsonl_df(routed, hostname)


def write_syslog(
    lines: DataFrame,
    host: str = "127.0.0.1",
    port: int = 514,
    protocol: str = "udp",
) -> None:
    """Send each `value` line to the remote collector, executor-side.
    UDP: one datagram per line from a per-partition socket. TCP:
    connect-send-close per partition (the reference's robust-simple
    strategy for flaky remote ends)."""
    if protocol not in ("udp", "tcp"):
        raise ValueError(f"unknown syslog protocol {protocol!r}")

    def send_partition(rows) -> None:
        if protocol == "udp":
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            try:
                for row in rows:
                    sock.sendto(row["value"].encode("utf-8"), (host, port))
            finally:
                sock.close()
        else:
            rows = list(rows)
            if not rows:
                return
            sock = socket.create_connection((host, port), timeout=10)
            try:
                for row in rows:
                    sock.sendall(row["value"].encode("utf-8") + b"\n")
            finally:
                sock.close()

    lines.foreachPartition(send_partition)


def stream_to_syslog(
    routed_stream: DataFrame,
    checkpoint: str,
    hostname: str = "spark",
    host: str = "127.0.0.1",
    port: int = 514,
    protocol: str = "udp",
):
    """Structured-streaming variant: foreachBatch -> the same batch sink
    (exactly-once not claimed — syslog is fire-and-forget, matching the
    reference's UDP semantics)."""

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        write_syslog(
            routed_to_syslog_lines(batch_df, hostname), host, port, protocol
        )

    return (
        routed_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
