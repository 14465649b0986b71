"""S10 HTML report rendering: severity totals, per-host table, findings
ordered score-descending (src/loki_util/html_report.rs:330-411, :393-397),
HTML-escaped fields."""

from __future__ import annotations

import json
import re

from loki_rs_spark.sources.html_report import (
    render_html_report,
    write_html_report,
)


def _event(hostname, level, score, target, message="Turn Match", reasons=None):
    ev = {
        "timestamp": "2026-01-05T10:11:12+00:00",
        "level": level,
        "event_type": "turn_match",
        "hostname": hostname,
        "message": message,
        "file_path": target,
        "score": float(score),
    }
    if reasons is not None:
        ev["reasons"] = [
            {"message": m, "score": s, "description": "d"} for m, s in reasons
        ]
    return json.dumps(ev)


def _write_fixture(tmp_path):
    host_a = tmp_path / "host-a.jsonl"
    host_a.write_text(
        "\n".join(
            [
                _event(
                    "host-a",
                    "ALERT",
                    95,
                    "/tmp/mimikatz.exe",
                    reasons=[
                        ("YARA match with rule Mimi_1", 80),
                        ("HASH match with IOC HASH: abc", 100),
                    ],
                ),
                _event(
                    "host-a",
                    "WARNING",
                    70,
                    "/tmp/nc.exe",
                    reasons=[("YARA match with rule NC_Tool", 60)],
                ),
                _event("host-a", "NOTICE", 45, "<script>alert(1)</script>"),
                json.dumps(
                    {
                        "timestamp": "t",
                        "level": "INFO",
                        "event_type": "scan_start",
                        "hostname": "host-a",
                        "message": "start",
                    }
                ),
            ]
        )
    )
    host_b = tmp_path / "host-b.jsonl"
    host_b.write_text(
        "\n".join(
            [
                _event("host-b", "ALERT", 99, "/opt/evil.bin"),
                _event("host-b", "ALERT", 88, "/opt/bad.bin"),
            ]
        )
    )
    return [str(host_a), str(host_b)]


def test_html_report_structure(spark, tmp_path):
    paths = _write_fixture(tmp_path)
    out = render_html_report(spark, paths, top_n=10)

    # severity totals: 3 ALERT, 1 WARNING, 1 NOTICE (scan_start excluded)
    assert '<td class="sev-ALERT">ALERT</td><td>3</td>' in out
    assert '<td class="sev-WARNING">WARNING</td><td>1</td>' in out
    assert '<td class="sev-NOTICE">NOTICE</td><td>1</td>' in out

    # per-host rows (hostname-sorted): host-a 1/1/1, host-b 2/0/0
    assert "<tr><td>host-a</td><td>1</td><td>1</td><td>1</td><td>3</td></tr>" in out
    assert "<tr><td>host-b</td><td>2</td><td>0</td><td>0</td><td>2</td></tr>" in out

    # findings ordered score-descending (html_report.rs:393-397)
    scores = [
        float(m)
        for m in re.findall(r'<td class="finding-score">([\d.]+)</td>', out)
    ]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] == 99.0

    # injected HTML is escaped, never raw
    assert "<script>" not in out
    assert "&lt;script&gt;" in out

    # score bands aligned with the 80/60/40 severity thresholds:
    # 99,95,88 -> 80+; 70 -> 60-79; 45 -> 40-59
    assert "<tr><td>80+</td><td>3</td></tr>" in out
    assert "<tr><td>60-79</td><td>1</td></tr>" in out
    assert "<tr><td>40-59</td><td>1</td></tr>" in out
    assert "<tr><td>&lt;40</td><td>0</td></tr>" in out or (
        "<tr><td><40</td><td>0</td></tr>" in out
    )

    # reason breakdown: 2 YARA reasons (2 distinct rules, max 80),
    # 1 hash reason (max 100); ordered by count desc
    assert "<tr><td>YARA rule</td><td>2</td><td>2</td><td>80</td></tr>" in out
    assert "<tr><td>Hash IOC</td><td>1</td><td>1</td><td>100</td></tr>" in out
    assert out.index("YARA rule</td>") < out.index("Hash IOC</td>")


def test_html_report_without_reasons_column(spark, tmp_path):
    """Streams written without reason detail (schema-on-read: the column
    simply doesn't exist) still render, with a placeholder row."""
    p = tmp_path / "plain.jsonl"
    p.write_text(_event("host-x", "ALERT", 90, "/tmp/x"))
    out = render_html_report(spark, [str(p)], top_n=5)
    assert "no reason detail in stream" in out
    assert "<tr><td>80+</td><td>1</td></tr>" in out


def test_html_report_null_reasons_column(spark, tmp_path):
    """A stream where `reasons` is present but always null infers as
    StringType under schema-on-read; the breakdown must degrade to the
    placeholder instead of raising AnalysisException from the explode."""
    import json

    p = tmp_path / "nullreasons.jsonl"
    rec = json.loads(_event("host-n", "ALERT", 85, "/tmp/n"))
    rec["reasons"] = None
    p.write_text(json.dumps(rec) + "\n")
    out = render_html_report(spark, [str(p)], top_n=5)
    assert "no reason detail in stream" in out
    assert "<tr><td>80+</td><td>1</td></tr>" in out


def test_html_report_scalar_reasons_column(spark, tmp_path):
    """Scalar (string) `reasons` — e.g. a foreign producer writing a
    joined string — must also hit the guard, not the explode."""
    import json

    p = tmp_path / "scalarreasons.jsonl"
    rec = json.loads(_event("host-s", "WARNING", 62, "/tmp/s"))
    rec["reasons"] = "YARA match on rule X"
    p.write_text(json.dumps(rec) + "\n")
    out = render_html_report(spark, [str(p)], top_n=5)
    assert "no reason detail in stream" in out


def test_html_report_top_n_and_write(spark, tmp_path):
    paths = _write_fixture(tmp_path)
    out_file = tmp_path / "report.html"
    write_html_report(spark, paths, str(out_file), top_n=2)
    text = out_file.read_text()
    # only the 2 highest-score findings rendered
    assert len(re.findall(r'<td class="finding-score">', text)) == 2
    assert "99" in text and "95" in text and "/tmp/nc.exe" not in text
