"""Scalar text/format utilities (SURVEY.md §2.3 P7-P10, §2.1 S7).

Each mirrors a reference helper exactly; Column variants are pure
Catalyst expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

ANSI_RE = r"\x1b\[[0-9;]*m"


def ansi_strip(value: str) -> str:
    """P9: strip ANSI color sequences before serialization
    (src/helpers/unified_logger.rs:312-329)."""
    return re.sub(ANSI_RE, "", value)


def ansi_strip_col(col: Column) -> Column:
    return F.regexp_replace(col, ANSI_RE, "")


def format_runtime(total_secs: int) -> str:
    """P7: secs -> '{d}d:{h}h:{m}m:{s}s'
    (src/modules/process_check.rs:909-915)."""
    days, rem = divmod(int(total_secs), 86400)
    hours, rem = divmod(rem, 3600)
    mins, secs = divmod(rem, 60)
    return f"{days}d:{hours}h:{mins}m:{secs}s"


def format_runtime_col(col: Column) -> Column:
    days = (col / 86400).cast("long")
    hours = ((col % 86400) / 3600).cast("long")
    mins = ((col % 3600) / 60).cast("long")
    secs = (col % 60).cast("long")
    return F.format_string("%dd:%dh:%dm:%ds", days, hours, mins, secs)


def truncate_cmdline(cmdline: str, limit: int = 100) -> str:
    """P8: >limit chars -> first (limit-3) + '...' (char-aware,
    src/modules/process_check.rs:264-268)."""
    if len(cmdline) > limit:
        return cmdline[: limit - 3] + "..."
    return cmdline


def truncate_cmdline_col(col: Column, limit: int = 100) -> Column:
    return F.when(
        F.length(col) > limit,
        F.concat(F.substring(col, 1, limit - 3), F.lit("...")),
    ).otherwise(col)


_SIZE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(KB|MB|GB|B)?\s*$", re.IGNORECASE)
_SIZE_MULT = {"B": 1, "KB": 1024, "MB": 1024**2, "GB": 1024**3}


def parse_size(text: str) -> int:
    """P10: '10MB' -> bytes, 1024-based (src/helpers/helpers.rs:158-184)."""
    m = _SIZE_RE.match(text)
    if not m:
        raise ValueError(f"unparseable size: {text!r}")
    value = float(m.group(1))
    unit = (m.group(2) or "B").upper()
    return int(value * _SIZE_MULT[unit])


# S7: severity -> RFC-3164 PRI. The reference's remote sink uses
# facility 1 'user' (src/helpers/unified_logger.rs:512-520);
# sources/syslog.py passes that, the default here stays configurable.
_SEVERITY_NUM = {
    "ALERT": 1,
    "ERROR": 3,
    "WARNING": 4,
    "NOTICE": 5,
    "INFO": 6,
    "DEBUG": 7,
}


def syslog_pri(level: str, facility: int = 1) -> int:
    """Default facility 1 (user-level) matches the reference's
    unified_logger.rs:521-522."""
    return facility * 8 + _SEVERITY_NUM.get(level.upper(), 6)


def syslog_pri_col(level: Column, facility: int = 1) -> Column:
    expr = F.lit(6)
    for name, num in _SEVERITY_NUM.items():
        expr = F.when(F.upper(level) == name, F.lit(num)).otherwise(expr)
    return (F.lit(facility * 8) + expr).cast("int")


def plaintext_match_line(routed_row) -> str:
    """S6: the plaintext sink's match rendering
    'Match: {target} SCORE: {s} REASONS: [...]'
    (src/helpers/unified_logger.rs:331-406)."""
    reasons = "; ".join(
        f"{r['message']} (score: {r['score']})" for r in routed_row["reasons"]
    )
    return (
        f"Match: {routed_row['tool']} SCORE: {routed_row['score']} "
        f"REASONS: [{reasons}]"
    )


def plaintext_match_line_col(tool: Column, score: Column, reasons: Column) -> Column:
    rendered = F.array_join(
        F.transform(
            reasons,
            lambda r: F.concat(
                r["message"],
                F.lit(" (score: "),
                r["score"].cast("string"),
                F.lit(")"),
            ),
        ),
        "; ",
    )
    return F.concat(
        F.lit("Match: "),
        tool,
        F.lit(" SCORE: "),
        score.cast("string"),
        F.lit(" REASONS: ["),
        rendered,
        F.lit("]"),
    )
