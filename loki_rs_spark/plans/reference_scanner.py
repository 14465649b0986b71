"""A tiny row-at-a-time pure-Python scanner mirroring the reference's
per-row pipeline EXACTLY (src/modules/filesystem_scan.rs:791-979). This is
the test oracle for routed-row equality (SURVEY.md §5c): it shares NOTHING
with the Spark plan except the parsed SignatureSet, so agreement between the
two is meaningful.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from ..config import DEFAULT_CONFIG, ScanConfig
from ..functions.score import round_half_away, weighted_score
from ..operators.ioc_join import HOST_PATTERN
from ..operators.matcher import format_matched_data
from ..signatures.model import SignatureSet


@dataclass
class Reason:
    message: str
    score: int
    description: str | None = None
    author: str | None = None
    reference: str | None = None
    matched_strings: list[str] | None = None


@dataclass
class RoutedRow:
    conv_id: str
    turn_idx: int
    level: str
    score: int
    md5: str
    sha1: str
    sha256: str
    n_reasons: int
    reasons: list[Reason] = field(default_factory=list)


def _is_ipv4(addr: str) -> bool:
    parts = addr.split(".")
    if len(parts) != 4:
        return False
    try:
        return all(0 <= int(p) <= 255 for p in parts)
    except ValueError:
        return False


_HOST_RE = re.compile(HOST_PATTERN)


def scan_turn(
    conv_id: str,
    turn_idx: int,
    text: str,
    tool: str,
    sigs: SignatureSet,
    cfg: ScanConfig = DEFAULT_CONFIG,
) -> RoutedRow | None:
    """Returns the routed row, or None if the turn is excluded / FP /
    unmatched / below the notice threshold."""
    for pattern in cfg.exclude_patterns:
        if re.search(pattern, tool):
            return None
    if len(text) > cfg.max_text_chars:
        return None

    reasons: list[Reason] = []

    def push(reason: Reason) -> None:
        if len(reasons) < cfg.max_matches:
            reasons.append(reason)

    # 1. filename IOCs (path_display and filename are both `tool` here)
    for ioc in sigs.filename_iocs:
        if re.search(ioc.pattern, tool):
            if ioc.fp_pattern and re.search(ioc.fp_pattern, tool):
                continue
            push(
                Reason(
                    f"File Name IOC matched PATTERN: {ioc.pattern}",
                    ioc.score,
                    ioc.description,
                )
            )

    # 2. hashes + FP short-circuit + hash IOCs
    raw = text.encode("utf-8")
    digests = {
        "md5": hashlib.md5(raw).hexdigest(),
        "sha1": hashlib.sha1(raw).hexdigest(),
        "sha256": hashlib.sha256(raw).hexdigest(),
    }
    fp_values = {h.hash_value for h in sigs.fp_hashes}
    if any(d in fp_values for d in digests.values()):
        return None
    for hash_type in ("md5", "sha1", "sha256"):
        for ioc in sigs.hashes_of_type(hash_type):
            if ioc.hash_value == digests[hash_type]:
                push(
                    Reason(
                        f"HASH match with IOC HASH: {ioc.hash_value}",
                        ioc.score,
                        ioc.description,
                    )
                )
                break  # at most one match per hash type

    # 3. YARA subset, rules in definition order
    for rule in sigs.yara_rules:
        per_string: list[tuple[str, list[re.Match]]] = []
        fired = 0
        for s in rule.strings:
            flags = re.IGNORECASE if s.nocase else 0
            rx = re.compile(s.pattern if s.is_regex else re.escape(s.pattern), flags)
            matches = list(rx.finditer(text))
            if matches:
                fired += 1
            per_string.append((s.identifier, matches))
        needed = (
            1
            if rule.condition == "any"
            else len(rule.strings)
            if rule.condition == "all"
            else int(rule.condition)
        )
        if fired >= needed:
            matched_strings = [
                f"{ident}: {format_matched_data(m.group(0))} @ {m.start()}"
                for ident, matches in per_string
                for m in matches
            ]
            push(
                Reason(
                    f"YARA match with rule {rule.name}",
                    rule.score,
                    rule.description or None,
                    rule.author or None,
                    rule.reference or None,
                    matched_strings or None,
                )
            )

    # 4. C2 IOCs over extracted hosts, first matching IOC per host
    for host in _HOST_RE.findall(text.lower()):
        for ioc in sigs.c2_iocs:
            if _is_ipv4(host):
                hit = host == ioc.server
            else:
                hit = host.endswith(ioc.server) or host == ioc.server
            if hit:
                push(
                    Reason(
                        f"C2 IOC match in turn text HOST: {host}",
                        ioc.score,
                        ioc.description,
                    )
                )
                break

    if not reasons:
        return None

    total = round_half_away(weighted_score([r.score for r in reasons]))
    if total >= cfg.alert_threshold:
        level = "ALERT"
    elif total >= cfg.warning_threshold:
        level = "WARNING"
    elif total >= cfg.notice_threshold:
        level = "NOTICE"
    else:
        return None

    return RoutedRow(
        conv_id=conv_id,
        turn_idx=turn_idx,
        level=level,
        score=total,
        md5=digests["md5"],
        sha1=digests["sha1"],
        sha256=digests["sha256"],
        n_reasons=len(reasons),
        reasons=reasons[: cfg.max_reasons],
    )
