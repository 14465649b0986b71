"""Pins the YARA acceptance-survey outcomes (jobs/yara_survey.py over
signatures/corpus_survey/): every rule named SUSP_* must be accepted,
every REJ_*/PRIV_* rule must be rejected with a CLASSIFIED reason (no
'other' bucket), and the headline numbers quoted in COVERAGE.md must
match. A drift in either direction — a new rejection of a supported
shape, or a silent acceptance of a construct the engine cannot evaluate
faithfully — fails here."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _survey():
    spec = importlib.util.spec_from_file_location(
        "yara_survey", REPO / "jobs" / "yara_survey.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["yara_survey"] = mod
    spec.loader.exec_module(mod)
    return mod.survey()


def test_survey_outcomes_follow_rule_names():
    result = _survey()
    for o in result["outcomes"]:
        if o["rule"].startswith("SUSP_"):
            assert o["outcome"] == "accepted", o
        if o["rule"].startswith(("REJ_", "PRIV_")):
            assert o["outcome"] == "rejected", o
            assert o["reason"] != "other", (
                "unclassified rejection reason: " + repr(o)
            )


def test_survey_headline_numbers():
    result = _survey()
    # the numbers quoted in COVERAGE.md §yara-survey (round 6: 0-of,
    # overlapping counts, private rules/strings, lookbehind-prefix +
    # backref-class transpiles, and the lifted RE2 window cap moved 7
    # rules from rejected to accepted: 40/55 -> 47/55; percent-of and
    # the 'none of' keyword add two more accepted rows: 49/57)
    assert result["total"] == 57
    assert result["accepted"] == 49
    assert result["rejected"] == 8
    assert result["accepted_udf_only"] == 1  # @[i] rule
    udf_only = [
        o["rule"]
        for o in result["outcomes"]
        if o.get("backends") == "udf-only"
    ]
    assert udf_only == ["SUSP_Nth_Occurrence_Offset"]


def test_survey_covers_each_rejection_family_once_or_more():
    result = _survey()
    hist = result["rejection_histogram"]
    for family in (
        "byte >= 0x80 / NUL (text-column model)",
        "hex jump in alternation",
        "yara module (pe/elf/... dotted access)",
        "for-loop / iterators",
        "legacy globals (entrypoint...)",
        "modifier combo (xor/base64 with nocase etc.)",
        "invalid base64 alphabet",
    ):
        assert hist.get(family, 0) >= 1, family
    # every remaining rejection is genuinely outside the data model or
    # forbidden by yara-x itself — none of the round-6 unlocked families
    # may reappear
    for gone in (
        "'0 of' none-of semantics",
        "count/offset on self-overlapping literal",
        "private rule semantics",
        "regex outside shared dialect",
        "unknown string modifier",
    ):
        assert hist.get(gone, 0) == 0, gone
