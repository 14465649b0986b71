"""Signature-corpus scale sanity: the real Loki signature-base carries
thousands of rules (hash IOCs ~hundreds of thousands). Verify the engine
stays correct (vs the reference scanner) and functional with a synthetic
corpus 100x the demo size: 5,000 hash IOCs, 300 filename IOCs, 150 YARA
rules, 100 C2 IOCs. This exercises the broadcast path, the per-executor
compile cache, and the candidate-gate construction at realistic width."""

from __future__ import annotations

import hashlib

import pytest

from loki_rs_spark.config import ScanConfig
from loki_rs_spark.plans.pipeline import scan_transcripts
from loki_rs_spark.plans.reference_scanner import scan_turn
from loki_rs_spark.signatures.model import (
    C2IOC,
    FilenameIOC,
    HashIOC,
    SignatureSet,
    YaraRule,
    YaraString,
)
from loki_rs_spark.sources.transcripts import load_transcripts

from .conftest import SF_SMALL

CFG = ScanConfig(exclude_patterns=())


@pytest.fixture(scope="module")
def big_sigs() -> SignatureSet:
    hash_iocs = []
    for i in range(5000):
        digest = hashlib.md5(f"synthetic-hash-{i}".encode()).hexdigest()
        hash_iocs.append(HashIOC(digest, "md5", 75, f"synthetic {i}"))
    # one hash IOC that actually fires: md5 of a planted payload
    hash_iocs.append(
        HashIOC(
            hashlib.md5(b"EICAR-TEST-PAYLOAD-ALPHA").hexdigest(),
            "md5",
            100,
            "alpha",
        )
    )
    filename_iocs = [
        FilenameIOC(f"synthetic_badtool_{i}\\.exe", 70, f"syn {i}", None)
        for i in range(299)
    ] + [FilenameIOC("mimikatz", 90, "real", None)]
    yara_rules = [
        YaraRule(
            f"Synthetic_Rule_{i}",
            75,
            "",
            "",
            "",
            (YaraString("$a", f"synthetic-trigger-string-{i}", False, False),),
            "any",
        )
        for i in range(149)
    ] + [
        YaraRule(
            "Netcat_Real",
            75,
            "",
            "",
            "",
            (
                YaraString("$a", "netcat", False, False),
                YaraString("$b", "-e /bin/sh", False, False),
            ),
            "all",
        )
    ]
    c2_iocs = [
        C2IOC(f"synthetic-c2-{i}.example.net", 75, "") for i in range(99)
    ] + [C2IOC("evil-c2.example.com", 95, "")]
    return SignatureSet(
        hash_iocs=tuple(sorted(hash_iocs, key=lambda h: h.hash_value)),
        filename_iocs=tuple(filename_iocs),
        yara_rules=tuple(yara_rules),
        c2_iocs=tuple(c2_iocs),
    )


def test_scale_corpus_correctness(spark, big_sigs):
    transcripts = load_transcripts(spark, SF_SMALL, rep=2).cache()
    result = scan_transcripts(spark, transcripts, big_sigs, CFG)
    actual = {
        (r["conv_id"], r["turn_idx"]): (
            r["level"],
            r["score"],
            tuple(x["message"] for x in r["reasons"]),
        )
        for r in result.routed.collect()
    }
    expected = {}
    for r in transcripts.collect():
        routed = scan_turn(
            r["conv_id"], r["turn_idx"], r["text"], r["tool"], big_sigs, CFG,
            role=r["role"],
        )
        if routed is not None:
            expected[(routed.conv_id, routed.turn_idx)] = (
                routed.level,
                routed.score,
                tuple(x.message for x in routed.reasons),
            )
    assert actual == expected
    assert len(actual) > 0
    # only the planted "real" signatures fire; no synthetic false positives
    fired = {m for v in actual.values() for m in v[2]}
    assert not any("synthetic" in m.lower() for m in fired)
