"""Signature ("dimension table") model.

Mirrors the reference's in-memory signature collections (SURVEY.md §1.2):
HashIOC (src/main.rs:218-233), FilenameIOC (src/main.rs:245-252),
C2IOC (src/main.rs:254-259), and a declarative subset of YARA rules
(src/main.rs:780-872 compiles full yara-x; we model the string/regex +
any/all-of subset the bundled corpus uses).

Everything is a plain picklable dataclass so a SignatureSet can be broadcast
to executors once and compiled into a per-executor cached matcher.
"""

from __future__ import annotations

import hashlib
import pickle
from dataclasses import dataclass


@dataclass(frozen=True)
class HashIOC:
    hash_value: str  # lowercased hex
    hash_type: str  # 'md5' | 'sha1' | 'sha256'
    score: int
    description: str


@dataclass(frozen=True)
class FilenameIOC:
    pattern: str  # regex, case-sensitive (reference compiles verbatim)
    score: int
    description: str
    fp_pattern: str | None = None  # suppresses the match when it also matches


@dataclass(frozen=True)
class C2IOC:
    server: str  # lowercased; IPv4 => exact match, else suffix match
    score: int
    description: str


@dataclass(frozen=True)
class YaraString:
    identifier: str  # includes the leading '$'
    pattern: str  # literal text, regex body, or hex-string body
    is_regex: bool = False
    nocase: bool = False
    fullword: bool = False  # not adjacent to [0-9A-Za-z]
    wide: bool = False  # UTF-16LE interleave form
    ascii_form: bool = True  # plain form included (False for bare `wide`)
    is_hex: bool = False  # pattern is a { .. } hex-string body
    # xor modifier: match any single-byte XOR of the literal with a key in
    # [xor_min, xor_max] (yara `xor` = 0x00-0xff; `xor(0x01-0xff)` etc.)
    xor_min: int | None = None
    xor_max: int | None = None
    # base64 modifiers: match the three base64 alignments of the literal
    # (and/or their UTF-16LE-interleaved forms for base64wide)
    base64_mod: bool = False
    base64wide: bool = False
    # yara base64("...64 chars...") custom alphabet (None = standard);
    # applies to base64 and base64wide alike, as in yara
    base64_alphabet: str | None = None
    # yara `private` string modifier: the string matches and feeds the
    # condition normally, but its occurrences are SUPPRESSED from the
    # reported matched_strings (yara-x hides private strings from output)
    private: bool = False
    # lookbehind-transpile metadata: '(?<=LITERAL)rest' is rewritten to
    # 'LITERALrest' for the shared Java∩RE2∩Python dialect, and reported
    # matches shift forward by len(LITERAL) chars (value drops the prefix,
    # offset adds it) so matched_strings equal yara's lookbehind match
    report_shift: int = 0


@dataclass(frozen=True)
class YaraRule:
    name: str
    score: int  # meta.score, default 75, valid iff 0 < s <= 100
    description: str
    author: str
    reference: str
    strings: tuple[YaraString, ...]
    condition: str  # raw condition text (see signatures/conditions.py
    #                 grammar); bare 'any'/'all'/N accepted as of-term sugar

    @property
    def condition_ast(self):
        from .conditions import parse_condition, resolve_percent_of

        # percentage quantifiers ('60% of them') resolve to integer
        # thresholds HERE, where the string table is in scope — every
        # backend downstream sees a plain N-of node
        return resolve_percent_of(
            parse_condition(self.condition),
            [s.identifier for s in self.strings],
        )


@dataclass(frozen=True)
class SignatureSet:
    hash_iocs: tuple[HashIOC, ...] = ()
    fp_hashes: tuple[HashIOC, ...] = ()
    filename_iocs: tuple[FilenameIOC, ...] = ()
    c2_iocs: tuple[C2IOC, ...] = ()
    yara_rules: tuple[YaraRule, ...] = ()

    def hashes_of_type(self, hash_type: str, fp: bool = False) -> list[HashIOC]:
        src = self.fp_hashes if fp else self.hash_iocs
        return [h for h in src if h.hash_type == hash_type]

    def to_payload(self) -> bytes:
        return pickle.dumps(self)

    @staticmethod
    def from_payload(payload: bytes) -> "SignatureSet":
        return pickle.loads(payload)

    @property
    def fingerprint(self) -> str:
        return hashlib.sha256(self.to_payload()).hexdigest()[:16]
