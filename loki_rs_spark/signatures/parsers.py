"""Parsers for the reference's signature file dialects.

Semantics mirrored line-by-line from the reference loaders:

* hash IOCs        — src/main.rs:270-355   (';' CSV, 2/3 columns, type by
                     hash length 32/40/64, score valid iff 0 < s <= 100
                     else default 75, non-numeric score column => 2-column
                     form with that column as description)
* FP hashes        — src/main.rs:357-453   (same format; loaded from every
                     file whose name contains both "hash" and
                     "falsepositive"; score unused)
* filename IOCs    — src/main.rs:653-771   (pattern[;score[;fp_regex]],
                     preceding '# ...' line becomes the description,
                     invalid main regex => skip, invalid fp regex => None)
* C2 IOCs          — src/main.rs:503-610   (server[;score], loaded from
                     every file whose name contains "c2", preceding '#'
                     comment = description reset per file, entries < 4
                     chars dropped, lowercased)
* YARA subset      — src/main.rs:780-872 compiles full yara-x; here we
                     parse the declarative subset (string/regex patterns +
                     any/all/N-of-them conditions, meta score/description/
                     author/reference with the same score-validity window,
                     src/modules/filesystem_scan.rs:1044-1088).
"""

from __future__ import annotations

import re
from pathlib import Path

from .compile import validate_string
from .conditions import (
    YaraUnsupportedError,
    condition_uses_strings,
    parse_condition,
)
from .model import C2IOC, FilenameIOC, HashIOC, SignatureSet, YaraRule, YaraString

DEFAULT_SCORE = 75

_HASH_LEN_TO_TYPE = {32: "md5", 40: "sha1", 64: "sha256"}


def hash_type_of(value: str) -> str | None:
    """Hash type by length, as in src/main.rs:493-501."""
    if not re.fullmatch(r"[0-9a-fA-F]+", value or ""):
        return None
    return _HASH_LEN_TO_TYPE.get(len(value))


def _parse_score(raw: str) -> int | None:
    """Return the score if parseable, else None. Caller applies the
    (0, 100] validity window and the default-75 fallback."""
    try:
        return int(raw.strip())
    except ValueError:
        return None


def _valid_score(s: int) -> bool:
    return 0 < s <= 100


def parse_hash_iocs(text: str) -> list[HashIOC]:
    iocs: list[HashIOC] = []
    seen: set[str] = set()
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(";")
        hash_value = parts[0].strip().lower()
        if not hash_value:
            continue
        hash_type = hash_type_of(hash_value)
        if hash_type is None:
            continue
        if len(parts) >= 3:
            score = _parse_score(parts[1])
            if score is None:
                # non-numeric score column => treat as 2-column format
                score, description = DEFAULT_SCORE, parts[1].strip()
            elif _valid_score(score):
                description = parts[2].strip()
            else:
                score, description = DEFAULT_SCORE, parts[2].strip()
        elif len(parts) == 2:
            score, description = DEFAULT_SCORE, parts[1].strip()
        else:
            continue
        # Dedupe on hash_value, first entry wins: the reference's binary
        # search (src/main.rs:456-501) yields exactly one IOC per probe, so
        # a duplicated hash in an aggregated feed must not fan the broadcast
        # left join out into duplicate routed rows.
        if hash_value in seen:
            continue
        seen.add(hash_value)
        iocs.append(HashIOC(hash_value, hash_type, score, description))
    # reference sorts for binary search (src/main.rs:352); a Spark broadcast
    # hash join needs no sort, but keep the order deterministic anyway
    iocs.sort(key=lambda h: h.hash_value)
    return iocs


def parse_filename_iocs(text: str) -> list[FilenameIOC]:
    iocs: list[FilenameIOC] = []
    description = "N/A"
    for line in text.splitlines():
        if not line.strip():
            continue
        parts = line.split(";")
        if parts[0].startswith("#"):
            if len(parts) == 1:
                # comment line => description for following entries
                body = parts[0][2:] if parts[0].startswith("# ") else parts[0][1:]
                description = body.strip()
            continue
        pattern = parts[0].strip()
        if not pattern:
            continue
        score = DEFAULT_SCORE
        if len(parts) >= 2:
            parsed = _parse_score(parts[1])
            if parsed is not None and _valid_score(parsed):
                score = parsed
        fp_pattern: str | None = None
        if len(parts) >= 3 and parts[2].strip():
            candidate = parts[2].strip()
            try:
                re.compile(candidate)
                fp_pattern = candidate
            except re.error:
                fp_pattern = None
        try:
            re.compile(pattern)
        except re.error:
            continue  # invalid main regex => skip entry
        iocs.append(FilenameIOC(pattern, score, description, fp_pattern))
    return iocs


def parse_c2_iocs(text: str) -> list[C2IOC]:
    iocs: list[C2IOC] = []
    last_comment = ""
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("#"):
            last_comment = line.lstrip("#").strip()
            continue
        parts = line.split(";")
        server = parts[0].strip().lower()
        if len(server) < 4:
            continue
        score = DEFAULT_SCORE
        if len(parts) >= 2:
            parsed = _parse_score(parts[1])
            if parsed is not None and _valid_score(parsed):
                score = parsed
        iocs.append(C2IOC(server, score, last_comment))
    return iocs


_RULE_RE = re.compile(
    r"rule\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*(?::[^{]*)?\{(?P<body>.*?)\n\}",
    re.DOTALL,
)
_META_RE = re.compile(r"(?P<key>\w+)\s*=\s*(?P<val>\"(?:[^\"\\]|\\.)*\"|\d+)")
_STRING_RE = re.compile(
    r"(?P<id>\$\w*)\s*=\s*"
    r"(?P<val>\"(?:[^\"\\]|\\.)*\"|/(?:[^/\\]|\\.)+/|\{[^}]*\})"
    r"(?P<mods>[^\n]*)"
)


def _unquote(s: str) -> str:
    """Single-pass escape decode — shared with the condition parser (the
    chained-replace version corrupted '\\\\n' into a newline)."""
    from .conditions import _unquote as _decode

    return _decode(s)


def parse_yara_rules(text: str) -> list[YaraRule]:
    rules: list[YaraRule] = []
    text = _strip_comments(text)  # 'rule' inside a comment must not parse
    # private/global detection must only fire in RULE-HEADER position: a
    # bare substring search also matches inside meta values and string
    # literals (e.g. description = "detects private rule kit"), falsely
    # rejecting a valid ruleset. Mask quoted strings and /regex/ literals,
    # then anchor at line start — yara headers are `[private|global ]rule
    # Name` at top level.
    masked = re.sub(r'"(?:[^"\\]|\\.)*"', '""', text)
    masked = re.sub(r"/(?:[^/\\\n]|\\.)+/", "//", masked)
    glob = re.search(
        r"(?m)^[ \t]*(?:private\s+)?global(?:\s+private)?\s+rule\s+(\w+)",
        masked,
    )
    if glob:
        # a global rule gates EVERY other rule's matches (all globals
        # must fire for anything to report) — cross-rule coupling the
        # per-rule evaluation model doesn't carry; reject loudly
        raise YaraUnsupportedError(
            f"rule {glob.group(1)}: 'global rule' semantics are not "
            "supported (it would gate every other rule's matches)"
        )
    # `private rule` is SUPPORTED with yara-x semantics: its own matches
    # are never reported (yara only feeds them to other rules via rule
    # references, which this condition grammar does not have — so a
    # loaded private rule can influence nothing and is dropped after full
    # validation; src/main.rs:780-872 compiles them the same way).
    private_names = set(
        re.findall(r"(?m)^[ \t]*private\s+rule\s+(\w+)", masked)
    )
    for m in _RULE_RE.finditer(text):
        body = m.group("body")
        sections: dict[str, str] = {}
        current = None
        for line in body.splitlines():
            stripped = line.strip()
            header = re.match(r"(meta|strings|condition)\s*:\s*(.*)", stripped)
            if header:
                current = header.group(1)
                sections[current] = header.group(2) + "\n"
            elif current:
                sections[current] += line + "\n"

        score, description, author, reference = DEFAULT_SCORE, "", "", ""
        for meta in _META_RE.finditer(sections.get("meta", "")):
            key, val = meta.group("key"), meta.group("val")
            if key == "score" and val.isdigit():
                parsed = int(val)
                if _valid_score(parsed):
                    score = parsed
            elif key == "description" and val.startswith('"'):
                description = _unquote(val)
            elif key == "author" and val.startswith('"'):
                author = _unquote(val)
            elif key == "reference" and val.startswith('"'):
                reference = _unquote(val)

        rule_name = m.group("name")
        strings: list[YaraString] = []
        for sm in _STRING_RE.finditer(sections.get("strings", "")):
            raw = sm.group("val")
            mods = _parse_modifiers(sm.group("mods"), rule_name, sm.group("id"))
            if raw.startswith('"'):
                s = YaraString(sm.group("id"), _unquote(raw), False, **mods)
            elif raw.startswith("/"):
                # mechanical dialect transpile (literal lookbehind prefix,
                # single-char-class backreference) BEFORE validation so
                # every backend sees the rewritten shared-dialect pattern
                from .compile import transpile_shared_regex

                body, shift = transpile_shared_regex(
                    raw[1:-1],
                    f" (rule {rule_name}, string {sm.group('id')})",
                )
                s = YaraString(
                    sm.group("id"), body, True, report_shift=shift, **mods
                )
            else:  # { hex string }
                s = YaraString(
                    sm.group("id"), raw[1:-1].strip(), False, is_hex=True, **mods
                )
            validate_string(s)  # loud rejection of unsupported combos
            strings.append(s)

        condition = _strip_comments(sections.get("condition", "")).strip()
        if not condition:
            condition = "any of them" if strings else ""
        if not condition:
            raise YaraUnsupportedError(
                f"rule {rule_name}: empty condition and no strings"
            )
        try:
            ast = parse_condition(condition)
        except YaraUnsupportedError as e:
            raise YaraUnsupportedError(f"rule {rule_name}: {e}") from e
        if condition_uses_strings(ast) and not strings:
            raise YaraUnsupportedError(
                f"rule {rule_name}: condition references strings but the "
                "rule defines none"
            )
        from .conditions import (
            collect_of_terms,
            resolve_percent_of,
            selector_matches,
            validate_condition_ops,
        )

        # count/at/in/offset operators: loud load-time subset validation
        validate_condition_ops(rule_name, strings, ast)

        idents = [s.identifier for s in strings]
        # resolve 'P% of' quantifiers so the exceeds-set-size validation
        # below sees integer thresholds (the runtime resolution lives in
        # YaraRule.condition_ast, same helper)
        ast = resolve_percent_of(ast, idents)
        for term in collect_of_terms(ast):
            n_selected = sum(
                1 for i in idents if selector_matches(term.selector, i)
            )
            if term.selector is not None and n_selected == 0:
                raise YaraUnsupportedError(
                    f"rule {rule_name}: of-set {term.selector} selects no "
                    "defined string"
                )
            if term.n not in ("any", "all") and int(term.n) > n_selected:
                # yara-x rejects quantifiers exceeding the set size at
                # compile time; silently-never-firing is the trap we ban
                raise YaraUnsupportedError(
                    f"rule {rule_name}: '{term.n} of' exceeds the "
                    f"{n_selected} string(s) it quantifies over"
                )
        if rule_name in private_names:
            # fully validated above, then dropped: with no rule-reference
            # grammar a private rule can influence no other rule, and
            # yara-x never reports its own matches — identical output
            continue
        rules.append(
            YaraRule(
                name=rule_name,
                score=score,
                description=description,
                author=author,
                reference=reference,
                strings=tuple(strings),
                condition=condition,
            )
        )
    return rules


def _strip_comments(text: str) -> str:
    r"""Strip // line comments, quote-aware: a // inside a "..." string
    literal or a /regex/ body is NOT a comment. Regex bodies are tracked
    as their own quoting context (entered on the / that follows '=' in a
    string definition, or the ext-var 'matches' keyword in a condition)
    so a regex containing an unpaired double-quote (e.g. $r = /say "x{2}/)
    or a // sequence (e.g. matches /\/(tmp|shm)\//) can't flip the
    string state or get truncated as a comment."""

    def _opens_regex(prefix: str) -> bool:
        prefix = prefix.rstrip()
        return prefix.endswith("=") or bool(
            re.search(r"\bmatches$", prefix)
        )

    out_lines = []
    for line in text.splitlines():
        in_str: str | None = None
        i = 0
        cut = len(line)
        while i < len(line):
            c = line[i]
            if in_str:
                if c == "\\":
                    i += 2
                    continue
                if c == in_str:
                    in_str = None
            elif c == '"':
                in_str = '"'
            elif c == "/":
                if line[i + 1 : i + 2] == "/":
                    # not a comment if this / OPENS a regex body (it
                    # directly follows '=' or 'matches' — the regex just
                    # starts with a / or an escaped-slash sequence)
                    if _opens_regex(line[:i]):
                        in_str = "/"
                        i += 1
                        continue
                    cut = i
                    break
                if _opens_regex(line[:i]):
                    in_str = "/"
            i += 1
        out_lines.append(line[:cut])
    return "\n".join(out_lines)


_XOR_MOD_RE = re.compile(
    r"^xor(?:\((0x[0-9A-Fa-f]{1,2}|\d{1,3})"
    r"(?:-(0x[0-9A-Fa-f]{1,2}|\d{1,3}))?\))?$"
)


_B64_ARG_RE = re.compile(
    r'base64(?P<wide>wide)?\s*\(\s*(?P<arg>"(?:[^"\\]|\\.)*")\s*\)'
)


def _parse_modifiers(raw: str, rule: str, ident: str) -> dict:
    """Parse the modifier tail of a string definition. Unknown modifiers
    RAISE (the reference compiles full yara-x, so silently dropping a
    modifier here would silently change match semantics). `xor` accepts
    yara's forms: bare (keys 0x00-0xff), xor(K) (single key), and
    xor(LO-HI); base64/base64wide accept yara's custom-alphabet argument
    base64("...64 chars...") — a positional re-mapping validated at load
    (64 distinct chars, 0x01-0x7f)."""
    raw = _strip_comments(raw)
    out = {"nocase": False, "fullword": False, "wide": False}
    # extract quoted custom-alphabet forms BEFORE whitespace-splitting
    # (the alphabet may contain spaces/tabs via escapes)
    alphabets: list[str] = []

    def _take_b64(m: re.Match) -> str:
        alphabets.append(_unquote(m.group("arg")))
        out["base64wide" if m.group("wide") else "base64_mod"] = True
        return " "

    raw = _B64_ARG_RE.sub(_take_b64, raw)
    if alphabets:
        if len(set(alphabets)) > 1:
            raise YaraUnsupportedError(
                f"rule {rule}, string {ident}: base64/base64wide with "
                "different custom alphabets"
            )
        out["base64_alphabet"] = alphabets[0]
    tokens = raw.split()
    explicit_ascii = False
    bare_b64 = False
    for tok in tokens:
        if tok == "ascii":
            explicit_ascii = True
        elif tok == "private":
            # yara `private` string modifier: matches feed the condition
            # normally but are suppressed from reported matched_strings
            out["private"] = True
        elif tok in ("nocase", "fullword", "wide"):
            out[tok] = True
        elif tok == "base64":
            out["base64_mod"] = True
            bare_b64 = True
        elif tok == "base64wide":
            out["base64wide"] = True
            bare_b64 = True
        elif tok.startswith("xor"):
            m = _XOR_MOD_RE.match(tok)
            if m is None:
                raise YaraUnsupportedError(
                    f"rule {rule}, string {ident}: unsupported xor form "
                    f"{tok!r}"
                )
            lo = int(m.group(1), 0) if m.group(1) else 0x00
            hi = (
                int(m.group(2), 0)
                if m.group(2)
                else (lo if m.group(1) else 0xFF)
            )
            out["xor_min"], out["xor_max"] = lo, hi
        else:
            raise YaraUnsupportedError(
                f"rule {rule}, string {ident}: unsupported modifier {tok!r}"
            )
    if bare_b64 and alphabets:
        # yara treats a bare base64/base64wide as the STANDARD alphabet
        # and errors when the sibling form carries a custom one; applying
        # the custom alphabet to both (compile.py expands both forms from
        # s.base64_alphabet) would silently diverge from yara-x
        raise YaraUnsupportedError(
            f"rule {rule}, string {ident}: bare base64/base64wide mixed "
            "with a custom-alphabet form (alphabets would differ)"
        )
    out["ascii_form"] = explicit_ascii or not out["wide"]
    return out


def load_signature_set(base_dir: str | Path) -> SignatureSet:
    """Load the signature directory layout the reference uses:
    ``{base}/iocs/hash-iocs.txt``, ``{base}/iocs/filename-iocs.txt``,
    every ``{base}/iocs/*c2*`` file, every ``{base}/iocs/*hash*falsepositive*``
    (either order) file, and all ``{base}/yara/*.yar`` concatenated
    (src/main.rs:780-872 concatenates before a single compile)."""
    base = Path(base_dir)
    iocs_dir = base / "iocs"

    def read(p: Path) -> str:
        return p.read_text() if p.exists() else ""

    hash_iocs = parse_hash_iocs(read(iocs_dir / "hash-iocs.txt"))
    filename_iocs = parse_filename_iocs(read(iocs_dir / "filename-iocs.txt"))

    fp_hashes: list[HashIOC] = []
    c2_iocs: list[C2IOC] = []
    if iocs_dir.exists():
        for path in sorted(iocs_dir.iterdir()):
            name = path.name.lower()
            if "hash" in name and "falsepositive" in name:
                fp_hashes.extend(parse_hash_iocs(path.read_text()))
            if "c2" in name:
                c2_iocs.extend(parse_c2_iocs(path.read_text()))

    yara_dir = base / "yara"
    yara_text = ""
    if yara_dir.exists():
        for path in sorted(yara_dir.glob("*.yar")):
            yara_text += path.read_text() + "\n"
    yara_rules = parse_yara_rules(yara_text)

    return SignatureSet(
        hash_iocs=tuple(hash_iocs),
        fp_hashes=tuple(sorted(fp_hashes, key=lambda h: h.hash_value)),
        filename_iocs=tuple(filename_iocs),
        c2_iocs=tuple(c2_iocs),
        yara_rules=tuple(yara_rules),
    )
