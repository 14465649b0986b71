"""YARA condition expressions with external variables.

The reference compiles full yara-x and defines 5 external globals —
``filename, filepath, extension, filetype, owner`` — available in rule
conditions (src/main.rs:857-871 defines them at compile time,
src/modules/filesystem_scan.rs:1017-1032 sets them per row). This module
parses the declarative condition subset into a tiny AST and provides ONE
generic renderer that four independent evaluation backends plug into:

* numpy/pyarrow masks  (operators/matcher.py, operators/arrow_matcher.py)
* Catalyst Columns      (plans/pipeline.py, 'catalyst' matcher)
* DuckDB SQL strings    (oracle.py)
* per-row Python        (plans/reference_scanner.py)

Turn-table analogs of the reference's per-file globals (the transcript
data model has no filesystem):

    filename  -> tool            (the turn's tool plays the filename role,
                                  exactly as in the J3 filename-IOC join)
    filepath  -> tool            (reference passes the display path; for
                                  turns path and name are the same field)
    extension -> extension of tool, WITHOUT the dot (reference passes
                 Path::extension(), e.g. "exe" — filesystem_scan.rs:688-696)
    filetype  -> coarse tool classification (EXECUTABLE/BINARY/DEBUG/
                 GENERIC/OTHER), the analog of the reference's uppercased
                 magic-format name (filesystem_scan.rs:737)
    owner     -> role            (the reference sets owner="" at scan time;
                 the turn's role is the natural ownership analog)

Grammar (a strict subset of yara-x conditions; anything outside it raises
YaraUnsupportedError at parse time rather than silently misfiring):

    expr     := and_expr ('or' and_expr)*
    and_expr := not_expr ('and' not_expr)*
    not_expr := 'not' not_expr | primary
    primary  := '(' expr ')' | of_term | ext_pred | STR_ID
    of_term  := ('any' | 'all' | INT) 'of' 'them'
    ext_pred := VAR OP ( STRING | REGEX )
    VAR      := filename | filepath | extension | filetype | owner
    OP       := '==' | '!=' | contains | icontains | startswith |
                istartswith | endswith | iendswith | iequals | matches

Bare ``any`` / ``all`` / INT (no 'of them') are accepted as sugar for the
corresponding of-term, for compatibility with pre-parsed rule sets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

EXT_VARS = ("filename", "filepath", "extension", "filetype", "owner")

# extension: substring after the last '.' of the final path segment
# (Path::extension analog); empty string when there is none.
EXTENSION_REGEX = r"\.([^./\\]+)$"

# filetype classification, first match wins, ELSE 'OTHER' — the single
# source of truth shared by every backend and by the tool_type_counts
# query (P2 analog of the reference's magic-format name).
TOOL_TYPE_RULES: tuple[tuple[str, str, str], ...] = (
    ("endswith", ".exe", "EXECUTABLE"),
    ("endswith", ".bin", "BINARY"),
    ("startswith", "debug-", "DEBUG"),
    ("startswith", "tool-", "GENERIC"),
)
TOOL_TYPE_DEFAULT = "OTHER"


class YaraUnsupportedError(ValueError):
    """Raised on any condition/string construct outside the supported
    subset — loud rejection instead of a silent wrong answer."""


# ------------------------------------------------------------------- AST


@dataclass(frozen=True)
class OfThem:
    n: str  # 'any' | 'all' | decimal int as str
    # None = 'them' (every string); else string-set selector entries, each
    # a '$id' or '$prefix*' wildcard ("N of ($a, $b*)" yara syntax)
    selector: tuple[str, ...] | None = None


def selector_matches(selector: tuple[str, ...] | None, ident: str) -> bool:
    """Does a string identifier belong to an of-term's set?"""
    if selector is None:
        return True
    for pat in selector:
        if pat.endswith("*"):
            if ident.startswith(pat[:-1]):
                return True
        elif ident == pat:
            return True
    return False


@dataclass(frozen=True)
class StrRef:
    identifier: str  # includes the leading '$'


@dataclass(frozen=True)
class ExtPred:
    var: str  # one of EXT_VARS
    op: str  # eq|ne|contains|icontains|startswith|istartswith|
    #          endswith|iendswith|iequals|matches
    value: str  # literal text; for 'matches', a regex ALREADY carrying
    #             any inline (?i)/(?s) flags at position 0


@dataclass(frozen=True)
class Not:
    operand: object


@dataclass(frozen=True)
class AndExpr:
    items: tuple


@dataclass(frozen=True)
class OrExpr:
    items: tuple


_OPS = {
    "==": "eq",
    "!=": "ne",
    "contains": "contains",
    "icontains": "icontains",
    "startswith": "startswith",
    "istartswith": "istartswith",
    "endswith": "endswith",
    "iendswith": "iendswith",
    "iequals": "iequals",
    "matches": "matches",
}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str_id>\$[A-Za-z0-9_]*\*?)
      | (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<regex>/(?:[^/\\]|\\.)+/[is]*)
      | (?P<cmp>==|!=)
      | (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
      | (?P<int>\d+)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


def _unquote(s: str) -> str:
    """Decode a quoted YARA string literal with a single left-to-right
    walk. (Chained str.replace is WRONG here: '\\\\n' — escaped backslash
    then n — would first collapse to '\\n' and then a later replace would
    turn it into a newline.) Supports \\" \\\\ \\n \\t \\r and \\xHH;
    any other escaped char decodes to itself."""
    body = s[1:-1]
    out: list[str] = []
    i = 0
    simple = {"n": "\n", "t": "\t", "r": "\r"}
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "x" and i + 3 < len(body):
                try:
                    out.append(chr(int(body[i + 2 : i + 4], 16)))
                    i += 4
                    continue
                except ValueError:
                    pass
            out.append(simple.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise YaraUnsupportedError(
                f"unsupported condition syntax at: {rest[:40]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind is not None:
            tokens.append((kind, m.group(kind)))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise YaraUnsupportedError("unexpected end of condition")
        self.i += 1
        return tok

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise YaraUnsupportedError(
                f"trailing tokens in condition: {self.tokens[self.i:]}"
            )
        return node

    def or_expr(self):
        items = [self.and_expr()]
        while self.peek() == ("word", "or"):
            self.next()
            items.append(self.and_expr())
        return items[0] if len(items) == 1 else OrExpr(tuple(items))

    def and_expr(self):
        items = [self.not_expr()]
        while self.peek() == ("word", "and"):
            self.next()
            items.append(self.not_expr())
        return items[0] if len(items) == 1 else AndExpr(tuple(items))

    def not_expr(self):
        if self.peek() == ("word", "not"):
            self.next()
            return Not(self.not_expr())
        return self.primary()

    def primary(self):
        kind, val = self.next()
        if kind == "lpar":
            node = self.or_expr()
            if self.next()[0] != "rpar":
                raise YaraUnsupportedError("unbalanced parenthesis")
            return node
        if kind == "str_id":
            if val.endswith("*"):
                raise YaraUnsupportedError(
                    f"wildcard string reference {val!r} only valid inside "
                    "an of-term set"
                )
            return StrRef(val)
        if kind == "int" or (kind == "word" and val in ("any", "all")):
            if kind == "int" and int(val) == 0:
                # yara-x '0 of them' means NONE-of — a negation with very
                # different gating semantics; reject rather than misfire
                raise YaraUnsupportedError(
                    "'0 of ...' (none-of semantics) is not supported"
                )
            # of-term: 'N of them' / 'N of ($a, $b*)' / bare 'N' sugar
            if self.peek() == ("word", "of"):
                self.next()
                k2, v2 = self.next()
                if (k2, v2) == ("word", "them"):
                    return OfThem(val)
                if k2 == "lpar":
                    sel: list[str] = []
                    while True:
                        k3, v3 = self.next()
                        if k3 != "str_id":
                            raise YaraUnsupportedError(
                                f"of-set expects string refs, got {v3!r}"
                            )
                        # '$*' wildcards every string == 'them'
                        sel.append(v3)
                        k4, v4 = self.next()
                        if k4 == "rpar":
                            break
                        if k4 != "comma":
                            raise YaraUnsupportedError(
                                f"of-set expects ',' or ')', got {v4!r}"
                            )
                    return OfThem(val, tuple(sel))
                raise YaraUnsupportedError(
                    f"'of' expects 'them' or a ($set), got {v2!r}"
                )
            return OfThem(val)
        if kind == "word" and val in EXT_VARS:
            op_kind, op_val = self.next()
            op = _OPS.get(op_val)
            if op is None:
                raise YaraUnsupportedError(
                    f"unsupported operator {op_val!r} on external var {val}"
                )
            v_kind, v_val = self.next()
            if op == "matches":
                if v_kind != "regex":
                    raise YaraUnsupportedError(
                        f"'matches' needs a /regex/, got {v_val!r}"
                    )
                body, _, flags = v_val.rpartition("/")
                body = body[1:].replace("\\/", "/")
                prefix = "".join(f"(?{f})" for f in flags)
                return ExtPred(val, "matches", prefix + body)
            if v_kind != "string":
                raise YaraUnsupportedError(
                    f"external-var comparison needs a string, got {v_val!r}"
                )
            return ExtPred(val, op, _unquote(v_val))
        raise YaraUnsupportedError(f"unsupported condition token: {val!r}")


@lru_cache(maxsize=512)
def parse_condition(text: str):
    """Parse a condition string into the AST. Raises YaraUnsupportedError
    on anything outside the supported subset."""
    return _Parser(_tokenize(text)).parse()


def collect_of_terms(node) -> list[OfThem]:
    if isinstance(node, OfThem):
        return [node]
    if isinstance(node, Not):
        return collect_of_terms(node.operand)
    if isinstance(node, (AndExpr, OrExpr)):
        return [t for x in node.items for t in collect_of_terms(x)]
    return []


def condition_uses_strings(node) -> bool:
    if isinstance(node, (OfThem, StrRef)):
        return True
    if isinstance(node, Not):
        return condition_uses_strings(node.operand)
    if isinstance(node, (AndExpr, OrExpr)):
        return any(condition_uses_strings(x) for x in node.items)
    return False


def collect_ext_atoms(sigs) -> list[ExtPred]:
    """Every distinct external-variable predicate across the rule set, in
    deterministic first-seen order. Ext atoms are pure functions of
    (tool, role), so the pipeline evaluates them JVM-side (whole-stage
    codegen) and ships ONE packed int64 bitmask across the Python bridge
    instead of the tool/role strings — the bit index here is the shared
    contract between the Catalyst packer and the matcher's mask backend."""
    seen: dict[ExtPred, None] = {}

    def walk(node) -> None:
        if isinstance(node, ExtPred):
            seen.setdefault(node)
        elif isinstance(node, Not):
            walk(node.operand)
        elif isinstance(node, (AndExpr, OrExpr)):
            for x in node.items:
                walk(x)

    for rule in sigs.yara_rules:
        walk(rule.condition_ast)
    atoms = list(seen)
    if len(atoms) > 63:
        raise YaraUnsupportedError(
            f"{len(atoms)} distinct external-variable predicates exceed the "
            "63-bit ext-bits packing; split the rule set"
        )
    return atoms


def condition_negates_strings(node, neg: bool = False) -> bool:
    """True if any string reference (StrRef/OfThem) appears under an odd
    number of `not`s. Such a condition is NOT monotone in the string
    masks, so the pipeline's blank-non-candidate-text gate (which can only
    turn masks False) would be unsound and must be disabled."""
    if isinstance(node, (OfThem, StrRef)):
        return neg
    if isinstance(node, Not):
        return condition_negates_strings(node.operand, not neg)
    if isinstance(node, (AndExpr, OrExpr)):
        return any(condition_negates_strings(x, neg) for x in node.items)
    return False


def render_condition(node, backend):
    """Generic renderer: `backend` supplies str_ref/of_them/ext_pred atom
    builders and and_/or_/not_ combiners in whatever value domain it wants
    (numpy masks, Catalyst Columns, SQL strings, Python bools)."""
    if isinstance(node, OrExpr):
        return backend.or_([render_condition(x, backend) for x in node.items])
    if isinstance(node, AndExpr):
        return backend.and_([render_condition(x, backend) for x in node.items])
    if isinstance(node, Not):
        return backend.not_(render_condition(node.operand, backend))
    if isinstance(node, OfThem):
        return backend.of_them(node)
    if isinstance(node, StrRef):
        return backend.str_ref(node.identifier)
    if isinstance(node, ExtPred):
        return backend.ext_pred(node)
    raise YaraUnsupportedError(f"unknown AST node: {node!r}")
