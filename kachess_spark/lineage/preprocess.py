"""Hive-script preprocessor + statement splitter (pure Python).

Mirrors the reference's pre-parse stage (shared/HivePreprocessor.java:
147-165 process(); 118-137 replaceHiveVars(); skip patterns :83-88;
trailing ';' :113-114) and adds the statement splitter the reference gets
for free from its grammar's ``program`` rule: Spark's ``parsePlan`` accepts
one statement at a time, so scripts are split on top-level ``;``.

Dialect shims (SURVEY.md §4 item 6): constructs the reference's grammar
*parses but never extracts* (QUALIFY, TOP n, SEL, HPL/SQL blocks) are
detected here and reported as skips — behavior-parity with the reference's
skipped/ directory routing rather than a hard failure.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_ASSIGN = re.compile(r"^\s*set\s+([a-zA-Z0-9.:_-]+)\s*=\s*(.+?)\s*(?:;.*)?$", re.I)
_SKIPS = [
    re.compile(r"^add (jar|file) .*;", re.I),
    re.compile(r"^msck repair .*", re.I),
]
_VAR_KW = "${hiveconf:"

# Constructs Catalyst's parser rejects but the reference's grammar accepts
# without extracting lineage (Bingql.g4: qualify_clause :1110, select_list
# TOP :967, Teradata SEL, HPL/SQL procedural blocks :547-609).
_UNSUPPORTED = re.compile(
    r"(?i)\b(QUALIFY\s|^\s*SEL\s|CREATE\s+(OR\s+REPLACE\s+)?(PROCEDURE|PACKAGE)\b"
    r"|BEGIN\s+TRANSACTION|^\s*DECLARE\s+\w+\s+CURSOR)"
)


@dataclass
class Preprocessor:
    """Stateful line processor; hivevar assignments accumulate across lines
    the way the reference's ``confVals`` map does."""

    conf: dict[str, str] = field(default_factory=dict)

    def _replace_vars(self, line: str) -> str:
        out = []
        low = line.lower()
        pos = 0
        while True:
            s = low.find(_VAR_KW, pos)
            if s < 0:
                out.append(line[pos:])
                break
            e = line.find("}", s)
            if e < 0:
                out.append(line[pos:])
                break
            key = line[s + len(_VAR_KW) : e]
            val = self.conf.get(key)
            if val is None:
                # unknown vars pass through untouched (reference :125-128)
                out.append(line[pos : e + 1])
            else:
                out.append(line[pos:s])
                out.append(val)
            pos = e + 1
        return "".join(out)

    def process_line(self, line: str) -> str:
        clean = line.strip()
        for pat in _SKIPS:
            if pat.search(clean):
                return "-- " + line
        m = _ASSIGN.match(clean)
        if m:
            substituted = self._replace_vars(clean)
            m2 = _ASSIGN.match(substituted)
            if m2:
                self.conf[m2.group(1).strip()] = m2.group(2).strip().rstrip(";")
            return "-- " + line
        return self._replace_vars(line)

    def process(self, text: str) -> str:
        lines = [self.process_line(ln) for ln in text.splitlines()]
        # extra ';' so scripts without a trailing one still split cleanly
        return "\n".join(lines) + "\n;\n"


def preprocess(text: str) -> str:
    return Preprocessor().process(text)


def split_statements(text: str) -> list[str]:
    """Split a script on top-level ``;`` (quote- and comment-aware)."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"', "`"):
            quote = ch
            buf.append(ch)
            i += 1
            while i < n:
                buf.append(text[i])
                if text[i] == "\\" and quote != "`" and i + 1 < n:
                    buf.append(text[i + 1])
                    i += 2
                    continue
                if text[i] == quote:
                    i += 1
                    break
                i += 1
            continue
        if ch == "-" and text[i : i + 2] == "--":
            j = text.find("\n", i)
            j = n if j < 0 else j
            buf.append(text[i:j])
            i = j
            continue
        if ch == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            j = n if j < 0 else j + 2
            buf.append(text[i:j])
            i = j
            continue
        if ch == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    if buf:
        stmts.append("".join(buf))

    out = []
    for s in stmts:
        # drop statements that are only comments/whitespace
        body = re.sub(r"--[^\n]*", "", s)
        body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
        if body.strip():
            out.append(s.strip())
    return out


def unsupported_reason(stmt: str) -> str | None:
    """Dialect constructs we route to skipped/ (parity with reference's
    parse-only treatment)."""
    m = _UNSUPPORTED.search(stmt)
    return f"unsupported dialect construct: {m.group(0).strip()}" if m else None


# ---------------------------------------------------------------- dialect
# rewrite shims (SURVEY.md §4 item 6): constructs Catalyst rejects but the
# reference's grammar accepts — rewritten to Spark SQL where the rewrite
# is semantics-preserving, so the lineage layer EXTRACTS them instead of
# routing to skipped/.  Anything the shims can't reach (QUALIFY in a
# subquery, HPL/SQL blocks) still falls through to unsupported_reason.

_SEL_RE = re.compile(r"(?is)^(\s*)SEL\s")
_TOP_RE = re.compile(r"(?is)^(\s*SELECT)\s+TOP\s+(\d+)\s")


def _find_top_level_kw(stmt: str, kw: str) -> int:
    """Index of case-insensitive word ``kw`` at paren depth 0 outside
    quotes, or -1."""
    low = stmt.lower()
    depth = 0
    i, n = 0, len(stmt)
    while i < n:
        ch = stmt[i]
        if ch in ("'", '"', "`"):
            q = ch
            i += 1
            while i < n and stmt[i] != q:
                i += 2 if stmt[i] == "\\" and q != "`" else 1
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and low.startswith(kw, i):
            before_ok = i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_")
            after = i + len(kw)
            after_ok = after >= n or not (low[after].isalnum() or low[after] == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def rewrite_dialect(stmt: str) -> tuple[str, list[str]]:
    """→ (rewritten statement, list of applied shim tags)."""
    applied: list[str] = []
    s2 = _SEL_RE.sub(lambda m: m.group(1) + "SELECT ", stmt)
    if s2 != stmt:
        applied.append("SEL→SELECT")
        stmt = s2
    m = _TOP_RE.match(stmt)
    if m:
        n = m.group(2)
        stmt = _TOP_RE.sub(lambda mm: mm.group(1) + " ", stmt, count=1).rstrip()
        if not re.search(r"(?is)\bLIMIT\s+\d+\s*$", stmt):
            stmt = f"{stmt}\nLIMIT {n}"
        applied.append(f"TOP {n}→LIMIT")
    idx = _find_top_level_kw(stmt, "qualify")
    if idx >= 0:
        body, pred = stmt[:idx].rstrip(), stmt[idx + len("qualify") :]
        # the standard rewrite: QUALIFY filters on select-list (window)
        # aliases, which a wrapper WHERE sees as plain columns
        stmt = f"SELECT * FROM (\n{body}\n) kch_qualify_wrap WHERE{pred}"
        applied.append("QUALIFY→wrapper WHERE")
    return stmt, applied
