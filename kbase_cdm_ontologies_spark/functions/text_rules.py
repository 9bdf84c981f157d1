"""Frozen, versioned pure-Python text rules shared by the corpus
generator, the Spark UDF workers, and the plain-Python oracle.

RULE_VERSION is part of the checkpoint manifest's code hash; changing
any rule here invalidates downstream stage checkpoints. The per-row
invariant (BASELINE.json input_hint) is: for every url,
``extract_text(html) == text`` **byte-identically** — verified with
sha2(text, 256) in tests (reference analog: checksum discipline in
scripts/version_tracker.py:14-20).

These are deliberately dependency-free (no bs4/lxml in the image) and
deterministic: same bytes in, same str out, on any executor.
"""

from __future__ import annotations

import html as _htmllib
import re

RULE_VERSION = "text-rules/1"

# --- M1: HTML -> text ------------------------------------------------------

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# block-level elements become newlines; everything else is dropped inline
_BLOCK_TAG = re.compile(
    r"</?(p|div|h[1-6]|li|ul|ol|table|tr|br|section|article|header|footer|title|body|html|head)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_SPACES = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes) -> str:
    """The frozen HTML->text extraction rule (M1).

    0. transparently gunzip payloads with the gzip magic (reference
       analog: enhanced_download.py:61-80 / analyze_prefixes.py:10-24)
    1. decode UTF-8 (replace errors)
    2. drop <script>/<style> subtrees and comments
    3. block-level tags -> newline, all other tags -> ''
    4. unescape HTML entities
    5. collapse horizontal whitespace, strip lines, drop empties
    6. join with single \\n
    """
    if html_bytes[:2] == b"\x1f\x8b":
        import gzip as _gzip

        try:
            html_bytes = _gzip.decompress(html_bytes)
        except OSError:
            pass  # corrupt gzip: fall through, decode raw bytes
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE.sub(" ", s)
    s = _COMMENT.sub(" ", s)
    s = _BLOCK_TAG.sub("\n", s)
    s = _ANY_TAG.sub("", s)
    s = _htmllib.unescape(s)
    lines = [_SPACES.sub(" ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


# --- normalization shared by mention detection & alias build ---------------

_NORM_WS = re.compile(r"\s+")


def normalize_surface(s: str) -> str:
    """Casefold + whitespace-collapse: the alias_norm match key."""
    return _NORM_WS.sub(" ", s.casefold()).strip()


# --- M4: OpenIE-style SVO patterns ------------------------------------------

# Subject/object are two-word noun phrases; the predicate inventory maps
# onto the reference's entailed-edge predicate census (BFO:0000050
# part-of 34,852 rows; RO relations — SURVEY.md §2.8).
SVO_PATTERN = r"\b([A-Za-z]+ [a-z]+) (is a|is part of|regulates|binds) ([a-z]+ [a-z]+)\b"
_SVO_RE = re.compile(SVO_PATTERN)

PREDICATE_CURIE = {
    "is a": "kg:isA",
    "is part of": "BFO:0000050",
    "regulates": "RO:0002211",
    "binds": "RO:0002436",
}


def extract_svo(text: str) -> list[tuple[str, str, str]]:
    """Pure SVO extraction: (subj_norm, pred_curie, obj_norm) tuples."""
    out = []
    for m in _SVO_RE.finditer(text):
        out.append(
            (
                normalize_surface(m.group(1)),
                PREDICATE_CURIE[m.group(2)],
                normalize_surface(m.group(3)),
            )
        )
    return out
