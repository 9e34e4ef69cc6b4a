"""Text-cleaning rule tables — the per-row byte-identity invariant.

The reference cleans extracted markup through an *ordered* chain of
literal ``str.replace`` passes plus line-level drops/strips.  Order is
load-bearing (several replace-with-nothing rules leave double spaces that
only the final ``'  '→' '`` pass removes), so the rules are expressed here
as data — ordered tuples — and applied with single-pass, left-to-right,
non-overlapping replace semantics (Python/pandas ``str.replace``).

Semantics pinned to the *semantic_search* generation of the reference
(the newer of its two divergent copies):

* symbol fixes   — ``semantic_search/functions/parsing.py:80-119``
* newline fixes  — ``semantic_search/functions/parsing.py:122-133``
* section trim   — ``semantic_search/functions/wikipedia_extractor.py:281-290``
* line cleanup   — ``semantic_search/functions/wikipedia_extractor.py:221-278``

Stage order is the semantic pipeline's: extract-markup → trim sections →
line cleanup → symbol fixes → newline fixes.

Note: the reference also contains ``replace("\\'", "'")`` — in Python
source that is apostrophe→apostrophe, a no-op — so it is deliberately
omitted here.
"""

from __future__ import annotations

# Ordered literal replacements applied after markup stripping.
# (  is the non-breaking space; – en-dash; − minus;
#  ′ prime; “ left double quote.)
SYMBOL_RULES: tuple[tuple[str, str], ...] = (
    ("–", "-"),
    ("(/", "("),
    ("/)", ")"),
    ("(, ", "("),
    ("( , ; ", "("),
    (" ", " "),
    ("′", "`"),
    ("(: ", "("),
    ("(; ", "("),
    ("( ", "("),
    (" )", ")"),
    ("皖", ""),
    ("()", ""),
    ("(;)", ""),
    (" ; ", "; "),
    ("(,", "("),
    (",)", ")"),
    (",),", ","),
    (",“", ', "'),
    ("( ;)", ""),
    ("(;", "("),
    (" .", "."),
    (";;", ";"),
    (";\n", "\n"),
    (" ,", ","),
    (",,", ","),
    ("−", "-"),
    ("۝ ", ""),
    ("۝", ""),
    # must run last: replace-with-nothing rules above leave double spaces
    ("  ", " "),
)

# Ordered newline collapses.  The 3→1 pass sandwiched between 3→2 passes
# is a deliberate (if odd) fixed point of the reference — preserved as-is.
NEWLINE_RULES: tuple[tuple[str, str], ...] = (
    (" \n", "\n"),
    ("\n" * 6, "\n\n"),
    ("\n" * 5, "\n\n"),
    ("\n" * 4, "\n\n"),
    ("\n" * 3, "\n\n"),
    ("\n" * 3, "\n"),
    ("\n" * 3, "\n\n"),
)

# Trailing sections chopped off (split-once, keep head), in this order.
SECTION_MARKERS: tuple[str, ...] = ("See also", "References", "External links", "Notes")

# A line containing any of these substrings is dropped entirely.
LINE_DROP_SUBSTRINGS: tuple[str, ...] = ('thumb|', 'scope="', 'rowspan="', 'style="')

# For surviving lines with len > 1: strip ONE leading space, then strip
# each 2-char prefix at most once, in this order.  "! " appears twice
# because the reference checks it twice back-to-back — NOT dead code:
# "! ! x" strips to "x" (wikipedia_extractor.py:260-266).
LINE_STRIP_PREFIXES: tuple[str, ...] = ("| ", "! ", "! ", "|-", "|}")


def apply_replace_rules(s: str, rules: tuple[tuple[str, str], ...]) -> str:
    """One left-to-right pass per rule, in table order."""
    for old, new in rules:
        s = s.replace(old, new)
    return s


def trim_sections(s: str) -> str:
    for marker in SECTION_MARKERS:
        idx = s.find(marker)
        if idx != -1:
            s = s[:idx]
    return s


def clean_lines(s: str) -> str:
    out = []
    for line in s.split("\n"):
        if any(sub in line for sub in LINE_DROP_SUBSTRINGS):
            continue
        if len(line) > 1:
            if line[0] == " ":
                line = line[1:]
            for pfx in LINE_STRIP_PREFIXES:
                if line[:2] == pfx:
                    line = line[2:]
        out.append(line)
    return "\n".join(out)


def clean_text(s: str) -> str:
    """Full post-markup cleaning chain on one already-extracted string."""
    s = trim_sections(s)
    s = clean_lines(s)
    s = apply_replace_rules(s, SYMBOL_RULES)
    s = apply_replace_rules(s, NEWLINE_RULES)
    return s
