"""Docs drift check with teeth (VERDICT r4 weak #4 / next #4).

Every `X GB/s` throughput claim in README.md / docs/PARITY.md PROSE must
either (a) literally appear as a cell value in README's GENERATED suite
table (so regenerating the table keeps the prose honest), or (b) sit on a
line / in a block explicitly marked as pinned historical data:

- ``<!-- pinned: <reason> -->`` on the same line, or
- inside the ``<!-- bench-history:begin/end -->`` block (multi-run
  ranges from bench.py captures).

This is what killed round 4's drift: README prose claimed 8-9 GB/s for
rows whose generated cells said 5.6-7.9.  The API-docs analog is
``python pythondoc.py --check``.
"""

import os
import re

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

TABLE_BEGIN = "<!-- suite-table:begin -->"
TABLE_END = "<!-- suite-table:end -->"
HIST_BEGIN = "<!-- bench-history:begin"
HIST_END = "<!-- bench-history:end -->"

# numbers like 12.86, 9, 0.024 directly followed by a GB/s unit, plus
# range forms "9.9-14.5 GB/s" and slashed pairs "5.2 / 7.9 GB/s"
_NUM = r"\d+(?:\.\d+)?"
GBPS_CLAIM = re.compile(
    rf"((?:{_NUM}\s*[–\-/]\s*)*{_NUM})\s*GB/s"
)


def _table_numbers():
    text = open(os.path.join(ROOT, "README.md")).read()
    a = text.index(TABLE_BEGIN)
    b = text.index(TABLE_END)
    nums = set(re.findall(_NUM, text[a:b]))
    # allow both "7.0" and "7" spellings of integral cells
    for n in list(nums):
        if "." in n:
            nums.add(n.rstrip("0").rstrip("."))
    return nums


def _prose_lines(path, strip_table=False):
    text = open(path).read()
    if strip_table and TABLE_BEGIN in text:
        a = text.index(TABLE_BEGIN)
        b = text.index(TABLE_END) + len(TABLE_END)
        text = text[:a] + text[b:]
    lines = []
    in_hist = False
    for ln in text.splitlines():
        if HIST_BEGIN in ln:
            in_hist = True
        if not in_hist:
            lines.append(ln)
        if HIST_END in ln:
            in_hist = False
    return lines


def test_gbps_claims_match_generated_table():
    allowed = _table_numbers()
    offenders = []
    for rel in ("README.md", os.path.join("docs", "PARITY.md")):
        path = os.path.join(ROOT, rel)
        lines = _prose_lines(path, strip_table=True)
        # a pin marker exempts its own line and the line before (claims
        # wrapped across a line break carry the marker on the next line)
        pinned = set()
        for i, ln in enumerate(lines):
            if "<!-- pinned" in ln:
                pinned.add(i)
                pinned.add(i - 1)
        for i, ln in enumerate(lines):
            if i in pinned:
                continue
            for m in GBPS_CLAIM.finditer(ln):
                parts = re.findall(_NUM, m.group(1))
                bad = [p for p in parts if p not in allowed]
                if bad:
                    offenders.append((rel, i + 1, ln.strip(), bad))
    assert not offenders, (
        "GB/s claims in prose not present in the generated suite table "
        "and not <!-- pinned -->:\n"
        + "\n".join(f"{r}:{i}: {l!r} (numbers {b})" for r, i, l, b in offenders)
    )
