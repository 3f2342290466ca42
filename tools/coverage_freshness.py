"""Regenerate the "Driver-check freshness" section of COVERAGE.md.

Reads every CORRECTNESS_r*.json at the repo root, computes each registry
entry's newest driver-green round (and its status), and rewrites the
marked section in COVERAGE.md. Run from the repo root:

    python tools/coverage_freshness.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BEGIN = "<!-- BEGIN driver-check-freshness (generated) -->"
END = "<!-- END driver-check-freshness (generated) -->"


def main() -> None:
    sys.path.insert(0, os.getcwd())
    from kafka_data_explorer_cdc_spark.queries import REGISTRY, _FRONT

    last_round: dict[str, int] = {}
    last_ok: dict[str, bool] = {}
    for p in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p).group(1))
        for name, row in json.load(open(p)).items():
            if rnd >= last_round.get(name, -1):
                last_round[name] = rnd
                last_ok[name] = (
                    row.get("err") is None
                    and row.get("rows_match", False)
                    and row.get("schema_match", False)
                )

    names = list(REGISTRY)
    lines = [
        BEGIN,
        "",
        "## Driver-check freshness (generated — do not edit by hand)",
        "",
        f"Registry entries: {len(names)}; ever driver-checked: "
        f"{sum(1 for n in names if n in last_round)}; never: "
        f"{sum(1 for n in names if n not in last_round)}. "
        f"Current `_FRONT` window: first {len(_FRONT)} entries below.",
        "",
        "| entry | newest driver round | status | in current window |",
        "|---|---|---|---|",
    ]
    order = sorted(
        names, key=lambda n: (last_round.get(n, -1), n)
    )
    for n in order:
        rnd = last_round.get(n)
        status = (
            "never checked" if rnd is None
            else ("green" if last_ok[n] else "RED")
        )
        lines.append(
            f"| {n} | {'-' if rnd is None else f'r{rnd}'} | {status} | "
            f"{'yes' if n in _FRONT else ''} |"
        )
    lines += ["", END]
    block = "\n".join(lines)

    doc = open("COVERAGE.md").read()
    if BEGIN in doc:
        doc = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END),
            block,
            doc,
            flags=re.S,
        )
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    open("COVERAGE.md", "w").write(doc)
    print(
        f"wrote freshness table: {len(names)} entries, "
        f"{sum(1 for n in names if n not in last_round)} never-checked"
    )


if __name__ == "__main__":
    main()
