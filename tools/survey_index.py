"""Regenerate the "registry id index" appendix of SURVEY.md §2.

SURVEY.md §2 is the auditable operator contract; its prose tables
declare operators at the row level, but the per-round audit greps
registry ids (b91, d78, ...). This tool emits a generated table mapping
EVERY registry id to its one-line description (the query docstring's
first line) and oracle kind, so the contract can never silently drift
behind the registry again (tests/test_entry.py asserts both directions).

Run from the repo root:

    python tools/survey_index.py
"""

from __future__ import annotations

import os
import re
import sys

BEGIN = "<!-- BEGIN registry-id-index (generated) -->"
END = "<!-- END registry-id-index (generated) -->"


def main() -> None:
    sys.path.insert(0, os.getcwd())
    from kafka_data_explorer_cdc_spark.queries import REGISTRY

    lines = [
        BEGIN,
        "",
        "### §2C — registry id index (generated — do not edit by hand)",
        "",
        f"Every one of the {len(REGISTRY)} registry entries, mapped to its "
        "one-line contract. `oracle` = DuckDB value-hash differential; "
        "`rows-only` = genuinely non-SQL-expressible (driver records the "
        "weaker check; dedicated pytest semantics cover it). Regenerate "
        "with `python tools/survey_index.py`.",
        "",
        "| id | what it computes | check |",
        "|---|---|---|",
    ]
    for name, q in sorted(REGISTRY.items()):
        first = (q.doc or "").strip().splitlines()
        desc = first[0].strip() if first else "(no docstring)"
        desc = desc.replace("|", "\\|")
        kind = "oracle" if q.oracle is not None else "rows-only"
        lines.append(f"| `{name}` | {desc} | {kind} |")
    lines += ["", END]
    block = "\n".join(lines)

    doc = open("SURVEY.md").read()
    if BEGIN in doc:
        doc = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END), block, doc, flags=re.S
        )
    else:
        # Insert at the end of §2, just before the "## 3." heading.
        marker = "\n## 3. "
        idx = doc.index(marker)
        doc = doc[:idx] + "\n" + block + "\n" + doc[idx:]
    open("SURVEY.md", "w").write(doc)
    print(f"wrote registry id index: {len(REGISTRY)} entries")


if __name__ == "__main__":
    main()
