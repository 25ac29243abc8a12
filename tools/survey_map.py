"""Regenerate the SURVEY.md §8 coverage map from the query registry.

§8 claims to be "generated from the query registry"; this tool makes
that literally true. It rewrites the second column of every `| id |
queries |` row in the §8 table from the live registry (markers: `*` =
driver-facing rows-only check, `†` = extra/not in the driver set),
appends rows for ids the table doesn't know yet, and fails loudly on
stale ids — so a registry↔map cross-parse is empty-diff by
construction.

Usage:  python tools/survey_map.py [--check]
  --check: exit 1 if SURVEY.md is out of date, write nothing.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROW_RE = re.compile(r"^\| ([^|]+?) \| ([^|]*?) \|$")


def registry_map() -> dict[str, str]:
    from crypto_data_pipeline_spark.plans.registry import load_with_extras

    by_id: dict[str, list[str]] = {}
    for spec in load_with_extras().values():
        mark = "†" if spec.extra else ("*" if spec.oracle is None else "")
        for sid in spec.survey_ids:
            by_id.setdefault(sid, []).append(spec.name + mark)
    return {sid: ", ".join(sorted(names)) for sid, names in by_id.items()}


def rewrite(text: str) -> tuple[str, list[str]]:
    want = registry_map()
    lines = text.splitlines(keepends=True)
    # the §8 table is the LAST table in the file whose first column
    # holds §2 ids; locate it by its header row
    try:
        hdr = next(
            i for i, ln in enumerate(lines) if ln.startswith("| §2 id |")
        )
    except StopIteration:
        raise SystemExit("SURVEY.md §8 table header not found")
    seen: set[str] = set()
    stale: list[str] = []
    end = hdr + 2
    for i in range(hdr + 2, len(lines)):
        m = ROW_RE.match(lines[i].rstrip("\n"))
        if not m:
            break
        end = i + 1
        sid = m.group(1).strip()
        if sid in want:
            seen.add(sid)
            lines[i] = f"| {sid} | {want[sid]} |\n"
        else:
            stale.append(sid)
    missing = sorted(set(want) - seen)
    add = [f"| {sid} | {want[sid]} |\n" for sid in missing]
    lines[end:end] = add
    return "".join(lines), stale


def main() -> None:
    check = "--check" in sys.argv
    path = Path(__file__).resolve().parent.parent / "SURVEY.md"
    old = path.read_text()
    new, stale = rewrite(old)
    if stale:
        raise SystemExit(f"§8 table has ids absent from the registry: {stale}")
    if check:
        if new != old:
            print("SURVEY.md §8 is out of date; run tools/survey_map.py")
            sys.exit(1)
        print("SURVEY.md §8 matches the registry")
        return
    if new != old:
        path.write_text(new)
        print("SURVEY.md §8 rewritten from the registry")
    else:
        print("SURVEY.md §8 already current")


if __name__ == "__main__":
    main()
