"""Regenerate tests/fixtures_golden_turns.json from the single-process
oracle.

ONLY run this for an INTENTIONAL semantics or generator change, in the
same commit as that change, with the regeneration called out in the
commit message (see tests/test_golden_snapshot.py docstring).  The
fixture pins per-turn extraction semantics; regenerating it silently
would defeat the pin.

Usage: python scripts/regen_golden_fixture.py [n_convs]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures_golden_turns.json",
)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    from medical_ocr_pipeline_spark.oracle import golden_rows

    rows = golden_rows(n_convs)
    turns = [
        {
            "conv_id": r[0],
            "turn_idx": r[1],
            "text_md5": hashlib.md5(r[2].encode()).hexdigest(),
            "n_blocks": r[3],
            "bytes_stripped": r[6],
            "parse_failures": r[7],
        }
        for r in rows
    ]
    with open(FIXTURE, "w") as f:
        json.dump(
            {"n_convs": n_convs, "n_turns": len(rows), "turns": turns},
            f, indent=1,
        )
    n_fail = sum(t["parse_failures"] for t in turns)
    print(f"wrote {FIXTURE}: {len(rows)} turns, {n_fail} parse failures")


if __name__ == "__main__":
    main()
