"""Regenerate EVIDENCE.md from the declarative operator→evidence map.

Usage: python tools/evidence_report.py  (writes /root/repo/EVIDENCE.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_iot_data_pipeline_project_spark import evidence  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "EVIDENCE.md")
    with open(out, "w") as fh:
        fh.write(evidence.render_report())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
