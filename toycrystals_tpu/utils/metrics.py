"""Append-only metrics.jsonl + stdout logging conventions.

Matches the reference's observability surface (SURVEY.md §5): one JSON object
per line, e.g. {"epoch": N, "loss": x}
(`/root/reference/scripts/train_sde_score_model.py:207-210,259-260`).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any


def ensure_file(path: str | Path) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    if not p.exists():
        p.touch()


def append_jsonl(path: str | Path, obj: dict[str, Any]) -> None:
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps(obj) + "\n")
