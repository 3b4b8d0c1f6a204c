"""metrics.jsonl helpers: append, ensure, resume-truncation."""

import json

from toycrystals_tpu.utils import append_jsonl, ensure_file, truncate_jsonl


def test_append_and_truncate(tmp_path):
    p = tmp_path / "metrics.jsonl"
    ensure_file(p)
    for e in range(1, 9):
        append_jsonl(p, {"epoch": e, "loss": 1.0 / e})

    # resume from a checkpoint holding epoch_next=5: rows 6..8 must drop
    truncate_jsonl(p, "epoch", 5)
    rows = [json.loads(line) for line in p.read_text().splitlines()]
    assert [r["epoch"] for r in rows] == [1, 2, 3, 4, 5]

    # appending after truncation continues cleanly
    append_jsonl(p, {"epoch": 6, "loss": 0.1})
    rows = [json.loads(line) for line in p.read_text().splitlines()]
    assert [r["epoch"] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_truncate_missing_file_is_noop(tmp_path):
    truncate_jsonl(tmp_path / "absent.jsonl", "epoch", 3)  # must not raise


def test_truncate_skips_blank_lines(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text('{"epoch": 1}\n\n{"epoch": 2}\n')
    truncate_jsonl(p, "epoch", 1)
    assert p.read_text() == '{"epoch": 1}\n'
