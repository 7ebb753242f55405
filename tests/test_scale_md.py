"""tools/scale_md.write_section — the marker-delimited SCALE.md
section writer (r8 verdict task #3: the heading-prefix regex regen
clobbered the relational curve table; markers make each tool's
section disjoint and regeneration idempotent).

Pure-text tests: no SparkSession.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from scale_md import write_section  # noqa: E402


BASE = "# SCALE\n\nprose above the curves\n"


def test_append_then_replace_only_own_section(tmp_path):
    p = str(tmp_path / "SCALE.md")
    open(p, "w").write(BASE)
    write_section("text", "## Curve A\n\n| a | 1 |", path=p)
    write_section("rel", "## Curve B\n\n| b | 2 |", path=p)
    s = open(p).read()
    assert "| a | 1 |" in s and "| b | 2 |" in s

    # regenerating ONE section must leave the sibling intact — the
    # exact failure mode that ate the relational table in round 8
    write_section("text", "## Curve A\n\n| a | 9 |", path=p)
    s = open(p).read()
    assert "| a | 9 |" in s and "| a | 1 |" not in s
    assert "| b | 2 |" in s
    assert s.count("## Curve A") == 1 and s.count("## Curve B") == 1


def test_regen_is_idempotent(tmp_path):
    p = str(tmp_path / "SCALE.md")
    open(p, "w").write(BASE)
    write_section("text", "## Curve A\n\n| a | 1 |", path=p)
    write_section("rel", "## Curve B\n\n| b | 2 |", path=p)
    before = open(p).read()
    for _ in range(3):
        write_section("text", "## Curve A\n\n| a | 1 |", path=p)
        write_section("rel", "## Curve B\n\n| b | 2 |", path=p)
    assert open(p).read() == before


def test_orphan_begin_marker_is_an_error(tmp_path):
    p = str(tmp_path / "SCALE.md")
    open(p, "w").write(BASE + "<!-- scale-curve:text:begin -->\nstuff\n")
    with pytest.raises(ValueError, match="without its end marker"):
        write_section("text", "## Curve A", path=p)


def test_repo_scale_md_has_exactly_one_copy_of_each_curve():
    """The committed SCALE.md must carry ONE text curve and ONE
    relational curve, both marker-wrapped (guards against the r8
    duplicate-table regression re-landing)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = open(os.path.join(repo, "SCALE.md")).read()
    for key in ("text", "rel"):
        assert s.count(f"<!-- scale-curve:{key}:begin -->") == 1
        assert s.count(f"<!-- scale-curve:{key}:end -->") == 1
    assert s.count("## Measured scale curve") == 2
    # the relational evidence the r8 regen deleted is back
    assert "global_prefix[skew,height]" in s
