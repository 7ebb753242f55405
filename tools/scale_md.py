"""Marker-delimited section writer for SCALE.md.

Round 8's regen clobbered a sibling section: scale_curve.py replaced
every section whose heading merely STARTED with "## Measured scale
curve", so the relational table (written by scale_curve_rel.py) was
overwritten with two copies of the text table (r8 verdict, What's
wrong #2). Each curve tool now owns an explicit marker pair —
``<!-- scale-curve:KEY:begin/end -->`` — and replaces ONLY the text
between its own markers, so regenerating one curve can never eat the
other. Idempotent: writing the same block twice is a no-op diff.
"""

from __future__ import annotations

import os

SCALE_MD = os.path.join(os.path.dirname(__file__), "..", "SCALE.md")


def _markers(key: str) -> tuple[str, str]:
    return (
        f"<!-- scale-curve:{key}:begin -->",
        f"<!-- scale-curve:{key}:end -->",
    )


def write_section(key: str, block: str, path: str = SCALE_MD) -> None:
    """Replace (or append) the ``key``-marked section with ``block``.

    ``block`` is the full section markdown WITHOUT the markers; the
    markers are added around it. A missing marker pair appends the
    section at the end of the file.
    """
    begin, end = _markers(key)
    wrapped = f"{begin}\n{block.rstrip()}\n{end}\n"
    with open(path) as f:
        text = f.read()
    if begin in text:
        head, rest = text.split(begin, 1)
        # the end marker must FOLLOW begin — an end-only or
        # end-before-begin file would otherwise crash on the unpack
        if end not in rest:
            raise ValueError(
                f"SCALE.md has {begin!r} without its end marker — "
                "refusing to guess the section extent"
            )
        _, tail = rest.split(end, 1)
        tail = tail.lstrip("\n")
        text = head + wrapped + ("\n" + tail if tail else "")
    else:
        text = text.rstrip() + "\n\n" + wrapped
    with open(path, "w") as f:
        f.write(text)
