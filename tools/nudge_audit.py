"""Tie-distance audit of the ``+ 1e-9`` half-up rounding idiom
(r11 verdict task 6 — one-time census, re-runnable).

Every exposed ``round(expr + 1e-9, k)`` is classified by WHY it is (or
is not) hash-safe across engines. The decisive question is not the
nudge itself but whether the value reaching ``round`` can DIFFER
between Spark and DuckDB, and if so whether it can sit within the
divergence radius of a round-half boundary:

- **INT-RATIO (bit-identical, tie-impossible)**: a single float
  division of exactly-transported integers (counts, cents-sums held
  in BIGINT/DECIMAL). Both engines divide the SAME two integers, so
  the float64 quotient is bit-identical and ``round(q + 1e-9, k)`` is
  deterministic regardless of tie distance. Additionally, for a/b
  with b <= 5·10^(4) at k=4 (generally b <= 10^(9-k)/2), the lemma
  |a/b - (2m+1)/(2·10^k)| >= 1/(2·10^k·b) means the quotient cannot
  even LAND within 1e-9 of a boundary unless it is exactly ON it —
  which the nudge resolves identically on both engines.

- **PINNED-FOLD (bit-identical by contract)**: float arithmetic whose
  evaluation ORDER is pinned on both sides (the FIXTURES.md precision
  contract: array aggregates fold left-to-right; scalar chains are
  identical expression trees over identical inputs). Same bits in,
  same bits out, same rounding.

- **ORDER-DEPENDENT (the watch class)**: the value passes through an
  unordered float aggregate (sum/avg/corr/stddev over DOUBLE rows, a
  window sum over floats) whose partial-aggregation order Spark does
  not pin. Engines can diverge by ~1 ulp per accumulation step
  (~1e-13 relative at fixture magnitudes). The divergence flips the
  hash ONLY if the true value sits within that radius of a round-half
  boundary. For integer-valued data reaching the aggregate as
  doubles, the INT-RATIO lemma still bounds tie distance; for
  genuinely fractional/transcendental values the distance is generic
  (measure-zero concentration at halves) — luck-dependent in
  principle, which is exactly the class the scaled-integer discipline
  (beta_e4, matthews_mcc, theil_index, authority_e9, phi_scaled,
  bcubed's e9 terms) exists for. New single-row readouts in this
  class should use scaled integers; existing sites are converted when
  a driver red row or a three-sf selfcheck divergence implicates
  them (the rolling_beta precedent), not mechanically.

Usage: python tools/nudge_audit.py  — prints the census and the
per-file class counts. Pure text processing; no Spark session.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "resume_jd_matcher_spark")

# expression-text heuristics, checked in order; first hit wins
ORDER_DEP = re.compile(
    r"F\.(avg|mean|corr|stddev|var_samp|var_pop|covar)|"
    r"avg\(|corr\(|stddev|regr_|"
    r"F\.sum\([^)]*(double|_h|_x|value|dist|score|loss|ll|logp|w)\b",
    re.IGNORECASE,
)
TRANSCENDENTAL = re.compile(r"F\.(log|log2|log1p|exp|sqrt|pow|sin|cos|atan)|ln\(|log\(|exp\(|sqrt\(")
INT_HINT = re.compile(
    r"cast\([\"']?(bigint|decimal|long)|\.cast\(\"bigint\"\)|count\(|"
    r"_DEC|::BIGINT|::HUGEINT|n_\w+|cnt|F\.count",
    re.IGNORECASE,
)


def classify(window: str) -> str:
    if ORDER_DEP.search(window):
        return "ORDER-DEPENDENT"
    if TRANSCENDENTAL.search(window):
        return "TRANSCENDENTAL-CHAIN"
    if INT_HINT.search(window):
        return "INT-RATIO"
    return "PINNED-FOLD/OTHER"


def main() -> None:
    per_file: dict[str, Counter] = {}
    listing = []
    for root, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, REPO)
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if "1e-9" not in line or line.lstrip().startswith("#"):
                    continue
                lo = max(0, i - 3)
                window = "\n".join(lines[lo : i + 2])
                cls = classify(window)
                per_file.setdefault(rel, Counter())[cls] += 1
                listing.append((rel, i + 1, cls, line.strip()[:100]))

    total = Counter()
    for rel in sorted(per_file):
        c = per_file[rel]
        total.update(c)
        print(f"{rel}: {dict(c)}")
    print("\nTOTAL:", dict(total), "=", sum(total.values()), "sites")
    if "--list" in sys.argv:
        for rel, ln, cls, txt in listing:
            print(f"{rel}:{ln} [{cls}] {txt}")


if __name__ == "__main__":
    main()
