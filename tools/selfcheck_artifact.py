"""Convert a `tools/driver_sim.py` stdout capture into a committed
SELFCHECK artifact: the per-round, FULL-registry correctness record
(the driver's own CORRECTNESS file only covers its 50-query window).

    python tools/driver_sim.py /root/testdata/sf0.01 > /tmp/run.txt
    python tools/selfcheck_artifact.py /tmp/run.txt SELFCHECK_r06.json 0.01
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    src, dst, sf = sys.argv[1], sys.argv[2], float(sys.argv[3])
    text = open(src).read()
    start = text.index("{")
    end = text.rindex("}")
    results = json.loads(text[start : end + 1])
    total_m = re.search(r"TOTAL: (\d+) queries, (\d+) oracle-match, (\d+) failing", text)
    artifact = {
        "sf": sf,
        "n_queries": int(total_m.group(1)),
        "n_oracle_match": int(total_m.group(2)),
        "n_failing": int(total_m.group(3)),
        "results": results,
    }
    with open(dst, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {dst}: {artifact['n_queries']} queries, "
          f"{artifact['n_oracle_match']} match, {artifact['n_failing']} failing")


if __name__ == "__main__":
    main()
