#!/usr/bin/env python
"""Capture canonicalized output hashes of named queries at one sf_dir.

The r19 optimization round's engine-vs-engine witness: run BEFORE a
change to record each query's canonical result hash, re-run AFTER and
diff — proves a plan-level optimization left every value identical,
including rows-only queries the DuckDB oracle cannot pin.

Usage: python scripts/capture_outputs.py <sf_dir> <out.json> <name...>
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_check import _canon  # noqa: E402

from louvain_modularity_spark.registry import all_queries  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir, out_path, *names = sys.argv[1:]
    queries = all_queries()
    spark = get_spark("capture-outputs")
    out = {}
    for name in names:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        cols, rows = _canon(df.columns, [tuple(r) for r in df.collect()])
        h = hashlib.sha256(
            (json.dumps(cols) + "\n").encode()
            + "\n".join(json.dumps(r, default=str) for r in rows).encode()
        ).hexdigest()
        out[name] = {"hash": h, "rows": len(rows), "sec": round(time.time() - t0, 3)}
        print(f"  {name}: {len(rows)} rows {h[:16]} [{out[name]['sec']}s]", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
