"""CLI: run the local oracle parity check over (a subset of) queries.

Usage: python tests/run_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_check import compare  # noqa: E402

from louvain_modularity_spark.registry import all_oracles, all_queries  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    queries = all_queries()
    oracles = all_oracles()
    if not names:
        names = list(queries)
    spark = get_spark("parity-check")
    failures = []
    for name in names:
        t0 = time.time()
        try:
            if name not in oracles:
                n = queries[name](spark, sf_dir).count()
                print(f"  {name}: rows-only, {n} rows [{time.time()-t0:.1f}s]")
                continue
            ok, msg = compare(spark, queries[name], oracles[name], sf_dir, name)
            print(("  PASS " if ok else "  FAIL ") + msg + f" [{time.time()-t0:.1f}s]")
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"  ERROR {name}: {type(e).__name__}: {str(e)[:500]}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
