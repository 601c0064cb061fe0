"""CLI: run the local oracle parity check over (a subset of) queries.

Usage: python tests/run_parity.py [sf_dir ...] [name ...]

With no sf_dir arguments, BOTH sf0.001 and sf0.01 are checked — the
driver compares at sf0.01, and scale-dependent hash divergence (bin
bounds, top-k ties) only shows up there.
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
    sf_dirs = [a for a in args if "/" in a] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    names = [a for a in args if "/" not in a]
    queries = all_queries()
    oracles = all_oracles()
    if not names:
        names = list(queries)
    spark = get_spark("parity-check")
    failures = []
    n_checks = 0
    for sf_dir in sf_dirs:
        print(f"== {sf_dir}")
        for name in names:
            n_checks += 1
            t0 = time.time()
            try:
                if name not in oracles:
                    n = queries[name](spark, sf_dir).count()
                    print(f"  {name}: rows-only, {n} rows [{time.time()-t0:.1f}s]")
                    continue
                ok, msg = compare(spark, queries[name], oracles[name], sf_dir, name)
                print(("  PASS " if ok else "  FAIL ") + msg + f" [{time.time()-t0:.1f}s]")
                if not ok:
                    failures.append(f"{sf_dir}:{name}")
            except Exception as e:  # noqa: BLE001
                print(f"  ERROR {name}: {type(e).__name__}: {str(e)[:500]}")
                failures.append(f"{sf_dir}:{name}")
    print(f"\n{n_checks - len(failures)}/{n_checks} passed")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
