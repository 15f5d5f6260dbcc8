"""Print {query_name: source_fingerprint} JSON for a repo tree.

Usage: python scripts/dump_fingerprints.py <tree_path> [<algo_path>]

``tree_path`` may be a HISTORICAL worktree of this repo (a round's
freeze commit): the registry is imported from that tree, while the
fingerprint ALGORITHM is loaded by file path from the CURRENT repo
(default: the fingerprints.py next to this script's parent package),
so every round's code is hashed with the same rule. The algorithm
module is stdlib-only precisely so this split import is safe — it
never triggers an import of the (possibly different) current package.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    here = os.path.dirname(os.path.abspath(__file__))
    algo_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(here), "sql_to_dbsp_compiler_spark", "fingerprints.py"
        )
    )
    spec = importlib.util.spec_from_file_location("_fp_algo", algo_path)
    algo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(algo)

    sys.path.insert(0, tree)
    from sql_to_dbsp_compiler_spark.queries import REGISTRY  # noqa: E402

    json.dump(algo.fingerprint_registry(REGISTRY), sys.stdout, sort_keys=True)


if __name__ == "__main__":
    main()
