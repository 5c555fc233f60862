"""Pin the hot-path discipline every VERDICT re-greps by hand: zero
row-at-a-time Python UDFs and zero RDD drops in the engine package.

The engine's 100 TB posture keeps all per-row work JVM-side (built-in
``pyspark.sql.functions`` inside whole-stage codegen); Python appears
only behind Arrow batches (``mapInPandas`` / ``applyInPandas`` /
``applyInPandasWithState`` / ``transformWithStateInPandas`` — all
inventoried by test_arrow_wall_inventory.py where stateful). A
row-at-a-time ``F.udf`` is 10-100× slower than a Pandas UDF and
unboundedly slower than a built-in; an ``.rdd`` drop discards Catalyst,
Tungsten, and AQE. Neither exists in the package today — this test
fails the FIRST one someone adds, with the alternatives named.
"""

from __future__ import annotations

import ast
import os

import imdb_mapreduce_spark

PKG_ROOT = os.path.dirname(os.path.abspath(imdb_mapreduce_spark.__file__))


def _scan() -> tuple[list[str], list[str]]:
    udfs: list[str] = []
    rdds: list[str] = []
    for dirpath, _dirs, files in os.walk(PKG_ROOT):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG_ROOT)
            tree = ast.parse(open(path).read(), filename=rel)
            for node in ast.walk(tree):
                # F.udf(...) / functions.udf(...) / udf(...) calls and
                # @udf / @F.udf decorators all surface as a Call or Name
                # whose terminal attribute/name is exactly "udf"
                if isinstance(node, ast.Call):
                    f = node.func
                    name = (
                        f.attr
                        if isinstance(f, ast.Attribute)
                        else f.id
                        if isinstance(f, ast.Name)
                        else ""
                    )
                    if name == "udf":
                        udfs.append(f"{rel}:{node.lineno}")
                # df.rdd / .rdd.mapPartitions — any attribute access
                # named exactly "rdd"
                if isinstance(node, ast.Attribute) and node.attr == "rdd":
                    rdds.append(f"{rel}:{node.lineno}")
    return udfs, rdds


def test_no_row_at_a_time_python_udfs_and_no_rdd_drops():
    udfs, rdds = _scan()
    assert not udfs, (
        f"row-at-a-time Python UDF registered at {udfs} — use a built-in "
        "pyspark.sql.functions expression, or if Python is unavoidable an "
        "Arrow-batched pandas_udf / mapInPandas (and classify any stateful "
        "use in test_arrow_wall_inventory.py)"
    )
    assert not rdds, (
        f".rdd drop at {rdds} — the DataFrame API keeps Catalyst/AQE; "
        "per-partition imperative logic belongs in mapInPandas "
        "(mapPartitions only as a documented last resort)"
    )


# (relpath, enclosing function) → expected count of bare `pass` bodies.
# Each is a PROTOCOL no-op, verified in place: StatefulProcessor.close()
# has nothing to release for ValueState-only processors (×3: the TWS
# user-totals, the TWS KMV twin, and the r13 TWS session-timeout
# processor); compaction_plan's
# `with pq.ParquetFile(f): pass` exists only to close footer handles
# promptly (ADVICE r06 — unclosed handles piled up fds); the Python
# DataSource reader's commit() is the no-op half of its exactly-once
# contract (the source is deterministic, nothing to acknowledge).
PASS_INVENTORY: dict[tuple[str, str], int] = {
    ("streaming/stateful.py", "close"): 3,
    ("sources/storage.py", "compaction_plan"): 1,
    ("sources/synthdocs.py", "commit"): 1,
}


def test_every_bare_pass_is_a_documented_protocol_noop():
    """Every round's review re-verifies the bare `pass` bodies by hand;
    this pins them. A NEW bare pass (a stubbed method, an unfinished
    branch) fails here until it is either implemented or justified as a
    protocol no-op above."""
    sites: dict[tuple[str, str], int] = {}
    for dirpath, _dirs, files in os.walk(PKG_ROOT):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG_ROOT)
            tree = ast.parse(open(path).read(), filename=rel)

            def walk(node: ast.AST, fn: str) -> None:
                for child in ast.iter_child_nodes(node):
                    nfn = (
                        child.name
                        if isinstance(
                            child, (ast.FunctionDef, ast.AsyncFunctionDef)
                        )
                        else fn
                    )
                    if isinstance(child, ast.Pass):
                        key = (rel, fn)
                        sites[key] = sites.get(key, 0) + 1
                    walk(child, nfn)

            walk(tree, "<module>")
    assert sites == PASS_INVENTORY, (
        f"bare `pass` inventory drifted: found {sites}, expected "
        f"{PASS_INVENTORY} — implement the new stub or document the "
        "protocol no-op in PASS_INVENTORY"
    )
