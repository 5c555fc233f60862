"""DOT/graph serialization of a BFS result (SURVEY.md §2.9 G3/G4, §2.1 K4).

The reference materializes each request's digraph and renders it to PNG via
GraphViz (``/root/reference/src/master/graphviz.erl:63-100``,
``src/master/graph.erl:47-79``). Rendering (``dot -Tpng``) stays outside the
engine; what we reproduce is the deterministic DOT text assembly:

- node ids sanitized with ``[^A-Za-z0-9] → _`` — the reference's char class
  omits ``0`` (``graph.erl:30``), mangling names containing the digit zero;
  documented bug, not replicated;
- movies listed in lexicographic order (O1, ``graph.erl:92``), actors by
  surname = last space-separated token (O2, ``graph.erl:93-98``, scalar X6);
- tree linearization: depth-first emission from the root (G3,
  ``graph.erl:67-79``) — driver-side on the collected, bounded result.
"""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import functions as F

from imdb_mapreduce_spark.operators.graph import ACTOR, BfsResult

_SANITIZE = re.compile(r"[^A-Za-z0-9]")


def sanitize_id(name: str) -> str:
    """DOT identifier sanitization (X5) with the zero-digit bug fixed."""
    return _SANITIZE.sub("_", name)


def _surname_key(name: str) -> str:
    """Sort key = last space-separated token (X6, ``graph.erl:95-97``)."""
    return name.rsplit(" ", 1)[-1]


def sorted_vertices(result: BfsResult) -> list[str]:
    """Display order: movies lexicographic (O1), actors by surname (O2).

    Distributed sort with an expression key, then bounded collect — the
    result graph is small by construction (bounded depth).
    """
    if result.node_type == ACTOR:
        key = F.element_at(F.split(F.col("name"), " "), -1)
    else:
        key = F.col("name")
    return [r[0] for r in result.vertices.orderBy(key, F.col("name")).collect()]


def to_dot(result: BfsResult) -> str:
    """Assemble DOT text (G4) via DFS from the root (G3)."""
    edges = result.edges.orderBy("level", "src", "dst").collect()
    children: dict[str, list[str]] = defaultdict(list)
    for row in edges:
        children[row["src"]].append(row["dst"])
    for v in children.values():
        v.sort(key=_surname_key if result.node_type == ACTOR else str)

    lines = ["digraph G {", f'  label="{result.root} (level graph)";']
    emitted: set[str] = set()

    def dfs(node: str) -> None:
        if node in emitted:
            return
        emitted.add(node)
        nid = sanitize_id(node)
        lines.append(f'  {nid} [label="{node}"];')
        for child in children.get(node, []):
            lines.append(f"  {nid} -> {sanitize_id(child)};")
            dfs(child)

    dfs(result.root)
    # Isolated vertices (root with no expansion) are still declared.
    for name in sorted_vertices(result):
        if name not in emitted:
            lines.append(f'  {sanitize_id(name)} [label="{name}"];')
    lines.append("}")
    return "\n".join(lines)


def write_dot(result: BfsResult, path: str) -> str:
    dot = to_dot(result)
    with open(path, "w", encoding="utf-8") as f:
        f.write(dot)
    return path


def render_png(result: BfsResult, path: str) -> str:
    """Render the BFS graph to PNG via the ``dot`` binary, matching the
    reference's ``os:cmd("dot -Tpng ...")`` step
    (``/root/reference/src/master/graphviz.erl:94-100``; the viewer launch
    on the line after stays out of engine scope). Requires GraphViz on
    PATH — raises ``RuntimeError`` if absent (check ``shutil.which("dot")``
    before calling to degrade gracefully)."""
    import shutil
    import subprocess

    if shutil.which("dot") is None:
        raise RuntimeError(
            "GraphViz 'dot' binary not found on PATH; install graphviz or "
            "use write_dot() and render elsewhere"
        )
    proc = subprocess.run(
        ["dot", "-Tpng", "-o", path],
        input=to_dot(result).encode("utf-8"),
        capture_output=True,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"dot -Tpng failed: {proc.stderr.decode(errors='replace')}")
    return path
