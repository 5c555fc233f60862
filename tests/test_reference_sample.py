"""Integration test against the reference's OWN bundled IMDb sample data
(read-only at /root/reference/src/master/InputFiles/): the engine must
serve the reference's exact interactive query surface on its exact input.

Skipped cleanly if the reference tree isn't present.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

INPUT = "/root/reference/src/master/InputFiles"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(INPUT), reason="reference sample data not available"
)


@pytest.fixture(scope="module")
def engine(spark):
    from imdb_mapreduce_spark.api import ImdbEngine

    eng = ImdbEngine.from_tsv(
        spark,
        f"{INPUT}/basic1000.tsv",
        f"{INPUT}/principals1000.tsv",
        f"{INPUT}/names1000.tsv",
    )
    yield eng
    eng.unpersist()


def test_ingest_counts(engine, spark):
    # 1001 titles / 846 names / 3589 principals (BASELINE.md); after the
    # actor-filter + inner joins the edge table is non-empty and keyed.
    edges = engine.cast_edges
    n = edges.count()
    assert n > 0
    # every edge row has all three fields
    assert edges.filter(
        F.col("title").isNull() | F.col("actor").isNull() | F.col("tconst").isNull()
    ).count() == 0
    # only acting principals survive: edge count ≤ acting principal rows
    assert n <= 3589


def test_headerless_names_fully_loaded(spark):
    # The reference's loader silently drops its first person, D.W. Griffith
    # (dataInit.erl:83-84). Ours must keep all 847 data rows (the file has
    # no header at all: wc -l = 847, every line is a person).
    from imdb_mapreduce_spark.sources.imdb import read_names_tsv

    names = read_names_tsv(spark, f"{INPUT}/names1000.tsv")
    assert names.count() == 847
    assert (
        names.filter(F.col("primary_name") == "D.W. Griffith").count() == 1
    )


def test_interactive_request_roundtrip(engine):
    # Pick a well-connected actor from the data itself, then run the
    # reference's flagship query end-to-end (level 2 co-star graph).
    busiest = (
        engine.cast_edges.groupBy("actor")
        .count()
        .orderBy(F.col("count").desc(), "actor")
        .first()["actor"]
    )
    vertices, edges = engine.request(busiest, "actor", level=2)
    assert busiest in vertices
    assert all(src == busiest and lvl == 1 for src, _, lvl in edges)
    assert len(vertices) == len(edges) + 1  # tree: root + one vertex per edge

    dot = engine.to_dot(busiest, "actor", level=2)
    assert dot.startswith("digraph G {") and dot.endswith("}")


def test_movie_request_direction(engine):
    some_title = (
        engine.cast_edges.groupBy("title")
        .count()
        .filter(F.col("count") >= 2)
        .orderBy(F.col("count").desc(), "title")
        .first()["title"]
    )
    vertices, edges = engine.request(some_title, "movie", level=2)
    assert some_title in vertices
    # co-movies share ≥1 cast member with the root
    for _, dst, _ in edges:
        assert dst != some_title


def test_bfs_level_monotonicity(engine):
    # Level-k result is a prefix of level-(k+1): rounds accumulate
    # (SURVEY §5.3 invariant), on the reference's real data.
    busiest = (
        engine.cast_edges.groupBy("actor")
        .count()
        .orderBy(F.col("count").desc(), "actor")
        .first()["actor"]
    )
    _, e2 = engine.request(busiest, "actor", level=2)
    _, e3 = engine.request(busiest, "actor", level=3)
    assert set(e2) <= set(e3)
    assert len(e3) >= len(e2)
    # level-2 edges reappear at the same level tag
    lvl_of = {(s, d): l for s, d, l in e3}
    assert all(lvl_of[(s, d)] == 1 for s, d, _ in e2)


def test_save_load_roundtrip(engine, spark, tmp_path):
    from imdb_mapreduce_spark.api import ImdbEngine

    p = str(tmp_path / "silver")
    engine.save(p)
    eng2 = ImdbEngine.load(spark, p, cache=False)
    assert eng2.cast_edges.count() == engine.cast_edges.count()


def test_service_round_trip_matches_in_process_request(engine):
    """The socket service must return byte-identical results to the
    in-process API, keep serving after an invalid request (reference GUI
    validation semantics, client.erl:139-140), and handle several
    requests on one persistent connection."""
    import json
    import socket

    from pyspark.sql import functions as F  # noqa: F811

    from imdb_mapreduce_spark.service import serve_background

    busiest = (
        engine.cast_edges.groupBy("actor")
        .count()
        .orderBy(F.col("count").desc(), "actor")
        .first()["actor"]
    )
    expect_v, expect_e = engine.request(busiest, "actor", level=2)

    srv, port = serve_background(engine)
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
            f = s.makefile("rwb")
            f.write(
                (json.dumps({"name": busiest, "type": "actor", "level": 2}) + "\n").encode()
            )
            f.flush()
            reply = json.loads(f.readline())
            assert reply["vertices"] == expect_v
            assert [tuple(e) for e in reply["edges"]] == expect_e

            # invalid request -> error reply, connection survives
            f.write(b'{"name": "", "type": "actor", "level": 2}\n')
            f.flush()
            err = json.loads(f.readline())
            assert "error" in err and "non-empty" in err["error"]

            # oversized traversal (VERDICT r05 item 8): a request whose
            # result outgrows its vertex budget aborts between rounds and
            # becomes an error reply — the service analog of the reference
            # master's 10 s pcall timeout (master.erl:240)
            f.write(
                (
                    json.dumps(
                        {
                            "name": busiest,
                            "type": "actor",
                            "level": 2,
                            "max_vertices": 1,
                        }
                    )
                    + "\n"
                ).encode()
            )
            f.flush()
            budget_err = json.loads(f.readline())
            assert "error" in budget_err
            assert "budget exceeded" in budget_err["error"]
            # the reply carries the partial-work numbers (VERDICT r06
            # item 8): how much work was reached/estimated and against
            # which budget, so a budget-tuned client can decide to retry
            import re

            assert re.search(r"BFS budget exceeded: \d+", budget_err["error"])
            assert "max_vertices=1" in budget_err["error"]

            # connection still usable after the error
            f.write(
                (json.dumps({"name": busiest, "type": "actor", "level": 1}) + "\n").encode()
            )
            f.flush()
            reply1 = json.loads(f.readline())
            assert reply1["vertices"] == [busiest]  # level 1 = root only
            assert reply1["edges"] == []
    finally:
        srv.shutdown()
        srv.server_close()


def test_service_concurrent_clients_interleaved(engine):
    """VERDICT r04 item 8: the reference master serves concurrent GUI
    clients via per-request spawn (master.erl handle_call); the TCP twin
    must do the same. Two clients connect together, fire interleaved
    requests concurrently, and each must get ITS OWN correct replies in
    order on its own connection."""
    import json
    import socket
    import threading

    from pyspark.sql import functions as F  # noqa: F811

    from imdb_mapreduce_spark.service import serve_background

    actors = [
        r["actor"]
        for r in engine.cast_edges.groupBy("actor")
        .count()
        .orderBy(F.col("count").desc(), "actor")
        .limit(2)
        .collect()
    ]
    expected = {
        (name, lvl): engine.request(name, "actor", level=lvl)
        for name in actors
        for lvl in (1, 2)
    }

    srv, port = serve_background(engine)
    results: dict[str, list] = {}
    errors: list = []
    barrier = threading.Barrier(2)

    def client(name: str) -> None:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=120) as s:
                f = s.makefile("rwb")
                barrier.wait()  # both clients in flight before either sends
                got = []
                for lvl in (1, 2):  # two requests interleaving with the peer
                    f.write(
                        (json.dumps({"name": name, "type": "actor", "level": lvl}) + "\n").encode()
                    )
                    f.flush()
                    got.append((lvl, json.loads(f.readline())))
                results[name] = got
        except Exception as e:  # noqa: BLE001 — surfaced on the main thread
            errors.append((name, e))

    threads = [threading.Thread(target=client, args=(a,)) for a in actors]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errors, errors
    assert set(results) == set(actors)
    for name in actors:
        for lvl, reply in results[name]:
            want_v, want_e = expected[(name, lvl)]
            assert reply["vertices"] == want_v, (name, lvl)
            assert [tuple(e) for e in reply["edges"]] == want_e, (name, lvl)
