"""IMDb-semantics unit tests (SURVEY.md §5.2): the reference's observable
behaviors on hand-built fixtures with hand-computed expected outputs.

Fixture graph (conftest.py):
  Alpha Zero 0: {John Q. Smith 0, Jane Doe}
  Beta!:        {Jane Doe, Bob O'Hara}
  Gamma:        {Bob O'Hara}           (director + unknown nconst dropped)
  Delta:        purged (no acting principals)
  Epsilon:      {John Q. Smith 0}      (the nm0000004 namesake)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imdb_mapreduce_spark.ingest import actor_to_movies, movie_to_cast
from imdb_mapreduce_spark.operators.lookup import cast_of, movies_of
from imdb_mapreduce_spark.sources.imdb import read_names_tsv, read_titles_tsv


def test_headerless_names_not_skipped(spark, imdb_dir):
    # Reference bug (dataInit.erl:83-84) not replicated: first line is data.
    names = read_names_tsv(spark, f"{imdb_dir}/names.tsv")
    assert names.count() == 5
    assert names.filter(F.col("nconst") == 1).count() == 1


def test_id_prefix_strip_and_genres(spark, imdb_dir):
    titles = read_titles_tsv(spark, f"{imdb_dir}/basics.tsv")
    row = titles.filter(F.col("tconst") == 1).collect()[0]
    assert row["original_title"] == "Alpha Zero 0"
    assert row["genres"] == ["Drama", "Comedy"]
    # \N sentinel → NULL, not a literal string (reference passes it through)
    assert titles.filter(F.col("tconst") == 4).collect()[0]["genres"] is None


def test_actor_actress_filter_and_unknown_drop(cast_edges):
    # Gamma keeps only Bob O'Hara: director filtered (F4), unknown nconst
    # nm0000404 dropped by inner join (F7).
    gamma = cast_edges.filter(F.col("title") == "Gamma").collect()
    assert [r["actor"] for r in gamma] == ["Bob O'Hara"]


def test_empty_cast_purge(cast_edges):
    # Delta had only a director → absent entirely (F6, server.erl:416).
    assert cast_edges.filter(F.col("title") == "Delta").count() == 0


def test_adjacency_views_are_inverses(cast_edges):
    m2c = {r["title"]: r["cast"] for r in movie_to_cast(cast_edges).collect()}
    a2m = {r["actor"]: r["titles"] for r in actor_to_movies(cast_edges).collect()}
    assert m2c["Alpha Zero 0"] == ["Jane Doe", "John Q. Smith 0"]
    assert m2c["Beta!"] == ["Bob O'Hara", "Jane Doe"]
    assert a2m["Jane Doe"] == ["Alpha Zero 0", "Beta!"]
    # Name collision (two nconst, same primaryName) merges — documented
    # reference hazard (server.erl:119-121): the namesake's movie lists both.
    assert a2m["John Q. Smith 0"] == ["Alpha Zero 0", "Epsilon"]


def test_point_lookups(cast_edges):
    assert [r["actor"] for r in cast_of(cast_edges, "Beta!").collect()] == [
        "Bob O'Hara",
        "Jane Doe",
    ]
    assert [r["title"] for r in movies_of(cast_edges, "Jane Doe").collect()] == [
        "Alpha Zero 0",
        "Beta!",
    ]
    # Miss → empty result, like ets:lookup → [] (server.erl:313-317)
    assert cast_of(cast_edges, "Nope").count() == 0
