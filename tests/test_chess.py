"""Chess-domain parity tests: the reference pipeline's behavior
(etl/transform.py) reproduced on a synthetic Lichess-export fixture."""

from __future__ import annotations

import json

import pytest

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.chess import (
    extract_game_fields,
    filter_puzzle_candidates,
    puzzle_pipeline,
    to_pgn,
    write_pgn,
)
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.incremental import (
    Cursor,
    FileLedger,
)
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.ndjson import (
    read_games,
)

GAMES = [
    {
        "id": "g1", "variant": "standard", "status": "mate", "winner": "white",
        "players": {"white": {"user": {"name": "alice"}, "rating": 1900},
                    "black": {"user": {"name": "bob"}, "rating": 1850}},
        "opening": {"eco": "C20", "name": "King's Pawn Game", "ply": 2},
        "moves": "e4 e5 Qh5 Nc6 Bc4 Nf6 Qxf7#",
    },
    {
        "id": "g2", "variant": "standard", "status": "resign", "winner": "black",
        "players": {"white": {"user": {"name": "carol"}}, "black": {"user": {"name": "dan"}}},
        "opening": {"eco": "B00", "name": "Uncommon Opening"},
        "moves": "e4 b6 d4 Bb7",
    },
    {
        "id": "g3", "variant": "chess960", "status": "mate", "winner": "white",
        "players": {"white": {"user": {"name": "eve"}}, "black": {"user": {"name": "frank"}}},
        "opening": {"eco": "A00", "name": "960"},
        "moves": "e4 e5",
    },
    {
        "id": "g4", "variant": "standard", "status": "mate", "winner": "black",
        "players": {"white": {"user": {"name": "gus"}}, "black": {"user": {"name": "hal"}}},
        "opening": {"eco": "D00", "name": "Queen's Pawn Game"},
        "moves": "d4 d5 Nc3 Qd6 e4 Qxd4 Qxd4",
    },
]


@pytest.fixture(scope="module")
def ndjson_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    with open(d / "alice_data_1.ndjson", "w") as f:
        for g in GAMES[:2]:
            f.write(json.dumps(g) + "\n")
    with open(d / "alice_data_2.ndjson", "w") as f:
        for g in GAMES[2:]:
            f.write(json.dumps(g) + "\n")
    return d


def test_read_games_typed_schema(spark, ndjson_dir):
    df = read_games(spark, str(ndjson_dir))
    assert df.count() == 4
    # Explicit schema — nested access works without inference.
    names = {r[0] for r in df.select("players.white.user.name").collect()}
    assert names == {"alice", "carol", "eve", "gus"}


def test_filter_puzzle_candidates(spark, ndjson_dir):
    df = filter_puzzle_candidates(read_games(spark, str(ndjson_dir)))
    ids = {r["id"] for r in df.select("id").collect()}
    assert ids == {"g1", "g4"}  # mate + standard only (matches reference transform.py:100)


def test_extract_game_fields(spark, ndjson_dir):
    flat = puzzle_pipeline(read_games(spark, str(ndjson_dir)))
    rows = {r["game_id"]: r.asDict() for r in flat.collect()}
    assert rows["g1"]["white_name"] == "alice"
    assert rows["g1"]["black_name"] == "bob"
    assert rows["g1"]["opening_eco"] == "C20"
    assert rows["g4"]["winner"] == "black"
    assert set(flat.columns) == {
        "game_id", "white_name", "black_name", "opening_eco",
        "opening_name", "winner", "moves",
    }


def test_pgn_golden(spark, ndjson_dir):
    flat = puzzle_pipeline(read_games(spark, str(ndjson_dir)))
    numbered = to_pgn(flat)
    blocks = [r["pgn"] for r in numbered.collect()]
    numbered._pgn_persisted.unpersist()  # caller contract (see to_pgn)
    joined = "".join(sorted(blocks))
    expected_g1 = (
        "[Game 1]\n"
        '[Game ID "g1"]\n'
        '[White "alice"]\n'
        '[Black "bob"]\n'
        '[Opening Eco "C20"]\n'
        "[Opening Name \"King's Pawn Game\"]\n"
        '[Game Winner "white"]\n'
        "\ne4 e5 Qh5 Nc6 Bc4 Nf6 Qxf7#\n"
    )
    assert expected_g1 in joined
    assert '[Game ID "g4"]' in joined
    assert '[Game ID "g2"]' not in joined  # filtered out


def test_write_pgn_distributed_sink(spark, ndjson_dir, tmp_path):
    flat = puzzle_pipeline(read_games(spark, str(ndjson_dir)))
    out = tmp_path / "pgn"
    write_pgn(flat, str(out))
    text = "\n".join(p.read_text() for p in sorted(out.glob("part-*")))
    assert '[Game ID "g1"]' in text and '[Game ID "g4"]' in text


def test_write_pgn_per_source_file(spark, ndjson_dir, tmp_path):
    """Reference parity (etl/transform.py:36-54): one PGN output per
    raw input file, with [Game N] numbering restarting per file."""
    from pyspark.sql import functions as F

    flat = puzzle_pipeline(read_games(spark, str(ndjson_dir))).withColumn(
        "source_file",
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.ndjson", 1),
    )
    sources = {r.source_file for r in flat.select("source_file").collect()}
    assert len(sources) == 2
    out = tmp_path / "pgn_by_src"
    write_pgn(flat, str(out), per_source_col="source_file")
    for src in sources:
        files = sorted((out / f"source_file={src}").glob("part-*"))
        assert files, f"no output for {src}"
        text = "\n".join(p.read_text() for p in files)
        # numbering restarts in every source's output
        assert "[Game 1]" in text


def test_corrupt_records_quarantined(spark, tmp_path):
    p = tmp_path / "bad.ndjson"
    p.write_text(json.dumps(GAMES[0]) + "\n" + "{not json]]\n")
    # Spark disallows querying only the corrupt-record column straight
    # off the raw file; cache the parsed result first (the documented
    # pattern for quarantine flows).
    df = read_games(spark, str(p)).cache()
    assert df.count() == 2
    assert df.filter("_corrupt_record IS NOT NULL").count() == 1
    df.unpersist()


def test_file_ledger_incremental(tmp_path, ndjson_dir):
    ledger = FileLedger(tmp_path / "processed.txt")
    first = ledger.new_files(ndjson_dir)
    assert len(first) == 2
    ledger.mark(first[0])
    second = ledger.new_files(ndjson_dir)
    assert [f.split("/")[-1] for f in second] == ["alice_data_2.ndjson"]
    ledger.mark(*second)
    assert ledger.new_files(ndjson_dir) == []


def test_cursor_roundtrip(tmp_path):
    c = Cursor(tmp_path / "last_timestamp.txt")
    assert c.get() is None
    c.set("20240101120000")
    assert c.get() == "20240101120000"


def test_extract_batch_end_to_end(tmp_path):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.extract import extract_batch, write_ndjson
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.incremental import Cursor

    store = {f"2024010{i}": [{"id": f"g{i}", "n": i}] for i in range(1, 4)}

    def fetch(since, until):
        return [r for ts, rows in store.items()
                if (since is None or ts > since) and ts <= until
                for r in rows]

    cur = Cursor(tmp_path / "cursor.txt")
    out = extract_batch(fetch, cur, tmp_path / "raw", "games", "20240102")
    assert cur.get() == "20240102"
    got = [json.loads(line) for line in out.read_text().splitlines()]
    assert [g["id"] for g in got] == ["g1", "g2"]

    # second window picks up only the delta; empty window still advances
    out2 = extract_batch(fetch, cur, tmp_path / "raw", "games", "20240103")
    assert [json.loads(l)["id"] for l in out2.read_text().splitlines()] == ["g3"]
    assert extract_batch(fetch, cur, tmp_path / "raw", "games", "20240104") is None
    assert cur.get() == "20240104"


def test_write_ndjson_atomic_and_empty(tmp_path):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.extract import write_ndjson

    p = tmp_path / "o.ndjson"
    assert write_ndjson([], p) == 0
    assert p.read_text() == ""
    assert write_ndjson([{"a": 1}, {"b": "é"}], p) == 2
    assert "é" in p.read_text()


def test_http_ndjson_fetcher_window_and_parse(tmp_path):
    """The HTTP adapter passes the (since, until] window through the
    query params, omits a None since, parses ND-JSON bodies, and
    composes with extract_batch's durable-write-then-cursor ordering
    (no network: transport is injected)."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.extract import (
        extract_batch,
        http_ndjson_fetcher,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.incremental import Cursor

    calls = []

    def fake_transport(url, params, headers, timeout):
        calls.append((url, dict(params), dict(headers)))
        return '{"id": "g1"}\n{"id": "g2"}\n\n'

    fetch = http_ndjson_fetcher(
        "https://example.invalid/games", params={"max": 3},
        transport=fake_transport,
    )
    rows = list(fetch(None, "t1"))
    assert rows == [{"id": "g1"}, {"id": "g2"}]
    url, params, headers = calls[-1]
    assert "since" not in params and params["until"] == "t1"
    assert params["max"] == 3
    assert headers["Accept"] == "application/x-ndjson"

    cur = Cursor(tmp_path / "cursor.txt")
    out = extract_batch(fetch, cur, tmp_path / "raw", "games", "t2")
    assert out is not None and out.read_text().count("\n") == 2
    assert cur.get() == "t2"
    # second window carries the advanced cursor as `since`
    list(fetch(cur.get(), "t3"))
    assert calls[-1][1]["since"] == "t2" and calls[-1][1]["until"] == "t3"


def test_pgn_data_source_round_trip(spark, ndjson_dir, tmp_path):
    """write_pgn → spark.read.format("pgn") is lossless: the reader
    reconstructs the flat puzzle rows (numbering included, '?' decoded
    back to NULL) from the distributed sink's part files."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.pgn_ds import PgnDataSource

    try:
        spark.dataSource.register(PgnDataSource)
    except Exception:
        pass
    flat = puzzle_pipeline(read_games(spark, str(ndjson_dir)))
    out = tmp_path / "pgn_rt"
    write_pgn(flat, str(out))
    got = (
        spark.read.format("pgn").option("path", str(out)).load()
    )
    rows = {r.game_id: r for r in got.collect()}
    want = {r.game_id: r for r in flat.collect()}
    assert set(rows) == set(want)
    for gid, w in want.items():
        g = rows[gid]
        assert (g.white_name, g.black_name, g.opening_eco,
                g.opening_name, g.winner, g.moves) == (
            w.white_name, w.black_name, w.opening_eco,
            w.opening_name, w.winner, w.moves)
    # numbering survived: the set of game numbers is 1..n
    assert sorted(r.game_number for r in rows.values()) == \
        list(range(1, len(rows) + 1))


def test_pgn_data_source_decodes_missing_tags(spark, tmp_path):
    """A hand-written PGN with '?' placeholders and multi-line
    movetext parses to NULLs and concatenated moves."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.pgn_ds import PgnDataSource

    try:
        spark.dataSource.register(PgnDataSource)
    except Exception:
        pass
    p = tmp_path / "one.pgn"
    p.write_text(
        "[Game ?]\n"
        '[Game ID "gx"]\n'
        '[White "?"]\n'
        '[Black "carol"]\n'
        '[Opening Eco "?"]\n'
        '[Opening Name "Unknown"]\n'
        '[Game Winner "black"]\n'
        "\ne4 e5\nNf3 Nc6\n"
    )
    r = (spark.read.format("pgn").option("path", str(p)).load()).first()
    assert r.game_number is None and r.white_name is None
    assert r.opening_eco is None and r.black_name == "carol"
    assert r.moves == "e4 e5 Nf3 Nc6"
