"""CLI surface (vectordb_light_spark/__main__.py): in-process main()
over a real built database — ingest → search → manage lifecycle."""

from __future__ import annotations

import json

import pytest

from vectordb_light_spark.__main__ import main


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_docs")
    for i in range(6):
        (d / f"doc{i}.txt").write_text(f"theme{i % 3} content words " * 40)
    return str(d)


def test_cli_lifecycle(spark, corpus_dir, tmp_path, capsys):
    root = str(tmp_path / "dbs")
    bak = str(tmp_path / "bak")

    assert main([
        "ingest", "--src", corpus_dir, "--db-root", root, "--name", "clidb",
        "--chunk-size", "200", "--chunk-overlap", "50",
    ]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["meta"]["num_vectors"] > 0

    assert main(["list", "--db-root", root]) == 0
    assert json.loads(capsys.readouterr().out)["databases"] == ["clidb"]

    assert main([
        "search", "--db-root", root, "--name", "clidb",
        "--query", "theme1 content", "--k", "3", "--threshold", "0.0",
    ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 3
    assert {"id", "similarity_score", "rank"} <= set(rows[0])

    assert main([
        "srp-index", "--db-root", root, "--name", "clidb",
    ]) == 0
    assert json.loads(capsys.readouterr().out)["srp_index"]["n_planes"] == 16

    assert main([
        "search", "--db-root", root, "--name", "clidb",
        "--query", "theme1 content", "--k", "3", "--threshold", "0.0",
        "--ann-radius", "16",
    ]) == 0
    ann_rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["id"] for r in ann_rows] == [r["id"] for r in rows]

    assert main([
        "backup", "--db-root", root, "--name", "clidb", "--backup-root", bak,
    ]) == 0
    capsys.readouterr()
    assert main(["delete", "--db-root", root, "--name", "clidb"]) == 0
    capsys.readouterr()
    assert main(["list", "--db-root", root]) == 0
    assert json.loads(capsys.readouterr().out)["databases"] == []
    assert main([
        "restore", "--db-root", root, "--name", "clidb", "--backup-root", bak,
    ]) == 0
    capsys.readouterr()
    assert main(["list", "--db-root", root]) == 0
    assert json.loads(capsys.readouterr().out)["databases"] == ["clidb"]


def test_cli_chunks_only_and_rag_prompt(spark, corpus_dir, tmp_path, capsys):
    root = str(tmp_path / "dbs2")
    assert main([
        "ingest", "--src", corpus_dir, "--db-root", root, "--name", "qdb",
        "--chunk-size", "200", "--chunk-overlap", "50",
    ]) == 0
    capsys.readouterr()

    assert main([
        "chunks-only", "--db-root", root, "--name", "qdb",
        "--query", "theme2 content", "--threshold", "0.0",
    ]) == 0
    text = capsys.readouterr().out
    assert "CONTEXT 1" in text

    assert main([
        "rag-prompt", "--db-root", root, "--name", "qdb",
        "--query", "theme2 content", "--threshold", "0.0",
    ]) == 0
    prompt = capsys.readouterr().out
    assert "theme2 content" in prompt


def test_cli_rag_chat_streams_completion(spark, corpus_dir, tmp_path, capsys):
    """Entry point C end-to-end: build a DB, assemble the RAG prompt,
    stream the completion from a real in-thread SSE server."""
    import threading
    from http.server import HTTPServer

    from tests.test_chat import _MockChatHandler

    root = str(tmp_path / "dbs3")
    assert main([
        "ingest", "--src", corpus_dir, "--db-root", root, "--name", "cdb",
        "--chunk-size", "200", "--chunk-overlap", "50",
    ]) == 0
    capsys.readouterr()

    _MockChatHandler.requests_seen = []
    _MockChatHandler.fail_status = None
    server = HTTPServer(("127.0.0.1", 0), _MockChatHandler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        assert main([
            "rag-chat", "--db-root", root, "--name", "cdb",
            "--query", "theme0 content", "--threshold", "0.0",
            "--base-url", f"http://127.0.0.1:{server.server_port}/v1",
            "--model", "test-model",
        ]) == 0
    finally:
        server.shutdown()
    out = capsys.readouterr().out
    assert "Hello, world!" in out
    # the server received the ASSEMBLED RAG prompt, not the raw query
    sent = _MockChatHandler.requests_seen[-1]["body"]["messages"][1]["content"]
    assert "theme0 content" in sent and "---" in sent
    assert _MockChatHandler.requests_seen[-1]["body"]["model"] == "test-model"


def test_cli_curate(spark, tmp_path, capsys):
    """curate: parquet corpus in -> per-stage JSON report + survivor
    parquet out; --bench wires the decontaminate stage."""
    src = str(tmp_path / "corpus")
    bench = str(tmp_path / "bench")
    out = str(tmp_path / "curated")
    good = (
        "the quick brown fox jumps over the lazy dog and it was that kind "
        "of day for everyone involved in the field trial. later that week "
        "the committee reviewed every single observation with care because "
        "results of this nature tend to shape policy for seasons to come. "
        "nobody objected when the final tally showed a clear improvement "
        "across nearly all measured categories of the ongoing study"
    )
    spark.createDataFrame(
        [
            (1, good + " one"),
            (2, good + " one"),  # exact dup
            (3, good + " plus the secret benchmark answer is forty two"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(1, "the secret benchmark answer is forty two")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(bench)

    assert main([
        "curate", "--input", src, "--output", out,
        "--stages", "exact_dedup,decontaminate", "--bench", bench,
        "--decontaminate-n", "4",
    ]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    stages = [l for l in lines if "stage" in l]
    assert [s["stage"] for s in stages] == ["exact_dedup", "decontaminate"]
    assert stages[0]["rows_in"] == 3 and stages[0]["rows_out"] == 2
    assert stages[1]["rows_out"] == 1
    assert lines[-1]["rows_out"] == 1
    survivors = spark.read.parquet(out).collect()
    assert [r["doc_id"] for r in survivors] == [1]


def test_cli_curate_r8_stages_and_no_report(spark, tmp_path, capsys):
    """The r8 stage surface via the CLI: readability gate + curriculum
    ordering, and --no-report still reports the true written row count
    (counted from the output parquet, not by re-running the chain)."""
    src = str(tmp_path / "corpus8")
    out = str(tmp_path / "curated8")
    spark.createDataFrame(
        [
            (1, "the cat sat on the mat. the dog ran to the top."),
            (2, "a dog ran up. it sat."),
            (3, "extraordinarily incomprehensible institutionalization "
                "notwithstanding overcapitalization internationalization "
                "incontrovertibility characteristically"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)

    assert main([
        "curate", "--input", src, "--output", out,
        "--stages", "readability,curriculum",
        "--readability-max-grade-milli", "10000",
        "--curriculum-stages", "2", "--no-report",
    ]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["rows_out"] == 2          # doc 3 gated out
    survivors = spark.read.parquet(out).collect()
    assert sorted(r["doc_id"] for r in survivors) == [1, 2]


def test_cli_curate_split_weights_implies_split_stage(
    spark, tmp_path, capsys
):
    """--split-weights without 'split' in --stages was a silent no-op
    (ADVICE r10): the run completed with no split column. The flag now
    auto-appends the terminal split stage and says so on stderr."""
    src = str(tmp_path / "corpus_sw")
    out = str(tmp_path / "curated_sw")
    spark.createDataFrame(
        [(i, f"document number {i} with plenty of words " * 5)
         for i in range(8)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)

    assert main([
        "curate", "--input", src, "--output", out,
        "--stages", "exact_dedup",
        "--split-weights", "train:0.8,test:0.2",
    ]) == 0
    captured = capsys.readouterr()
    assert "implies the 'split' stage" in captured.err
    lines = [json.loads(l) for l in captured.out.strip().splitlines()]
    assert lines[-1]["stages"] == ["exact_dedup", "split"]
    survivors = spark.read.parquet(out)
    assert "split" in survivors.columns
    assert set(
        r["split"] for r in survivors.select("split").distinct().collect()
    ) <= {"train", "test"}

    # with curriculum present the implied split must insert BEFORE it
    # (_stage_split's contract: the routing join would discard the
    # curriculum output order if it ran after; r11 review finding)
    out2 = str(tmp_path / "curated_sw2")
    assert main([
        "curate", "--input", src, "--output", out2,
        "--stages", "exact_dedup,curriculum",
        "--split-weights", "train:0.8,test:0.2",
    ]) == 0
    captured = capsys.readouterr()
    lines = [json.loads(l) for l in captured.out.strip().splitlines()]
    assert lines[-1]["stages"] == ["exact_dedup", "split", "curriculum"]


def test_cli_split_writes_leakage_safe_assignments(
    spark, corpus_dir, tmp_path, capsys
):
    root = str(tmp_path / "dbs")
    out = str(tmp_path / "splits")
    assert main([
        "ingest", "--src", corpus_dir, "--db-root", root,
        "--name", "splitdb", "--chunk-size", "200",
        "--chunk-overlap", "50",
    ]) == 0
    capsys.readouterr()
    assert main([
        "split", "--db-root", root, "--name", "splitdb",
        "--weights", "train:0.7,test:0.3", "--threshold", "0.95",
        "--output", out,
    ]) == 0
    summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )
    assert summary["output"] == out
    assert set(summary["splits"]) <= {"train", "test"}
    rows = spark.read.parquet(out).collect()
    assert len(rows) == sum(summary["splits"].values())
    assert {r["split"] for r in rows} <= {"train", "test"}
