"""The CLI — the reference's program-invocation surface
(`Main.java:41-47`), driven in-process on the weather fixture."""

import json

from c4_5decisiontreebasedonmapreduce_spark.__main__ import (
    _REFERENCE_CLOSING_BLOCK,
    cli,
)

DATA = "data/weather.tsv"
ATTS = "data/weather.attributes"


def test_cli_train_writes_model_and_prints_rules(
    spark, tmp_path, capsys
):
    out = str(tmp_path / "model_out")
    # four positionals exactly like the reference invocation: the tmp
    # path is accepted and ignored
    rc = cli(
        ["train", DATA, out, ATTS, str(tmp_path / "tmp"),
         "--max-depth", "5"],
        spark=spark,
    )
    assert rc == 0
    lines = (tmp_path / "model_out" / "rules.txt").read_text().splitlines()
    assert len(lines) >= 5
    assert all(":" in ln for ln in lines)
    assert capsys.readouterr().out.splitlines() == lines
    model = json.loads((tmp_path / "model_out" / "model.json").read_text())
    assert all(r["label"] for r in model)


def test_cli_predict_roundtrip(spark, tmp_path, capsys):
    out = str(tmp_path / "m")
    assert cli(["train", DATA, out, ATTS], spark=spark) == 0
    capsys.readouterr()
    pred_out = str(tmp_path / "p")
    rc = cli(
        ["predict", DATA, pred_out, ATTS, "--model", f"{out}/model.json"],
        spark=spark,
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["rows"] == 14 and stats["accuracy"] == 1.0
    got = spark.read.parquet(f"{pred_out}/predictions")
    assert got.count() == 14 and "prediction" in got.columns


def test_cli_bug_compat_prints_reference_closing_block(
    spark, tmp_path, capsys
):
    """--bug-compat stdout must end with the reference's exact closing
    block (`Main.java:124-131`): blank line, banner, 最终的规则为：, then
    the indented rule lines — the weather golden."""
    rc = cli(
        ["train", DATA, str(tmp_path / "bc"), ATTS, "--bug-compat"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    expected_rules = [
        "  0,overcast:yes",
        "  0,sunny&2,<=70.0:yes",
        "  0,sunny&2,>70.0:no",
        "  0,rainy&3,true:no",
        "  0,rainy&3,false:yes",
    ]
    assert out == _REFERENCE_CLOSING_BLOCK + expected_rules
    assert (
        tmp_path / "bc" / "rules.txt"
    ).read_text().splitlines() == expected_rules


def test_cli_train_prune_flag(spark, tmp_path, capsys):
    """--prune runs the EBP post-pass: the pruned decision list is a
    (possibly equal) contraction of the unpruned one that still
    partitions the training rows."""
    out_full = str(tmp_path / "full")
    out_pruned = str(tmp_path / "pruned")
    assert cli(["train", DATA, out_full, ATTS], spark=spark) == 0
    assert cli(["train", DATA, out_pruned, ATTS, "--prune"], spark=spark) == 0
    capsys.readouterr()
    full = json.loads((tmp_path / "full" / "model.json").read_text())
    pruned = json.loads((tmp_path / "pruned" / "model.json").read_text())
    assert len(pruned) <= len(full)
    assert sum(r["n"] for r in pruned) == sum(r["n"] for r in full) == 14
    assert all(r["label"] for r in pruned)


def test_cli_curate_writes_manifest_and_summary(spark, tmp_path, capsys):
    """The LLM-pipeline user surface: `curate` runs scrub → dedup →
    gate → pack over an sf_dir and writes the per-shard manifest; the
    stdout JSON summary reconciles with the written parquet."""
    import os

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    out = str(tmp_path / "curated")
    rc = cli(["curate", sf, out, "--report"], spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.splitlines()[-1])
    manifest = spark.read.parquet(out + "/manifest")
    rows = manifest.collect()
    assert summary["shards"] == len(rows) > 0
    assert summary["n_docs"] == sum(r.n_docs for r in rows)
    assert summary["n_tokens"] == sum(r.n_tokens for r in rows)
    assert not summary["decontaminated"]
    # written manifest ≡ the registry op recomputed
    expect = sorted(map(tuple, PL.pretraining_pipeline(spark, sf).collect()))
    assert sorted(map(tuple, rows)) == expect
    assert spark.read.parquet(out + "/report").count() > 0


def test_cli_curate_decontaminate_flag(spark, tmp_path, capsys):
    import os

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    out = str(tmp_path / "curated_d")
    rc = cli(["curate", sf, out, "--decontaminate"], spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert summary["decontaminated"]
    got = sorted(
        map(tuple, spark.read.parquet(out + "/manifest").collect())
    )
    expect = sorted(
        map(tuple, PL.pretraining_decontam_pipeline(spark, sf).collect())
    )
    assert got == expect


def test_cli_curate_unigram_tokenizer(spark, tmp_path, capsys):
    """`--tokenizer unigram` counts manifest windows in released
    unigram-LM pieces (data/unigram_vocab.tsv): summary echoes the
    tokenizer, the written manifest equals the pipeline recomputed, and
    the token totals differ from the whitespace manifest (the pieces
    are a strictly finer unit)."""
    import os

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    out = str(tmp_path / "curated_u")
    rc = cli(["curate", sf, out, "--tokenizer", "unigram"], spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert summary["tokenizer"] == "unigram"
    got = sorted(
        map(tuple, spark.read.parquet(out + "/manifest").collect())
    )
    expect = sorted(
        map(
            tuple, PL.pretraining_pipeline_unigram(spark, sf).collect()
        )
    )
    assert got == expect
    ws = PL.pretraining_pipeline(spark, sf).collect()
    assert summary["n_tokens"] != sum(r.n_tokens for r in ws)
    # same survivors: the gate half is tokenizer-independent
    assert summary["n_docs"] == sum(r.n_docs for r in ws)
