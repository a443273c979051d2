"""Sketch operators: approximate answers must bracket the exact ones."""

from pdf_to_text_spark.operators.sketches import corpus_percentiles, corpus_sketches


def test_sketches_vs_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    approx = {r["lang"]: r for r in corpus_sketches(docs).collect()}
    exact = {r["lang"]: r for r in corpus_percentiles(docs).collect()}
    assert set(approx) == set(exact)
    for lang, a in approx.items():
        e = exact[lang]
        assert a["docs"] == e["docs"]
        # HLL with rsd=0.02 on small counts is near-exact
        assert abs(a["approx_docs"] - e["docs"]) <= max(2, 0.05 * e["docs"])
        p50_approx = a["p50_approx"]
        assert e["min_chars"] <= p50_approx <= e["max_chars"]
        assert abs(p50_approx - e["p50"]) <= 0.1 * max(1, e["p50"])


def test_prune_stale_benchdata_removes_old_generations(tmp_path, monkeypatch):
    """r4 review: generation bumps must not accrete orphaned corpora."""
    import bench.scaling as sc
    from pdf_to_text_spark.sources.pages import PAGES_GEN

    bd = tmp_path / ".benchdata"
    old = bd / "pages_48000_p128"          # pre-versioning layout
    older = bd / f"pages_96000_p128_g{PAGES_GEN - 1}"
    cur = bd / f"pages_96000_p128_g{PAGES_GEN}"
    for d in (old, older, cur):
        d.mkdir(parents=True)
        (d / "_SUCCESS").touch()
    (bd / "not_pages.txt").write_text("keep")
    monkeypatch.setattr(sc, "REPO", tmp_path)
    sc.prune_stale_benchdata()
    assert not old.exists() and not older.exists()
    assert cur.exists() and (bd / "not_pages.txt").exists()


def test_moment_square_survives_int_n_chars(spark):
    """r6 review: `n_chars * n_chars` squared in the INPUT integer type
    before the protective decimal cast, so an INT n_chars column (the
    natural F.length() derivation) overflowed at 46341 chars and ANSI
    mode killed the job. The operand is now decimal before squaring."""
    docs = spark.createDataFrame(
        [(0, "en", "s", 50_000), (1, "en", "s", 46_342)],
        "doc_id long, lang string, source string, n_chars int",
    )
    row = corpus_sketches(docs).collect()[0]
    assert row["docs"] == 2
    assert row["avg_chars"] == 48171.0
