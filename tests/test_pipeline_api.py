"""User-facing pipeline API: one call → every reference artifact."""

from pdf_to_text_spark.pipeline import run_reference_pipeline
from pdf_to_text_spark.sources.pages import pages_df


def test_run_reference_pipeline(spark):
    pages = pages_df(spark, 120, num_partitions=4)
    out = run_reference_pipeline(pages)
    assert set(out) == {"extracted", "blocks", "records", "csv_docs", "json_docs", "metrics"}
    n_extracted = out["extracted"].count()
    assert n_extracted == pages.select("url").distinct().count()
    assert out["records"].count() > 0
    csvs = out["csv_docs"].collect()
    assert all(r["csv"].startswith("SucursalName,EAN,CantidadVendida,Importe\n")
               for r in csvs)
    assert all(not r["csv"].endswith("\n") for r in csvs)
    jsons = out["json_docs"].collect()
    assert all(r["json"].startswith("[\n  {\n") for r in jsons)
    assert out["metrics"].count() <= 32
