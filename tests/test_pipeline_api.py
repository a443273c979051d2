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
    # every extracted url gets a CSV (reference main.ts:55): urls whose
    # upload parsed zero records are exactly the bare header ('HEADER\n',
    # the records_to_csv([]) contract); docs WITH records end without a
    # trailing newline
    header_only = "SucursalName,EAN,CantidadVendida,Importe\n"
    with_rows = [r for r in csvs if r["csv"] != header_only]
    assert with_rows and all(not r["csv"].endswith("\n") for r in with_rows)
    assert len(csvs) == out["extracted"].select("url").distinct().count()
    jsons = out["json_docs"].collect()
    assert all(r["json"].startswith("[\n  {\n") for r in jsons)
    assert out["metrics"].count() <= 32
