"""Pure-Python extraction kernels (no Spark imports).

These modules define the byte contract of the engine: the PDF text
extractor (pdf.py), the HTML boilerplate stripper (html.py), the block
segmentation / chunking / CSV machinery (blocks.py), and text-analysis
primitives (textstats.py). tools/oracle_extract.py drives the same code
to generate the committed golden files; the Spark UDFs in
pdf_to_text_spark.functions wrap them in Arrow batches.
"""
