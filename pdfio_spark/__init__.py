"""pdfio_spark — a PySpark-native PDF text-extraction engine.

Re-expresses the query/data-processing capabilities of the reference
PDF reader (sambitdash/PDFIO.jl, snapshot at /root/reference) as a
Spark-first pipeline: the intra-document parse stack (COS objects,
stream filters, content interpreter, fonts, layout) runs in vectorized
Arrow-batch UDFs; everything inter-document (scan, skew repartition,
checkpointed lineage, verification joins, metrics) is stock DataFrame
API so Catalyst can optimize it.
"""
__version__ = "0.1.0"
