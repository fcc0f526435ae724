"""Column-level function library: HTML text extraction (Arrow-vectorized),
text analysis for training-data pipelines, and the DataX dx_* transformer
parity surface.
"""

from datax_spark.functions.extract import extract_text, extract_text_udf  # noqa: F401
