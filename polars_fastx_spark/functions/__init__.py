"""Engine function namespaces.

``seq`` mirrors the reference's Polars expression namespace
(reference: src/polars_fastx/fastx_parsers.py:11-67) as pure Spark
``Column`` expressions.
"""

from polars_fastx_spark.functions import seq

__all__ = ["seq"]
