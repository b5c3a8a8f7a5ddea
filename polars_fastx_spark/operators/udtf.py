"""Python UDTF surface (SURVEY.md §2.10 X6) — one row in, N rows out.

Spark 4's ``@udtf`` API, exercised with n-gram expansion (the
row-generating shape the reference's explode-style k-mer fallback
needs). The pure-SQL twin (``explode(transform(sequence(...)))``) is
what pipelines should use — the UDTF exists to pin the mechanism for
genuinely non-SQL row generators (tokenizers, parsers, samplers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string, pos: int")
class NgramUDTF:
    """Emit (ngram, position) rows for every overlapping n-gram."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        for i in range(len(text) - n + 1):
            yield text[i : i + n], i


def register_udtfs(spark: SparkSession) -> None:
    """Register SQL-callable UDTFs: ``SELECT * FROM ngrams('abc', 2)``."""
    spark.udtf.register("ngrams", NgramUDTF)


def ngrams_sql(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Pure-SQL twin: explode overlapping n-grams with positions.

    Row-local (no shuffle) and codegen-friendly — the 100 TB path.
    Output matches NgramUDTF: (…input cols…, ngram, pos) with pos
    0-based.
    """
    c = F.col(text_col)
    idx = F.when(
        F.length(c) >= n, F.sequence(F.lit(1), F.length(c) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.substring(c, i, n).alias("ngram"), (i - 1).cast("int").alias("pos")
        ),
    )
    return df.select("*", F.explode(pairs).alias("_ng")).select(
        "*", F.col("_ng.ngram").alias("ngram"), F.col("_ng.pos").alias("pos")
    ).drop("_ng")
